"""Offset-list census for the warp/splat kernels on the REAL bench fields.

The Pallas warp/splat kernels' cost is the number of executed
(plane-offset, row-offset, col-offset) combos — each costs vector passes
over a full (H, Wp) plane (pallas/warp.py docstring).  Round 3 showed the
saturated regime's per-plane MARGINAL offset lists are full (the clamp
transition band sweeps every offset), so further marginal tightening is
dead (PERF.md row-block negative result).  This tool measures, on the
actual bench field (untrained VoxelMorph, clamped at max_disp — the
saturated worst case — and the trained-magnitude 'typical' field), how
many combos each CANDIDATE list scheme would execute:

  warp forward (per z-tile: s-plane list x dy list):
    A. per-tile marginal lists (round-3 kernel)
    B. + per-(tile, s) dy-lists (pairwise joint)
    C. + joint-mass skip at (s, dy) (the exact pairwise-joint count)
  splat (per source plane s: receiver q list; per q: dy x dx lists,
         ct-mass cond at (s, q, dy)):
    A. per-plane marginal lists + (s,q,dy) cond (round-3 kernel)
    B. + per-(q, dy) dx-ranges (contiguous lo..hi)
    C. + per-(q, dy) dx exact lists
    D. exact (s, q, dy) -> dx joint (lower bound for list schemes)

Prints a table of executed plane-op counts (1 plane-op = one vector pass
over (H, Wp)) and the implied VPU-seconds at the measured ~4 Tops/s, per
field regime.  Run on the chip (the field probe is a packed VoxelMorph
forward); the census itself is host-side numpy.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def probe_fields(size, max_disp):
    import jax
    import jax.numpy as jnp

    from deepatlas_tpu.models import VoxelMorphCVPR2018
    from deepatlas_tpu.ops import identity_grid_batch

    d, h, w = size
    key = jax.random.PRNGKey(230)
    ks = jax.random.split(key, 6)
    moving = jax.random.uniform(ks[0], (1, d, h, w, 1), jnp.float32)
    fixed = jax.random.uniform(ks[1], (1, d, h, w, 1), jnp.float32)
    # XLA trunk: the probe only needs a representative untrained field (the
    # packed trunk is parity-pinned to this one, tests/test_packed_voxelmorph)
    # and the packed model's eager init compiles every Pallas kernel
    model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, packed=False,
                               use_pallas_warp=False, max_disp=max_disp)
    variables = jax.jit(model.init)(ks[5], moving, fixed)
    probe = jax.jit(lambda v, m, f: model.apply(v, m, f)[0])
    disp = np.asarray(probe(variables, moving, fixed), np.float32)[0]
    ident = np.asarray(identity_grid_batch((1, d, h, w, 3)), np.float32)[0]

    # worst: clamp(disp + id) at max_disp voxels (the kernels' clamp)
    scale_vox = (np.asarray([w, h, d], np.float32) - 1.0) / 2.0
    disp_vox = disp * scale_vox
    p99 = float(np.percentile(np.abs(disp_vox), 99))
    worst = ident + np.clip(disp_vox, -max_disp, max_disp) / scale_vox
    typ = ident + disp * (2.0 / max(p99, 1e-6))
    return worst, typ


def vox_coords(grid, d, h, w):
    gx = (grid[..., 0] + 1.0) * ((w - 1) / 2.0)
    gy = (grid[..., 1] + 1.0) * ((h - 1) / 2.0)
    gz = (grid[..., 2] + 1.0) * ((d - 1) / 2.0)
    return gz, gy, gx


def strict_presence(t, offsets):
    """(len(offsets),) bool per offset o: any |t - o| < 1 strictly."""
    return np.stack([np.any((t > o - 1.0) & (t < o + 1.0))
                     for o in offsets])


def census_fwd(gz, gy, d, h, w, tz, r):
    """Executed tile-ops for the warp forward under schemes A/B/C, plus the
    plateau partition E: voxels with BOTH gz and gy exactly integral (the
    clamp plateaus — single tent offset per axis; x rides the exact gather
    either way) are handled by a separate masked pass whose (s, dy) combos
    are at most the few distinct integral offsets, and the interior lists
    are computed on the remaining voxels only."""
    n_tiles = -(-d // tz)
    s_planes = tz + 2 * (r + 1)
    rows = np.arange(h, dtype=np.float32)[None, :, None]
    ty = gy - rows
    dys = np.arange(-(r + 1), r + 2)
    A = B = C = 0
    E_int = 0   # interior-pass combos
    E_pla = 0   # plateau-pass combos
    plateau = (gz == np.floor(gz)) & (ty == np.floor(ty))
    per_voxel = 4 * d * h * w  # 2 z-taps x 2 y-taps per voxel
    for i in range(n_tiles):
        z0 = i * tz
        blk = slice(z0, min(z0 + tz, d))
        s0 = min(max(z0 - (r + 1), 0), max(d - s_planes, 0))
        gzb = gz[blk] - s0
        tyb = ty[blk]
        pl = plateau[blk]
        ps = strict_presence(gzb, np.arange(s_planes))
        pdy = strict_presence(tyb, dys)
        ns, ndy = ps.sum(), pdy.sum()
        A += int(ns * ndy)
        for si in np.nonzero(ps)[0]:
            zmask = np.abs(gzb - si) < 1.0
            tvals = tyb[zmask]
            if tvals.size == 0:
                continue
            pdy_s = np.stack([np.any((tvals > o - 1.0) & (tvals < o + 1.0))
                              for o in dys])
            nz = np.nonzero(pdy_s)[0]
            B += int(nz[-1] - nz[0] + 1) if nz.size else 0  # contiguous rng
            C += int(pdy_s.sum())                           # exact list
            # interior pass: same per-s dy list over non-plateau voxels
            ivals = tyb[zmask & ~pl]
            if ivals.size:
                E_int += int(np.stack(
                    [np.any((ivals > o - 1.0) & (ivals < o + 1.0))
                     for o in dys]).sum())
            # plateau pass: exact (s, dy) pairs among plateau voxels
            pvals = tyb[zmask & pl]
            if pvals.size:
                E_pla += len(np.unique(pvals.astype(np.int64)))
        pfrac = float(pl.mean())
    return {"A_tile_marginal": A, "B_pair_dy_range": B, "C_pair_dy_list": C,
            "E_interior": E_int, "E_plateau": E_pla,
            "plateau_fraction": round(float(plateau.mean()), 4),
            "ideal_voxel_ops_equiv": per_voxel / (tz * h * w)}


def census_splat(gz, gy, gx, d, h, w, r):
    """Executed dx-trips (the inner-loop unit: ~3 plane-ops each) for the
    splat under schemes A/B/C/D, plus the dy-trip overheads."""
    rows = np.arange(h, dtype=np.float32)[:, None]
    cols = np.arange(w, dtype=np.float32)[None, :]
    dys = np.arange(-(r + 1), r + 2)
    nb = len(dys)

    # per receiver plane q: marginal dy/dx lists, and pairwise dy->dx
    ndy_q = np.zeros(d, np.int64)
    ndx_q = np.zeros(d, np.int64)
    dx_cnt_qdy = np.zeros((d, nb), np.int64)   # exact per-(q,dy) dx count
    dx_rng_qdy = np.zeros((d, nb), np.int64)   # contiguous range length
    dy_present_qdy = np.zeros((d, nb), bool)
    for q in range(d):
        tyq = gy[q] - rows
        txq = gx[q] - cols
        pdy = np.stack([np.any((tyq > -o - 1.0) & (tyq < -o + 1.0))
                        for o in dys])
        pdx = np.stack([np.any((txq > -o - 1.0) & (txq < -o + 1.0))
                        for o in dys])
        ndy_q[q], ndx_q[q] = pdy.sum(), pdx.sum()
        dy_present_qdy[q] = pdy
        for j, dy in enumerate(dys):
            if not pdy[j]:
                continue
            m = (tyq + dy > -1.0) & (tyq + dy < 1.0)
            tx_m = txq[m]
            pdx_j = np.stack([np.any((tx_m + o > -1.0) & (tx_m + o < 1.0))
                              for o in dys])
            c = int(pdx_j.sum())
            dx_cnt_qdy[q, j] = c
            if c:
                nz = np.nonzero(pdx_j)[0]
                dx_rng_qdy[q, j] = int(nz[-1] - nz[0] + 1)

    # source-plane loop: which (s, q, dy) pass the ct-mass cond
    def n_offsets(vals):
        """Count of integer offsets o with strict tent mass toward any of
        ``vals``: presence set per v = {floor(v)} + {floor(v)+1 if frac>0}."""
        if vals.size == 0:
            return 0
        f = np.floor(vals).astype(np.int64) + (r + 2)
        hit = np.zeros(2 * r + 6, bool)
        hit[np.clip(f, 0, hit.size - 1)] = True
        frac = vals != np.floor(vals)
        if frac.any():
            hit[np.clip(f[frac] + 1, 0, hit.size - 1)] = True
        return int(hit.sum())

    A = B = C = D = 0
    E_int = 0
    E_pla = 0
    dy_trips = 0
    n_pla = 0
    for q in range(d):
        if q % 32 == 0:
            print(f"  splat census plane {q}/{d}", flush=True)
        tyq = gy[q] - rows
        txq = gx[q] - cols
        mty = -tyq   # offset coordinate: tent(tyq + dy) has mass at dy~mty
        mtx = -txq
        # plateau: all three sample coordinates exactly integral (clamp
        # plateaus) — a masked-shift pass handles them in <= #distinct
        # integer (dz, dy, dx) triples; the interior pass sees the rest
        gzq = gz[q]
        pla = ((gzq == np.floor(gzq)) & (mty == np.floor(mty))
               & (mtx == np.floor(mtx)))
        n_pla += int(pla.sum())
        slo, shi = max(0, int(np.floor(gzq.min()))), \
            min(d - 1, int(np.ceil(gzq.max())))
        for s in range(slo, shi + 1):
            zmask = np.abs(gzq - s) < 1.0
            if not zmask.any():
                continue
            if (zmask & pla).any():
                # distinct (dy, dx) integer pairs among plateau voxels
                pairs = {(int(a), int(b)) for a, b in
                         zip(mty[zmask & pla].astype(np.int64).ravel(),
                             mtx[zmask & pla].astype(np.int64).ravel())}
                E_pla += len(pairs)
            for j, dy in enumerate(dys):
                if not dy_present_qdy[q, j]:
                    continue
                m = zmask & (np.abs(mty - dy) < 1.0)
                if not m.any():
                    continue   # the kernel's fy-mass cond skips this
                dy_trips += 1
                A += int(ndx_q[q])
                B += int(dx_rng_qdy[q, j])
                C += int(dx_cnt_qdy[q, j])
                D += n_offsets(mtx[m])
                mi = m & ~pla
                if mi.any():
                    E_int += n_offsets(mtx[mi])
    return {"dy_trips": dy_trips, "A_marginal_dx": A, "B_dx_range": B,
            "C_dx_list": C, "D_exact_joint": D,
            "E_interior": E_int, "E_plateau_pairs": E_pla,
            "plateau_fraction": round(n_pla / (d * h * w), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--max-disp", type=int, default=8)
    ap.add_argument("--tz", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--fields-npz", default="/tmp/census_fields.npz",
                    help="cache of the probed fields; --probe-only writes "
                         "it (chip), a later run reads it (host-only)")
    ap.add_argument("--probe-only", action="store_true")
    args = ap.parse_args()
    d, h, w = args.size
    r = args.max_disp
    if os.path.exists(args.fields_npz) and not args.probe_only:
        z = np.load(args.fields_npz)
        worst, typ = z["worst"], z["typical"]
        print("loaded cached fields", flush=True)
    else:
        worst, typ = probe_fields(args.size, r)
        np.savez(args.fields_npz, worst=worst, typical=typ)
        print("probed + cached fields", flush=True)
        if args.probe_only:
            return
    results = {}
    for name, grid in [("worst", worst), ("typical", typ)]:
        gz, gy, gx = vox_coords(grid, d, h, w)
        fwd = census_fwd(gz, gy, d, h, w, args.tz, r)
        sp = census_splat(gz, gy, gx, d, h, w, r)
        results[name] = {"fwd": fwd, "splat": sp}
        print(f"== {name} ==")
        print("fwd  (tile-ops):", fwd)
        print("splat (dx-trips):", sp)
        # rough VPU-seconds: 1 dx-trip ~ 3 plane passes of h*256 f32 elems
        wp = -(-w // 128) * 128
        for k in ("A_marginal_dx", "B_dx_range", "C_dx_list",
                  "D_exact_joint"):
            secs = sp[k] * 3 * h * wp / 4e12
            print(f"  est {k}: {secs * 32:.2f}s at C=32")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
