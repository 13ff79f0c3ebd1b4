"""Isolated Pallas warp/splat kernel benchmark at MB101 size.

Times the C-channel trilinear warp forward (pallas/warp.py) and its
values-VJP splat (pallas/splat.py) — the seg-phase anatomy hot spot — under
three field regimes:

  * ``smooth``:  |disp| <= ~2 voxels, low frequency (the trained regime,
    reference voxel_morph.py:88 fields settle to a few voxels);
  * ``saturated``: a smooth low-frequency field scaled far beyond the bound
    so clamping saturates it at +-max_disp with sign structure (the
    untrained worst case the headline bench exercises);
  * ``adversarial``: per-voxel uniform noise over [-max_disp, max_disp]
    (no training regime produces this; lower bound on kernel performance).

Also times the C=1 matched-warp forward (pallas/anatomy.py) for scale.

  python tools/bench_warp.py --channels 32 --iters 3
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_field(kind, shape, max_disp, key):
    """Normalized (B,D,H,W,3) deformation = identity + displacement."""
    from deepatlas_tpu.ops import identity_grid_batch
    b, d, h, w = shape
    ident = identity_grid_batch((b, d, h, w, 3), dtype=jnp.float32)
    # voxel -> normalized scale per axis (x,y,z ordering)
    scale = jnp.asarray([2.0 / (w - 1), 2.0 / (h - 1), 2.0 / (d - 1)],
                        jnp.float32)
    # low-frequency smooth field: sum of a few 3-D sine products
    zz, yy, xx = jnp.meshgrid(jnp.linspace(0, 1, d), jnp.linspace(0, 1, h),
                              jnp.linspace(0, 1, w), indexing="ij")
    base = jnp.stack([
        jnp.sin(2 * jnp.pi * (1.3 * xx + 0.7 * yy)) * jnp.cos(
            2 * jnp.pi * 0.9 * zz),
        jnp.cos(2 * jnp.pi * (0.8 * yy + 1.1 * zz)) * jnp.sin(
            2 * jnp.pi * 0.6 * xx),
        jnp.sin(2 * jnp.pi * (0.5 * zz + 1.2 * xx)) * jnp.cos(
            2 * jnp.pi * 0.8 * yy)], axis=-1)[None]
    if kind == "smooth":
        disp_vox = 2.0 * base
    elif kind == "saturated":
        disp_vox = 40.0 * base          # clamps to +-max_disp nearly everywhere
    elif kind == "adversarial":
        disp_vox = jax.random.uniform(key, (b, d, h, w, 3), jnp.float32,
                                      -max_disp, max_disp)
    else:
        raise ValueError(kind)
    return ident + disp_vox * scale


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--max-disp", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--regimes", nargs="+",
                    default=["smooth", "saturated"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--what", nargs="+",
                    default=["fwd", "vjp", "matched"])
    ap.add_argument("--onehot", action="store_true",
                    help="use a one-hot (anatomy) volume instead of dense "
                         "values — exercises the kernels' empty-slab "
                         "presence skip (the m-hard/f-hard joint branches "
                         "warp/splat one-hots); 'vjp' then times the "
                         "standalone adjoint splat of the one-hot")
    args = ap.parse_args()

    from deepatlas_tpu.pallas import pallas_grid_sample
    from deepatlas_tpu.pallas.anatomy import hard_anatomy_dice

    d, h, w = args.size
    c = args.channels
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    # anatomy-like labels: z-dependent shells, a handful of classes per slab
    zi = jnp.arange(d)[None, :, None, None]
    labs = ((jax.random.randint(jax.random.fold_in(key, 1), (1, d, h, w),
                                0, 4) + 4 * (zi // 24)) % c).astype(jnp.int32)
    if args.onehot:
        from deepatlas_tpu.ops import one_hot
        vol = one_hot(labs, c, dtype=jnp.float32).astype(dt)
    else:
        vol = jax.random.uniform(key, (1, d, h, w, c),
                                 jnp.float32).astype(dt)

    fwd = jax.jit(lambda v, g: pallas_grid_sample(
        v, g, max_disp=args.max_disp, grad="values"))

    if args.onehot:
        # the f-hard branch's op: standalone adjoint splat of the one-hot
        from functools import partial

        from deepatlas_tpu.ops.warp import warp_values_adjoint
        vjp = jax.jit(lambda v, g: warp_values_adjoint(
            partial(pallas_grid_sample, max_disp=args.max_disp,
                    grad="values"), v, g))
    else:
        # dense cotangents: ct_sparse=False, matching the soft-path
        # training steps (train/deepatlas.py warp_fn partials)
        def vjp_fn(v, g):
            out, pull = jax.vjp(
                lambda vv: pallas_grid_sample(vv, g, max_disp=args.max_disp,
                                              grad="values",
                                              ct_sparse=False), v)
            return pull(out)[0]
        vjp = jax.jit(vjp_fn)
    matched = jax.jit(lambda lm, lf, g: hard_anatomy_dice(
        lm, lf, g, c, max_disp=args.max_disp))

    for regime in args.regimes:
        grid = make_field(regime, (1, d, h, w), args.max_disp,
                          jax.random.fold_in(key, 2))
        for name, fn, fa in (("warp_fwd C={}".format(c), fwd, (vol, grid)),
                             ("warp_vjp C={}".format(c), vjp, (vol, grid)),
                             ("matched C=1", matched, (labs, labs, grid))):
            tag = name.split()[0].replace("warp_", "")
            if tag not in args.what and not (tag == "matched"
                                             and "matched" in args.what):
                continue
            t0 = time.time()
            out = fn(*fa)
            sync(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(*fa)
            sync(out)
            ms = (time.time() - t0) / args.iters * 1e3
            print(f"{regime:12s} {name:16s} {ms:9.1f} ms  "
                  f"(first call {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
