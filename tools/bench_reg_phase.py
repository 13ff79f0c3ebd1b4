"""Reg-phase component breakdown at the MB101 recipe size.

The fully-labeled joint iteration is now reg-phase-bound (~1.03 s reg vs
~0.77 s seg, BASELINE.md round 3), so this times the reg step's pieces in
isolation to find where the second goes:

  1. VoxelMorph forward only (net + Pallas warp fwd)
  2. VoxelMorph forward+backward under a trivial loss (adds the warp VJP
     and the conv wgrads)
  3. LNCC(filter 9) fwd+bwd alone on full-size pairs
  4. bending energy fwd+bwd alone on a full-size field
  5. hard_anatomy_dice alone (value only; zero gradient to the reg net?
     no — its field gradient DOES flow; timed fwd and fwd+field-grad)
  6. the full joint reg step (cross-check: ~= 2 + 3 + 4 + 5 + Adam)

  python tools/bench_reg_phase.py [--regime worst|typical]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters, name):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name}: {ms:.1f} ms (compile {compile_s:.1f} s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--regime", choices=["worst", "typical"],
                    default="worst")
    args = ap.parse_args()

    from functools import partial

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight, VoxelMorphCVPR2018
    from deepatlas_tpu.pallas import pallas_grid_sample
    from deepatlas_tpu.pallas.anatomy import hard_anatomy_dice
    from deepatlas_tpu.train.reg_steps import make_joint_reg_step
    from deepatlas_tpu.train.steps import TrainState, make_optimizer

    d, h, w = args.size
    nc = args.n_classes
    ks = jax.random.split(jax.random.PRNGKey(230), 6)
    moving = jax.random.uniform(ks[0], (1, d, h, w, 1), jnp.float32)
    fixed = jax.random.uniform(ks[1], (1, d, h, w, 1), jnp.float32)
    zi = jnp.arange(d)[None, :, None, None]
    mseg = ((jax.random.randint(ks[2], (1, d, h, w), 0, 4)
             + 4 * (zi // 24)) % nc).astype(jnp.int32)
    fseg = ((jax.random.randint(ks[3], (1, d, h, w), 0, 4)
             + 4 * ((zi + 3) // 24)) % nc).astype(jnp.int32)
    has = jnp.ones((1,), bool)

    flow_scale = 1.0 if args.regime == "worst" else 0.02
    reg_model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, packed=True,
                                   use_pallas_warp=True, max_disp=8,
                                   flow_scale=flow_scale)
    rv = reg_model.init(ks[5], moving, fixed)
    rs = TrainState.create(apply_fn=reg_model.apply, params=rv["params"],
                           batch_stats={}, tx=make_optimizer(1e-3))
    seg_model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                          dtype=jnp.bfloat16, packed=True)
    sv = seg_model.init(ks[4], moving, train=False)
    ss = TrainState.create(apply_fn=seg_model.apply, params=sv["params"],
                           batch_stats=sv.get("batch_stats", {}),
                           tx=make_optimizer(1e-3))

    iters = args.iters

    # 1. forward only
    fwd = jax.jit(lambda p, m, f: jax.tree_util.tree_map(
        lambda x: jnp.sum(x.astype(jnp.float32)),
        reg_model.apply({"params": p}, m, f, train=False)))
    t_fwd = timeit(fwd, (rs.params, moving, fixed), iters, "VM fwd")

    # 2. forward+backward, trivial loss (isolates net + warp VJP)
    fb = jax.jit(jax.grad(lambda p, m, f: sum(
        jnp.sum(x.astype(jnp.float32))
        for x in reg_model.apply({"params": p}, m, f, train=True))))
    t_fb = timeit(fb, (rs.params, moving, fixed), iters, "VM fwd+bwd")

    # 3. LNCC fwd+bwd
    sim = get_loss_function("lncc")(filter_size=9)
    lncc_fb = jax.jit(jax.value_and_grad(lambda a, b: sim(a, b)))
    t_lncc = timeit(lncc_fb, (fixed + 0.01, fixed), iters, "LNCC9 fwd+bwd")

    # 4. bending energy fwd+bwd on a channel-last (1,D,H,W,3) field
    bend = get_loss_function("bendingEnergy")()
    disp = jax.random.normal(ks[2], (1, d, h, w, 3), jnp.float32)
    bend_fb = jax.jit(jax.value_and_grad(lambda x: bend(x)))
    t_bend = timeit(bend_fb, (disp,), iters, "bending fwd+bwd")

    # 5. hard anatomy dice, value + field gradient
    deform_fn = jax.jit(lambda p, m, f: reg_model.apply(
        {"params": p}, m, f, train=False)[2])
    deform = jax.device_put(np.asarray(deform_fn(rs.params, moving, fixed)))
    anat_v = jax.jit(lambda g: hard_anatomy_dice(mseg, fseg, g, nc,
                                                 max_disp=8))
    t_an_v = timeit(anat_v, (deform,), iters, "hard_anatomy value")
    anat_g = jax.jit(jax.grad(lambda g: hard_anatomy_dice(
        mseg, fseg, g, nc, max_disp=8)))
    t_an_g = timeit(anat_g, (deform,), iters, "hard_anatomy grad(field)")

    # 5a. fused value+grad forward (grad planes accumulated in the same
    # joint-loop sweep; elementwise backward) — what the reg step runs
    anat_fg = jax.jit(jax.value_and_grad(lambda g: hard_anatomy_dice(
        mseg, fseg, g, nc, max_disp=8, fused_grad=True)))
    t_an_fg = timeit(anat_fg, (deform,), iters,
                     "hard_anatomy value+grad FUSED")

    # 5b. frozen seg-net forward (the reg step runs TWO of these for the
    # label substitution, even when both sides carry ground truth)
    seg_fwd = jax.jit(lambda p, x: jnp.sum(
        seg_model.apply({"params": p, "batch_stats": ss.batch_stats}, x,
                        train=False).astype(jnp.float32)))
    t_segf = timeit(seg_fwd, (ss.params, moving), iters, "frozen seg fwd")

    # 6. full joint reg step
    regl = get_loss_function("bendingEnergy")()
    jr = make_joint_reg_step(sim, regl, 1.0, 1.0, nc,
                             warp_fn=partial(pallas_grid_sample, max_disp=8),
                             anatomy_dtype=jnp.bfloat16, max_disp=8,
                             fused_anatomy=True)
    reg_args = (rs, ss, moving, fixed, mseg, fseg, has, has)
    t0 = time.time()
    rs2, m = jr(*reg_args)
    np.asarray(m["loss"])
    print(f"joint reg step compile {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        rs2, m = jr(rs2, ss, moving, fixed, mseg, fseg, has, has)
    np.asarray(m["loss"])
    t_full = (time.time() - t0) / iters * 1e3
    print(f"joint reg step: {t_full:.1f} ms", flush=True)
    print(f"sum-of-parts (fwd+bwd, lncc, bend, anat-grad, 2x seg fwd): "
          f"{t_fb + t_lncc + t_bend + t_an_g + 2 * t_segf:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
