"""Joint DeepAtlas step benchmark at the MB101 recipe size (config 3).

Measures the alternating joint steps (reg phase / seg phase, with the
anatomy one-hot warps) on the default backend.  Run from the repo root.

  python tools/bench_joint.py                 # both phases, timed
  python tools/bench_joint.py --seg-only      # seg phase only
  python tools/bench_joint.py --reg-only      # reg phase only
  python tools/bench_joint.py --memory        # compile-only HBM analysis

Reference workload: the alternating semi-supervised scheme of the
MICCAI'19 DeepAtlas paper (reference models/segmentation.py trains only
seg; the joint steps realize the paper scheme the README promises).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--seg-only", action="store_true")
    ap.add_argument("--reg-only", action="store_true")
    ap.add_argument("--memory", action="store_true",
                    help="print compiled memory analysis instead of running")
    ap.add_argument("--no-bn", action="store_true")
    ap.add_argument("--no-packed", action="store_true",
                    help="run the seg U-Net on XLA convs instead of the "
                         "packed Pallas kernels")
    ap.add_argument("--no-hard-fused", action="store_true",
                    help="disable the fully-labeled seg-phase fast path "
                         "(force the dense C=n_class probability warp)")
    ap.add_argument("--labels", choices=["both", "moving", "fixed", "none"],
                    default="both",
                    help="which sides carry ground-truth labels (the "
                         "semi-supervised regimes exercise the soft paths)")
    args = ap.parse_args()

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight, VoxelMorphCVPR2018
    from deepatlas_tpu.train.reg_steps import (make_joint_reg_step,
                                               make_joint_seg_step)
    from deepatlas_tpu.train.steps import TrainState, make_optimizer

    d, h, w = args.size
    nc = args.n_classes
    ks = jax.random.split(jax.random.PRNGKey(230), 6)
    moving = jax.random.uniform(ks[0], (1, d, h, w, 1), jnp.float32)
    fixed = jax.random.uniform(ks[1], (1, d, h, w, 1), jnp.float32)
    mseg = jax.random.randint(ks[2], (1, d, h, w), 0, nc, jnp.int32)
    fseg = jax.random.randint(ks[3], (1, d, h, w), 0, nc, jnp.int32)
    has = jnp.ones((1,), bool)
    no = jnp.zeros((1,), bool)
    has_m = has if args.labels in ("both", "moving") else no
    has_f = has if args.labels in ("both", "fixed") else no

    packed = not args.no_packed
    seg_model = UNetLight(in_channel=1, n_classes=nc, bias=True,
                          BN=not args.no_bn, dtype=jnp.bfloat16,
                          packed=packed, remat=not packed)
    reg_model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, remat=not packed,
                                   packed=packed,
                                   use_pallas_warp=True, max_disp=8)
    sv = seg_model.init(ks[4], moving, train=False)
    rv = reg_model.init(ks[5], moving, fixed)
    ss = TrainState.create(apply_fn=seg_model.apply, params=sv["params"],
                           batch_stats=sv.get("batch_stats", {}),
                           tx=make_optimizer(1e-3))
    rs = TrainState.create(apply_fn=reg_model.apply, params=rv["params"],
                           batch_stats={}, tx=make_optimizer(1e-3))

    sim = get_loss_function("lncc")(filter_size=9)
    regl = get_loss_function("bendingEnergy")()
    sup = get_loss_function("dice")(n_class=nc, weight_type="Uniform",
                                    softmax=True)
    from functools import partial

    from deepatlas_tpu.pallas import pallas_grid_sample
    wfn = partial(pallas_grid_sample, max_disp=8)
    # seg phase: the reg field is frozen — skip the C=n_class grid-gradient
    # kernels in the warp VJP
    wfn_seg = partial(pallas_grid_sample, max_disp=8, grad="values")
    jr = make_joint_reg_step(sim, regl, 1.0, 1.0, nc, warp_fn=wfn,
                             anatomy_dtype=jnp.bfloat16, max_disp=8,
                             fused_anatomy=packed)
    js = make_joint_seg_step(sup, 1.0, 1.0, nc, warp_fn=wfn_seg,
                             anatomy_dtype=jnp.bfloat16, two_pass=True,
                             hard_fused=not args.no_hard_fused, max_disp=8)
    reg_args = (rs, ss, moving, fixed, mseg, fseg, has_m, has_f)
    seg_args = (ss, rs, moving, fixed, mseg, fseg, has_m, has_f)

    if args.memory:
        for name, fn, fargs in (("reg", jr, reg_args), ("seg", js, seg_args)):
            if name == "reg" and args.seg_only:
                continue
            if name == "seg" and args.reg_only:
                continue
            mem = fn.lower(*fargs).compile().memory_analysis()
            gib = 1024 ** 3
            print(f"joint {name} step memory: "
                  f"peak includes args {mem.argument_size_in_bytes/gib:.2f} "
                  f"out {mem.output_size_in_bytes/gib:.2f} "
                  f"temp {mem.temp_size_in_bytes/gib:.2f} GiB", flush=True)
        return

    # keep undonated copies: each step donates its own state (arg 0), so
    # always pass the freshest state and never reuse a donated array
    if not args.seg_only:
        t0 = time.time()
        rs, m = jr(*reg_args)
        np.asarray(m["loss"])
        print("joint reg step compile+run", round(time.time() - t0, 1), "s",
              flush=True)
        t0 = time.time()
        for _ in range(args.iters):
            rs, m = jr(rs, ss, moving, fixed, mseg, fseg, has_m, has_f)
        np.asarray(m["loss"])
        print("joint reg step:",
              round((time.time() - t0) / args.iters * 1e3, 1), "ms",
              flush=True)
    if not args.reg_only:
        t0 = time.time()
        ss, m2 = js(ss, rs, moving, fixed, mseg, fseg, has_m, has_f)
        np.asarray(m2["loss"])
        print("joint seg step compile+run", round(time.time() - t0, 1), "s",
              flush=True)
        t0 = time.time()
        for _ in range(args.iters):
            ss, m2 = js(ss, rs, moving, fixed, mseg, fseg, has_m, has_f)
        np.asarray(m2["loss"])
        print("joint seg step:",
              round((time.time() - t0) / args.iters * 1e3, 1), "ms",
              flush=True)


if __name__ == "__main__":
    main()
