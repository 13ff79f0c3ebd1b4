"""Headline benchmark: joint DeepAtlas train-step throughput on one chip.

Measures volumes/sec/chip of the alternating joint training iteration (one
registration update + one segmentation update on a (moving, fixed) pair) at
the reference's MindBoggle101 cropped volume size (168x200x168, batch 1,
32 classes — train_seg.py:33-61 recipe), on the default JAX backend (the real
TPU chip under the driver).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against the PyTorch-CPU measurement recorded in
BASELINE_MEASURED.json (produced by tools/bench_baseline_torch.py — the
reference publishes no numbers, SURVEY.md §6, so the baseline is measured).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n-classes", type=int, default=32)
    args = ap.parse_args()

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight, VoxelMorphCVPR2018
    from deepatlas_tpu.train.reg_steps import make_reg_train_step
    from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                           make_seg_train_step)

    d, h, w = args.size
    nc = args.n_classes
    shape = (1, d, h, w, 1)

    key = jax.random.PRNGKey(230)
    ks = jax.random.split(key, 5)
    moving = jax.random.uniform(ks[0], shape, jnp.float32)
    fixed = jax.random.uniform(ks[1], shape, jnp.float32)
    labels = jax.random.randint(ks[2], shape[:4], 0, nc, jnp.int32)

    # bf16 compute: the full-size training step fits one chip's HBM without
    # remat (f32 needs ~35G vs 16G; bf16 remat costs ~2x backward time)
    # seg: per-block remat — the full seg step (grads + Adam buffers) is
    # ~17.7G without it, just over one chip's 15.75G HBM
    seg_model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                          dtype=jnp.bfloat16, remat=True)
    # Pallas spatial transformer (pallas/warp.py): XLA's TPU gather lowering
    # runs ~7x slower on this op
    # reg: remat needed too — the reg step + LNCC-backward intermediates
    # exceed HBM without it
    reg_model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, remat=True,
                                   use_pallas_warp=True, max_disp=8)
    seg_vars = seg_model.init(ks[3], moving, train=False)
    reg_vars = reg_model.init(ks[4], moving, fixed)
    seg_state = TrainState.create(
        apply_fn=seg_model.apply, params=seg_vars["params"],
        batch_stats=seg_vars.get("batch_stats", {}), tx=make_optimizer(1e-3))
    reg_state = TrainState.create(
        apply_fn=reg_model.apply, params=reg_vars["params"], batch_stats={},
        tx=make_optimizer(1e-3))

    sim = get_loss_function("lncc")(filter_size=9)
    reg_l = get_loss_function("bendingEnergy")()
    dice = get_loss_function("dice")(n_class=nc, weight_type="Uniform",
                                     softmax=True)
    reg_step = make_reg_train_step(sim, reg_l, reg_weight=1.0)
    seg_step = make_seg_train_step(dice)

    import numpy as np

    # warmup / compile (np.asarray forces a real D2H sync — the axon
    # backend's block_until_ready returns early)
    reg_state, m = reg_step(reg_state, moving, fixed)
    seg_state, loss, _ = seg_step(seg_state, moving, labels)
    np.asarray(m["loss"]), np.asarray(loss)

    t0 = time.time()
    for _ in range(args.iters):
        reg_state, m = reg_step(reg_state, moving, fixed)
        seg_state, loss, _ = seg_step(seg_state, moving, labels)
    np.asarray(m["loss"]), np.asarray(loss)
    dt = (time.time() - t0) / args.iters
    vols_per_sec = 2.0 / dt  # the (moving, fixed) pair per joint iteration

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get("torch_cpu_volumes_per_sec")
        if ref:
            vs_baseline = vols_per_sec / ref

    print(json.dumps({
        "metric": "joint seg+reg train step throughput "
                  f"({d}x{h}x{w}, batch 1, {nc} classes)",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": (round(vs_baseline, 2) if vs_baseline is not None
                        else None),
    }))


if __name__ == "__main__":
    main()
