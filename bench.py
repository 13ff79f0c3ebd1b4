"""Headline benchmark: joint DeepAtlas train-iteration throughput on one chip.

Measures volumes/sec/chip of the TRUE alternating joint training iteration —
one registration-phase update (VoxelMorph forward, LNCC similarity, bending
energy, anatomy dice through the warped one-hot segmentation, backward,
Adam) plus one segmentation-phase update (two U-Net branches, supervised
dice, anatomy consistency through the frozen warp via the exact two-pass
gradient split, backward, Adam) — at the reference's MindBoggle101 recipe
(168x200x168 crop, batch 1, 32 classes, train_seg.py:33-61), on the default
JAX backend (the real TPU chip under the driver).  Both networks run the
packed-layout Pallas conv path; the reg-phase anatomy uses the fused
matched-warp kernel.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against the PyTorch-CPU measurement in
BASELINE_MEASURED.json (tools/bench_baseline_torch.py — the same joint
iteration with anatomy losses; the reference repo publishes no numbers,
SURVEY.md §6).  NB: this host exposes a single CPU core, so the baseline is
single-core torch; BASELINE_MEASURED.json records ``n_threads``.
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--regime", choices=["worst", "typical"], default="worst",
                    help="'worst' (default): untrained net, fields saturate "
                         "the max_disp bound — the adaptive-range kernels' "
                         "worst case.  'typical': the flow head is scaled so "
                         "p99 |disp| ~ 2 voxels, the regime a trained "
                         "VoxelMorph settles into (ref voxel_morph.py:88); "
                         "the measured field magnitude is reported.")
    ap.add_argument("--labels", choices=["both", "moving", "fixed", "none"],
                    default="both",
                    help="which sides carry ground-truth labels; 'both' is "
                         "the fully-labeled MB101-21 recipe (seg phase takes "
                         "the zero-anatomy-gradient fast path), the others "
                         "exercise the semi-supervised soft paths")
    args = ap.parse_args()

    from functools import partial

    import numpy as np

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight, VoxelMorphCVPR2018
    from deepatlas_tpu.pallas import pallas_grid_sample
    from deepatlas_tpu.train.reg_steps import (make_joint_reg_step,
                                               make_joint_seg_step)
    from deepatlas_tpu.train.steps import TrainState, make_optimizer

    d, h, w = args.size
    nc = args.n_classes

    key = jax.random.PRNGKey(230)
    ks = jax.random.split(key, 6)
    moving = jax.random.uniform(ks[0], (1, d, h, w, 1), jnp.float32)
    fixed = jax.random.uniform(ks[1], (1, d, h, w, 1), jnp.float32)
    # anatomy-like labels: z-dependent shells with local noise, a handful of
    # classes per z-slab — the spatial structure real MB101 segmentations
    # have (each label occupies a contiguous region, datasets.py corpora),
    # which the kernels' per-slab class-presence skip sees.  Uniform-random
    # labels (every class everywhere) are measurable via
    # tools/bench_warp.py without --onehot.
    zi_ = jnp.arange(d)[None, :, None, None]
    mseg = ((jax.random.randint(ks[2], (1, d, h, w), 0, 4)
             + 4 * (zi_ // 24)) % nc).astype(jnp.int32)
    fseg = ((jax.random.randint(ks[3], (1, d, h, w), 0, 4)
             + 4 * ((zi_ + 8) // 24)) % nc).astype(jnp.int32)
    has = jnp.ones((1,), bool)
    no = jnp.zeros((1,), bool)
    has_m = has if args.labels in ("both", "moving") else no
    has_f = has if args.labels in ("both", "fixed") else no

    seg_model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                          dtype=jnp.bfloat16, packed=True)
    reg_model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, packed=True,
                                   use_pallas_warp=True, max_disp=8)
    seg_vars = seg_model.init(ks[4], moving, train=False)
    reg_vars = reg_model.init(ks[5], moving, fixed)

    field_p99_vox = None
    if args.regime == "typical":
        # measure the untrained field, then scale the flow head so p99 |disp|
        # lands at ~2 voxels — the trained-regime magnitude
        probe = jax.jit(lambda v, m, f: reg_model.apply(v, m, f)[0])
        disp = np.asarray(probe(reg_vars, moving, fixed), np.float32)
        vox = np.abs(disp) * (np.asarray([w, h, d], np.float32) - 1) / 2.0
        p99 = float(np.percentile(vox, 99))
        scale = 2.0 / max(p99, 1e-6)
        reg_model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, packed=True,
                                       use_pallas_warp=True, max_disp=8,
                                       flow_scale=scale)
        field_p99_vox = round(p99 * scale, 2)
    seg_state = TrainState.create(
        apply_fn=seg_model.apply, params=seg_vars["params"],
        batch_stats=seg_vars.get("batch_stats", {}), tx=make_optimizer(1e-3))
    reg_state = TrainState.create(
        apply_fn=reg_model.apply, params=reg_vars["params"], batch_stats={},
        tx=make_optimizer(1e-3))

    sim = get_loss_function("lncc")(filter_size=9)
    reg_l = get_loss_function("bendingEnergy")()
    sup = get_loss_function("dice")(n_class=nc, weight_type="Uniform",
                                    softmax=True)
    wfn = partial(pallas_grid_sample, max_disp=8)
    wfn_seg = partial(pallas_grid_sample, max_disp=8, grad="values")
    reg_step = make_joint_reg_step(sim, reg_l, reg_weight=1.0,
                                   anatomy_weight=1.0, n_class=nc,
                                   warp_fn=wfn, anatomy_dtype=jnp.bfloat16,
                                   max_disp=8, fused_anatomy=True)
    seg_step = make_joint_seg_step(sup, anatomy_weight=1.0,
                                   supervised_weight=1.0, n_class=nc,
                                   warp_fn=wfn_seg,
                                   anatomy_dtype=jnp.bfloat16, two_pass=True,
                                   hard_fused=True, max_disp=8)

    # warmup / compile (np.asarray forces a real D2H sync — the axon
    # backend's block_until_ready returns early)
    reg_state, m = reg_step(reg_state, seg_state, moving, fixed, mseg, fseg,
                            has_m, has_f)
    seg_state, m2 = seg_step(seg_state, reg_state, moving, fixed, mseg,
                             fseg, has_m, has_f)
    np.asarray(m["loss"]), np.asarray(m2["loss"])

    t0 = time.time()
    for _ in range(args.iters):
        reg_state, m = reg_step(reg_state, seg_state, moving, fixed, mseg,
                                fseg, has_m, has_f)
        seg_state, m2 = seg_step(seg_state, reg_state, moving, fixed, mseg,
                                 fseg, has_m, has_f)
    np.asarray(m["loss"]), np.asarray(m2["loss"])
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

    out = {
        "metric": "joint DeepAtlas train iteration (reg+seg phases incl. "
                  f"anatomy losses, {d}x{h}x{w}, batch 1, {nc} classes)",
        "value": round(vols_per_sec, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": (round(vs_baseline, 2) if vs_baseline is not None
                        else None),
    }
    if args.regime == "typical":
        out["metric"] += " [typical regime: trained-magnitude field]"
        out["field_p99_vox"] = field_p99_vox
    if args.labels != "both":
        out["metric"] += f" [labels={args.labels}]"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
