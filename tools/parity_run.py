"""End-to-end accuracy-parity artifact: same recipe in both frameworks.

Closes the BASELINE north-star "Dice + warp MSE parity vs PyTorch ref" at
the *trajectory* level (round-3 VERDICT next #6): op-level parity is pinned
exhaustively in tests/ (grid_sample bit-parity, ConvTranspose weight-level
parity, loss goldens); this tool trains the SAME tiny segmentation recipe
in torch-CPU and in deepatlas_tpu — identical synthetic corpus, identical
initial weights (flax init transferred into the torch twin), identical
sample order, Adam(1e-3), the multiclass softmax dice loss of
train_seg.py:54-55 — and records the per-epoch validation dice of each,
plus a transferred-weights VoxelMorph warp-MSE spot check.

Two JAX variants run: the f32 XLA conv path (apples-to-apples with torch
f32) and the bf16 packed Pallas flagship (the BENCH configuration) —
the artifact shows both land within tolerance of the torch trajectory.

Writes PARITY_RUN.json.  Run from the repo root (torch is CPU; JAX uses
the default backend — the chip under the driver):

    python tools/parity_run.py [--epochs 8] [--size 40 48 40]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from make_synth_corpus import make_volume  # noqa: E402 (tools/ sibling)


def np_mean_fg_dice(pred: np.ndarray, lab: np.ndarray, n_class: int) -> float:
    """Mean foreground dice of hard predictions — the same numpy metric for
    both frameworks (evalMetrics.py:58-68 semantics, eps-guarded)."""
    scores = []
    for c in range(1, n_class):
        p = pred == c
        t = lab == c
        denom = p.sum() + t.sum()
        if denom == 0:
            continue
        scores.append(2.0 * np.logical_and(p, t).sum() / denom)
    return float(np.mean(scores)) if scores else 0.0


def run_torch(images, labels, val_images, val_labels, perms, init_from,
              n_class: int, lr: float, eps: float):
    """Train the torch twin (tests/test_models.py::TorchUNetLight) with the
    flax-initialized weights; return per-epoch validation dice."""
    import torch
    import torch.nn.functional as F

    from test_models import TorchUNetLight, _transfer_unet_light

    torch.set_num_threads(os.cpu_count() or 1)
    tm = TorchUNetLight(1, n_class, bias=True, bn=True)
    _transfer_unet_light(init_from["params"], init_from["batch_stats"], tm)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)

    imgs = torch.from_numpy(images[:, None])          # (N, 1, D, H, W)
    labs = torch.from_numpy(labels.astype(np.int64))
    vimgs = torch.from_numpy(val_images[:, None])
    vlabs = val_labels

    def dice_loss(logits, lab):
        # mirrors losses/dice.py::dice_loss_multiclass Uniform/softmax
        probs = torch.softmax(logits, dim=1)
        oh = F.one_hot(lab, n_class).permute(0, 4, 1, 2, 3).float()
        inter = (probs * oh).sum(dim=(2, 3, 4))
        sv = probs.sum(dim=(2, 3, 4))
        tv = oh.sum(dim=(2, 3, 4))
        return 1.0 - ((2.0 * inter + eps) / (sv + tv + 2.0 * eps)).mean()

    curve = []
    for perm in perms:
        tm.train()
        for i in perm:
            opt.zero_grad()
            loss = dice_loss(tm(imgs[i:i + 1]), labs[i:i + 1])
            loss.backward()
            opt.step()
        tm.eval()
        with torch.no_grad():
            ds = []
            for v in range(len(vimgs)):
                pred = tm(vimgs[v:v + 1]).argmax(dim=1)[0].numpy()
                ds.append(np_mean_fg_dice(pred, vlabs[v], n_class))
        curve.append(float(np.mean(ds)))
    return curve


def run_jax(images, labels, val_images, val_labels, perms, n_class: int,
            lr: float, eps: float, packed: bool, init_vars=None):
    """Train deepatlas_tpu's UNetLight on the same recipe; return
    (per-epoch validation dice, init variables of the f32 model)."""
    import jax
    import jax.numpy as jnp

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight
    from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                           make_seg_train_step)

    model = UNetLight(in_channel=1, n_classes=n_class, bias=True, BN=True,
                      dtype=jnp.bfloat16 if packed else None, packed=packed)
    imgs = jnp.asarray(images[..., None])             # (N, D, H, W, 1)
    labs = jnp.asarray(labels.astype(np.int32))
    if init_vars is None:
        init_vars = UNetLight(in_channel=1, n_classes=n_class, bias=True,
                              BN=True).init(jax.random.PRNGKey(230),
                                            imgs[:1], train=False)
    # keep on HOST: the donating train step deletes the state's device
    # buffers, and init_vars is reused by the packed run + the torch twin
    init_vars = jax.device_get(init_vars)
    if packed:
        from deepatlas_tpu.models.packed import transfer_unet_params
        model_vars = transfer_unet_params(init_vars, model)
    else:
        model_vars = init_vars
    state = TrainState.create(
        apply_fn=model.apply, params=model_vars["params"],
        batch_stats=model_vars.get("batch_stats", {}),
        tx=make_optimizer(lr))
    crit = get_loss_function("dice")(n_class=n_class, weight_type="Uniform",
                                     softmax=True, eps=eps)
    step = make_seg_train_step(crit)
    fwd = jax.jit(lambda st, x: jnp.argmax(model.apply(
        {"params": st.params, "batch_stats": st.batch_stats}, x,
        train=False), axis=-1))

    vimgs = jnp.asarray(val_images[..., None])
    curve = []
    for perm in perms:
        for i in perm:
            state, loss, _ = step(state, imgs[i:i + 1], labs[i:i + 1])
        ds = []
        for v in range(val_images.shape[0]):
            pred = np.asarray(fwd(state, vimgs[v:v + 1]))[0]
            ds.append(np_mean_fg_dice(pred, val_labels[v], n_class))
        curve.append(float(np.mean(ds)))
    return curve, init_vars


def warp_mse_spot_check(size, seed: int = 3) -> dict:
    """Transferred-weights VoxelMorph forward on one pair: the MSE between
    the frameworks' warped outputs (voxel_morph.py:62-92 parity at the
    model level — the trajectory complement of tests/test_models.py)."""
    import jax
    import jax.numpy as jnp
    import torch

    from deepatlas_tpu.models import VoxelMorphCVPR2018
    from test_models import TorchVoxelMorph, _transfer_voxelmorph

    rng = np.random.RandomState(seed)
    d, h, w = size
    moving = rng.rand(1, d, h, w, 1).astype(np.float32)
    fixed = rng.rand(1, d, h, w, 1).astype(np.float32)

    model = VoxelMorphCVPR2018()
    variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(moving),
                           jnp.asarray(fixed))
    disp_j, warped_j, _ = model.apply(variables, jnp.asarray(moving),
                                      jnp.asarray(fixed))

    tm = TorchVoxelMorph()
    _transfer_voxelmorph(variables["params"], tm)
    with torch.no_grad():
        disp_t, warped_t, _ = tm(
            torch.from_numpy(moving.transpose(0, 4, 1, 2, 3)),
            torch.from_numpy(fixed.transpose(0, 4, 1, 2, 3)))
    wj = np.asarray(warped_j)[..., 0]
    wt = warped_t.numpy()[:, 0]
    return {
        "warp_mse": float(np.mean((wj - wt) ** 2)),
        "disp_max_abs_diff": float(np.max(np.abs(
            np.asarray(disp_j) - disp_t.numpy().transpose(0, 2, 3, 4, 1)))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[40, 48, 40])
    ap.add_argument("--n-classes", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=8)
    ap.add_argument("--n-valid", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--tail", type=int, default=4,
                    help="epochs averaged for the parity comparison")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--tolerance", type=float, default=0.05,
                    help="max |tail-mean dice difference| to PASS "
                         "(trajectory-level criterion: identical init and "
                         "sample order, but f32-vs-torch op-order numerics "
                         "compound over hundreds of steps)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[230, 231, 232],
                    help="one full trajectory comparison per seed (round-4 "
                         "VERDICT next #7: the single-seed f32 margin was "
                         "0.043 of 0.05 — multi-seed tails are the "
                         "evidence that parity is not one lucky draw)")
    ap.add_argument("--skip-packed", action="store_true")
    ap.add_argument("--out", default="PARITY_RUN.json")
    args = ap.parse_args()

    shape = tuple(args.size)
    nc = args.n_classes
    tail = max(1, min(args.tail, args.epochs))
    per_seed = []
    for seed in args.seeds:
        rng = np.random.RandomState(seed)
        vols = [make_volume(rng, shape, nc)
                for _ in range(args.n_train + args.n_valid)]
        images = np.stack([v[0] for v in vols[:args.n_train]])
        labels = np.stack(
            [v[1] for v in vols[:args.n_train]]).astype(np.int32)
        val_images = np.stack([v[0] for v in vols[args.n_train:]])
        val_labels = np.stack(
            [v[1] for v in vols[args.n_train:]]).astype(np.int32)

        order = np.random.RandomState(seed + 1)
        perms = [order.permutation(args.n_train)
                 for _ in range(args.epochs)]

        t0 = time.time()
        jax_f32, init_vars = run_jax(images, labels, val_images,
                                     val_labels, perms, nc, args.lr,
                                     args.eps, packed=False)
        t_jax = time.time() - t0
        print(f"[seed {seed}] jax f32 curve: {jax_f32}  ({t_jax:.0f}s)",
              flush=True)

        jax_packed = None
        if not args.skip_packed:
            t0 = time.time()
            jax_packed, _ = run_jax(images, labels, val_images, val_labels,
                                    perms, nc, args.lr, args.eps,
                                    packed=True, init_vars=init_vars)
            print(f"[seed {seed}] jax bf16 packed curve: {jax_packed}  "
                  f"({time.time() - t0:.0f}s)", flush=True)

        init_np = {
            "params": init_vars["params"],
            "batch_stats": init_vars.get("batch_stats", {}),
        }
        t0 = time.time()
        torch_curve = run_torch(images, labels, val_images, val_labels,
                                perms, init_np, nc, args.lr, args.eps)
        t_torch = time.time() - t0
        print(f"[seed {seed}] torch f32 curve: {torch_curve}  "
              f"({t_torch:.0f}s)", flush=True)

        tm_t = float(np.mean(torch_curve[-tail:]))
        tm_j = float(np.mean(jax_f32[-tail:]))
        tm_p = float(np.mean(jax_packed[-tail:])) if jax_packed else None
        per_seed.append({
            "seed": seed,
            "torch_valid_dice": torch_curve,
            "jax_f32_valid_dice": jax_f32,
            "jax_bf16_packed_valid_dice": jax_packed,
            "tail_mean_torch": tm_t,
            "tail_mean_f32": tm_j,
            "tail_mean_packed": tm_p,
            "tail_abs_diff_f32": abs(tm_t - tm_j),
            "tail_abs_diff_packed": (abs(tm_t - tm_p)
                                     if tm_p is not None else None),
            "pass": abs(tm_t - tm_j) <= args.tolerance and (
                tm_p is None or abs(tm_t - tm_p) <= args.tolerance),
            "wall_s": {"torch": round(t_torch, 1),
                       "jax_f32": round(t_jax, 1)},
        })
        # incremental write: a wall-clock kill between seeds keeps the
        # completed trajectories (each seed is ~10+ min on this host)
        _write_out(args, shape, nc, tail, per_seed, spot=None,
                   partial=(len(per_seed) < len(args.seeds)))

    spot = warp_mse_spot_check([24, 24, 24])
    out = _write_out(args, shape, nc, tail, per_seed, spot=spot,
                     partial=False)
    print(json.dumps(out))


def _write_out(args, shape, nc, tail, per_seed, spot, partial):
    out = {
        "recipe": {
            "size": list(shape), "n_classes": nc,
            "n_train": args.n_train, "n_valid": args.n_valid,
            "epochs": args.epochs, "lr": args.lr, "loss":
            "dice Uniform softmax eps=%g" % args.eps,
            "optimizer": "Adam", "seeds": args.seeds,
            "identical_init": True, "identical_sample_order": True,
        },
        # compare the settled tail, not the single final epoch: around the
        # first "breakthrough" epoch the dice trajectory is dominated by
        # seed/order noise (the r04 8-epoch run had torch 0.31->0.23 and
        # jax 0.25->0.33 across its last two epochs — both climbing, the
        # comparison meaningless); the mean over the last `tail` epochs of
        # a longer run is the stable statistic
        "tail_epochs": tail,
        "seeds": per_seed,
        "max_tail_abs_diff_f32": max(s["tail_abs_diff_f32"]
                                     for s in per_seed),
        "max_tail_abs_diff_packed": max(
            (s["tail_abs_diff_packed"] for s in per_seed
             if s["tail_abs_diff_packed"] is not None), default=None),
        "tolerance": args.tolerance,
        "pass": all(s["pass"] for s in per_seed),
        "voxelmorph_spot_check": spot,
    }
    if partial:
        out["partial"] = ("%d of %d seeds completed before the wall-clock "
                          "bound" % (len(per_seed), len(args.seeds)))
    with open(os.path.join(_ROOT, args.out), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
