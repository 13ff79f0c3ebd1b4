#!/usr/bin/env python
"""Whole-volume segmentation inference via sliding-window tiles.

The OAI-style capability the reference assembles from Partition /
pred_iter / assemble (lib/transforms.py:508-649, lib/tools.py:363-377):
load a trained checkpoint, partition each test volume into overlap tiles,
predict on device in fixed-size tile batches, reassemble (center-stitch or
per-voxel voting), report per-class Dice when ground truth exists, and
optionally write predictions as .nii.gz.

Example:
  python infer_seg.py --ckpt <dir>/model_best --data-root <dir> \
      --list-file test.txt --data OAI --n-classes 5 \
      --tile-size 128 128 128 --overlap 16 16 16 --out-dir preds/
"""
import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint directory (orbax) to restore")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--list-file", required=True)
    ap.add_argument("--data", default="OAI",
                    help="dataset key (OAI/OASIS/MindBoggle/...)")
    ap.add_argument("--model", default="UNet_light")
    ap.add_argument("--n-classes", type=int, required=True)
    ap.add_argument("--bias", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--BN", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--packed", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="packed-layout Pallas conv path (must match how "
                         "the checkpoint was trained: packed and standard "
                         "models have different parameter trees)")
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--tile-size", type=int, nargs=3, default=[128, 128, 128])
    ap.add_argument("--overlap", type=int, nargs=3, default=[16, 16, 16])
    ap.add_argument("--tile-batch", type=int, default=4)
    ap.add_argument("--vote", action="store_true",
                    help="per-voxel label voting instead of center stitch")
    ap.add_argument("--out-dir", default=None,
                    help="write predicted masks as .nii.gz here")
    ap.add_argument("--flip-left", action="store_true",
                    help="OAI LEFT-knee flip preprocessing")
    ap.add_argument("--spatial-shards", type=int, default=0,
                    help="EXACT whole-volume inference depth-sharded over "
                         "this many devices (parallel/spatial.py) instead "
                         "of overlap tiles — no stitch seams; requires D "
                         "divisible by shards x 8 (packed or XLA convs)")
    args = ap.parse_args()

    from deepatlas_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    import jax.numpy as jnp

    from deepatlas_tpu.data import (Compose, DataLoader, LeftToRight,
                                    VolumeToArray, get_seg_dataset,
                                    write_nifti)
    from deepatlas_tpu.models import get_network
    from deepatlas_tpu.train import load_checkpoint, make_tile_predictor
    from deepatlas_tpu.train.inference import sliding_window_predict
    from deepatlas_tpu.metrics.confusion import (confusion_matrix,
                                                 dice_from_confusion)

    transforms = [VolumeToArray()]
    if args.flip_left:
        transforms.append(LeftToRight())
    dataset = get_seg_dataset(args.data)(
        args.list_file, args.data_root, with_seg=True,
        pre_transform=Compose(transforms))
    loader = DataLoader(dataset, batch_size=1, shuffle=False, prefetch=2)

    model = get_network(args.model)(
        in_channel=1, n_classes=args.n_classes, bias=args.bias, BN=args.BN,
        packed=args.packed,
        dtype=jnp.bfloat16 if args.bf16 else None)
    example = jnp.zeros((1,) + tuple(args.tile_size) + (1,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    template = {"epoch": 0, "best_score": 0.0,
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "opt_state": None}
    try:
        restored = load_checkpoint(args.ckpt, template)
    except Exception:
        restored = load_checkpoint(args.ckpt)
    apply_vars = {"params": restored["params"]}
    if restored.get("batch_stats"):
        apply_vars["batch_stats"] = restored["batch_stats"]

    spatial_fwd = None
    if args.spatial_shards > 1:
        from jax.sharding import Mesh

        from deepatlas_tpu.parallel import make_spatial_seg_forward
        from deepatlas_tpu.train.steps import TrainState

        mesh = Mesh(np.asarray(jax.devices()[:args.spatial_shards]),
                    ("space",))
        import optax
        sp_state = TrainState.create(
            apply_fn=model.apply, params=apply_vars["params"],
            batch_stats=apply_vars.get("batch_stats", {}),
            tx=optax.identity())  # inference-only: no optimizer state
        spatial_fwd = make_spatial_seg_forward(model, mesh)

    predict = make_tile_predictor(model.apply, apply_vars, args.tile_batch)

    @jax.jit
    def _dice(pred, truth):
        cm = confusion_matrix(pred[None].astype(jnp.int32),
                              truth[None].astype(jnp.int32), args.n_classes)
        return dice_from_confusion(cm, 1e-11)[1:]

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    all_dice = []
    for batch in loader:
        name = batch["name"][0]
        sample = {"image": batch["image"][0],
                  "like": batch.get("like", [None])[0]
                  if "like" in batch else None}
        if spatial_fwd is not None:
            # VolumeToArray images are (D, H, W, 1) — add the batch axis
            logits = spatial_fwd(sp_state,
                                 jnp.asarray(sample["image"])[None])
            pred = np.asarray(jnp.argmax(logits[0], axis=-1),
                              dtype=np.int64)
        else:
            pred = sliding_window_predict(predict, sample, args.tile_size,
                                          args.overlap, is_vote=args.vote)
        line = {"name": name}
        if "segmentation" in batch:
            dice = np.asarray(_dice(jnp.asarray(pred),
                                    jnp.asarray(batch["segmentation"][0])))
            all_dice.append(dice)
            line["dice_avg"] = round(float(dice.mean()), 4)
            line["dice"] = [round(float(d), 4) for d in dice]
        if args.out_dir:
            out_path = os.path.join(args.out_dir, f"{name}_pred.nii.gz")
            # keep the source volume's spacing/affine on the prediction
            write_nifti(out_path, pred.astype(np.uint8),
                        like=sample.get("like"))
            line["saved"] = out_path
        print(json.dumps(line))

    if all_dice:
        mean = np.stack(all_dice).mean(axis=0)
        print(json.dumps({"mean_dice_avg": round(float(mean.mean()), 4),
                          "mean_dice_per_class":
                          [round(float(d), 4) for d in mean]}))


if __name__ == "__main__":
    main()
