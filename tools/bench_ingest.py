"""Ingest-overlap evidence: measure the seg pipeline's wait_fraction.

Runs the full-size MindBoggle seg recipe (train_seg.py defaults) for a few
epochs against a real NIfTI corpus and reports the DataLoader's ingest
accounting (data/loader.py wait_seconds/total_seconds): the fraction of
training wall-clock the chip spent blocked waiting for a batch.  Round-2
VERDICT weak #7 asked for a recorded artifact of this on the 1-core host.

  python tools/bench_ingest.py --data-root /tmp/mb_full [--preload]
  python tools/bench_ingest.py --out INGEST_r03.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/mb_full")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--preload", action="store_true",
                    help="preload the corpus to RAM (the reference's "
                         "--preload flag) — wait_fraction then measures "
                         "only collation/H2D")
    ap.add_argument("--prefetch", type=int, default=2)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--out", default=None,
                    help="also write the JSON result to this path")
    args = ap.parse_args()

    from deepatlas_tpu.train import SegmentationExperiment

    n_classes = 32
    root = os.path.join(args.data_root, "mindboggle")
    config = dict(
        debug_mode=False, resume_dir="", random_seed=230, data="MindBoggle",
        n_epochs=args.epochs, samples_per_epoch=42, batch_size=1,
        valid_batch_size=1, print_batch_period=10,
        valid_epoch_period=10 ** 6,          # skip validation: pure ingest
        save_ckpts_epoch_period=10 ** 6,
        model="UNet_light",
        model_settings={"in_channel": 1, "n_classes": n_classes,
                        "bias": True, "BN": True, "dtype": "bfloat16",
                        "packed": True},
        n_classes=n_classes,
        crop_size=[0, 10, 7, 14, 8, 7],
        loss="dice",
        loss_settings={"n_class": n_classes, "weight_type": "Uniform",
                       "no_bg": False, "softmax": True, "eps": 1e-6},
        learning_rate=1e-3, lr_mode="const",
        num_samples=21, preload=args.preload,
        prefetch=args.prefetch, num_workers=args.num_workers,
        data_dir=root, valid_data_dir=root,
        training_list_file=(os.path.join(root, "MMRR-21-flip.txt"),),
        validation_list_file=os.path.join(root, "NKI-RS-21-valid.txt"),
        testing_list_file=os.path.join(root, "NKI-RS-21-train.txt"),
        log_dir="./tmp/ingest_logs/MindBoggle",
    )
    exp = SegmentationExperiment(config)
    t0 = time.time()
    exp.train()
    wall = time.time() - t0
    loader = exp.training_data_loader
    steps = args.epochs * config["samples_per_epoch"]
    result = {
        "metric": "seg-pipeline ingest wait fraction (full-size MB101 "
                  "recipe, 1-core host)",
        "wait_fraction": round(loader.wait_fraction, 4),
        "wait_seconds": round(loader.wait_seconds, 2),
        "loader_total_seconds": round(loader.total_seconds, 2),
        "steps": steps,
        "wall_seconds": round(wall, 1),
        "preload": bool(args.preload),
        "num_workers": args.num_workers,
        "prefetch": args.prefetch,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
