#!/usr/bin/env python
"""Train a 3D U-Net for segmentation (MindBoggle101 recipe).

CLI parity with the reference driver (train_seg.py:10-97): same flags and
config keys, minus its argparse bugs (the em-dash ``--num—epochs`` flag at
train_seg.py:20 is spelled ``--num-epochs``; the broken positional defaults
at train_seg.py:26-28 are proper ``default=`` kwargs; the undefined
``args.leaf`` guard at train_seg.py:86 is dropped — device selection is
JAX-native).
"""
import argparse
import os

from deepatlas_tpu.utils.platform import honor_platform_env
honor_platform_env()
from deepatlas_tpu.train import SegmentationExperiment


def build_config(args) -> dict:
    n_classes = 32
    config = dict(
        debug_mode=args.debug,
        resume_dir="",
        random_seed=230,
        data="MindBoggle",
        n_epochs=args.num_epochs,
        samples_per_epoch=args.num_samples * 2,  # flipped-data augmentation
        batch_size=1,
        valid_batch_size=1,
        print_batch_period=50,
        valid_epoch_period=1,
        save_ckpts_epoch_period=1,

        model="UNet_light",
        # packed: lane-packed Pallas conv path (pallas/conv3d.py) — 4x
        # faster and 2.5x less HBM than XLA convs at this volume size
        model_settings={"in_channel": 1, "n_classes": n_classes,
                        "bias": True, "BN": True, "dtype": "bfloat16",
                        "packed": not args.no_packed},
        n_classes=n_classes,
        class_name={k: str(k) for k in range(1, n_classes)},

        crop_size=[0, 10, 7, 14, 8, 7],

        loss="dice",
        loss_settings={"n_class": n_classes, "weight_type": "Uniform",
                       "no_bg": False, "softmax": True, "eps": 1e-6},

        learning_rate=args.lr,
        lr_mode="multiStep",
        milestones=[0.5, 1],
        gamma=0.2,
    )
    config.update(vars(args))

    train_set = ("MMRR-21", "HLN-12", "NKI-TRT-12", "OASIS-TRT-20")
    test_set = "NKI-RS-21"

    if config["num_samples"] == 21:
        train_lists = [f + "-flip" for f in train_set[0:1]]
    elif config["num_samples"] == 65:
        train_lists = [f + "-flip" for f in train_set]
    else:
        raise ValueError("n_seg has to be 21 or 65 for mindboggle data but "
                         "got {}".format(config["num_samples"]))

    config["data_dir"] = os.path.join(args.data_root, "mindboggle")
    config["valid_data_dir"] = os.path.join(args.data_root, "mindboggle")
    config["training_list_file"] = tuple(
        os.path.join(args.data_root, "mindboggle/{}.txt".format(f))
        for f in train_lists)
    config["validation_list_file"] = os.path.join(
        args.data_root, "mindboggle/{}-valid.txt".format(test_set))
    config["testing_list_file"] = os.path.join(
        args.data_root, "mindboggle/NKI-RS-21-train.txt")
    config["log_dir"] = "./{}/{}".format(args.log_root, config["data"])
    return config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--device", "-g", default="0", type=str,
                        help="index of used accelerator")
    parser.add_argument("--debug", "-d", action="store_true",
                        help="if debug mode")
    parser.add_argument("--preload", "-load", action="store_true",
                        help="if preload data into memory to speed up IO")
    parser.add_argument("--num-samples", "-ns", default=21, type=int,
                        help="number of samples for training")
    parser.add_argument("--num-epochs", "-ne", default=100, type=int,
                        help="number of training epochs")
    parser.add_argument("--lr", default=1e-3, type=float,
                        help="learning rate")
    parser.add_argument("--test_only", "-t", action="store_true",
                        help="only test model")
    parser.add_argument("--no-packed", action="store_true",
                        help="disable the packed Pallas conv path")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the batch over all devices "
                             "(parallel/dp.py; batch_size must divide)")
    parser.add_argument("--spatial-shards", type=int, default=0,
                        help="depth-shard whole volumes over this many "
                             "devices (parallel/spatial.py; composes with "
                             "the packed Pallas conv path)")
    parser.add_argument("--data-root", "-root", default="./data", type=str,
                        help="root of the data folder")
    parser.add_argument("--log-root", "-log", default="./logs", type=str,
                        help="root of the log folders that saves "
                             "logs/checkpoints")
    args = parser.parse_args()

    config = build_config(args)
    exp = SegmentationExperiment(config)
    if not args.test_only:
        exp.train()
    exp.test()


if __name__ == "__main__":
    main()
