#!/usr/bin/env python
"""Train a pairwise deformable registration network (MindBoggle101 recipe).

The driver the reference README lists as TODO (README.md:15-19), assembled
from its building blocks: VoxelMorph-CVPR2018 + spatial transformer
(voxel_morph.py), LNCC similarity (loss.py:589-617) and bending-energy
regularization (loss.py:674-730) over the pairwise MB101 reg dataset
(datasets.py:362-390).  Flag surface mirrors train_seg.py.
"""
import argparse
import os

from deepatlas_tpu.utils.platform import honor_platform_env
honor_platform_env()
from deepatlas_tpu.train import RegistrationExperiment


def build_config(args) -> dict:
    n_classes = 32
    config = dict(
        debug_mode=args.debug,
        resume_dir="",
        random_seed=230,
        data="MindBoggle",
        n_epochs=args.num_epochs,
        samples_per_epoch=args.num_samples * 2,
        batch_size=args.batch_size,
        print_batch_period=50,
        valid_epoch_period=1,
        save_ckpts_epoch_period=1,

        model="voxel_morph_cvpr",
        model_settings={"use_pallas_warp": not args.no_pallas_warp,
                        "max_disp": args.max_disp, "dtype": "bfloat16",
                        "packed": not args.no_packed},
        n_classes=n_classes,
        data_parallel=args.data_parallel,
        spatial_shards=args.spatial_shards,

        crop_size=[0, 10, 7, 14, 8, 7],

        loss="lncc",
        loss_settings={"filter_size": 9},
        reg_loss="bendingEnergy",
        reg_loss_settings={},
        reg_weight=args.reg_weight,
        max_validation_pairs=args.max_validation_pairs,

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
        raise ValueError("num-samples has to be 21 or 65 for mindboggle "
                         "data but got {}".format(config["num_samples"]))

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
    parser.add_argument("--device", "-g", default="0", type=str)
    parser.add_argument("--debug", "-d", action="store_true")
    parser.add_argument("--preload", "-load", action="store_true")
    parser.add_argument("--num-samples", "-ns", default=21, type=int)
    parser.add_argument("--num-epochs", "-ne", default=100, type=int)
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--reg-weight", default=1.0, type=float,
                        help="weight of the smoothness regularizer")
    parser.add_argument("--no-pallas-warp", action="store_true",
                        help="use the XLA spatial transformer instead of "
                             "the Pallas kernel")
    parser.add_argument("--max-disp", default=8, type=int,
                        help="Pallas warp displacement bound (voxels)")
    parser.add_argument("--max-validation-pairs", default=20, type=int,
                        help="cap on validation pairs per epoch (the pair "
                             "space is N*(N-1))")
    parser.add_argument("--test_only", "-t", action="store_true")
    parser.add_argument("--spatial-shards", type=int, default=0,
                        help="depth-shard whole volumes over this many "
                             "devices (parallel/spatial.py; needs the XLA "
                             "trunk: --no-pallas-warp, packed=False)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the batch over all visible devices")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--no-packed", action="store_true",
                        help="disable the packed Pallas conv path")
    parser.add_argument("--data-root", "-root", default="./data", type=str)
    parser.add_argument("--log-root", "-log", default="./logs", type=str)
    args = parser.parse_args()

    config = build_config(args)
    exp = RegistrationExperiment(config)
    if not args.test_only:
        exp.train()
    exp.test()


if __name__ == "__main__":
    main()
