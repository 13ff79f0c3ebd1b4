#!/usr/bin/env python
"""Joint DeepAtlas training: alternating semi-supervised seg + reg.

The headline driver the reference README lists as TODO (README.md:19),
implementing the MICCAI'19 DeepAtlas scheme with the reference's building
blocks: UNet_light segmentation, VoxelMorph registration, LNCC similarity,
bending-energy smoothness, and the anatomy (dice) loss coupling the two
networks — with only ``--n-labeled`` volumes keeping their ground-truth
segmentations.
"""
import argparse
import os

from deepatlas_tpu.utils.platform import honor_platform_env
honor_platform_env()
from deepatlas_tpu.train import DeepAtlasExperiment


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

        seg_model="UNet_light",
        # packed: the lane-packed Pallas conv path (pallas/conv3d.py) —
        # full-size 168x200x168 joint training fits one chip with it.
        # The SEG model stays packed under --spatial-shards (packed convs
        # halo-compose, models/packed.py); the reg trunk + warp fall back
        # to the halo'ed XLA path (parallel/spatial.py)
        seg_model_settings={"in_channel": 1, "n_classes": n_classes,
                            "bias": True, "BN": True,
                            "dtype": "bfloat16",
                            "packed": not args.no_packed},
        reg_model="voxel_morph_cvpr",
        reg_model_settings={"use_pallas_warp": not args.spatial_shards,
                            "max_disp": args.max_disp,
                            "dtype": "bfloat16",
                            "packed": not args.no_packed
                            and not args.spatial_shards},
        use_pallas_warp=not args.spatial_shards,
        max_disp=args.max_disp,
        fused_anatomy=not args.no_packed and not args.spatial_shards,
        n_classes=n_classes,
        n_labeled=args.n_labeled,
        data_parallel=args.data_parallel,
        spatial_shards=args.spatial_shards,

        crop_size=[0, 10, 7, 14, 8, 7],

        sim_loss="lncc",
        sim_loss_settings={"filter_size": 9},
        reg_loss="bendingEnergy",
        reg_loss_settings={},
        seg_loss="dice",
        seg_loss_settings={"n_class": n_classes, "weight_type": "Uniform",
                           "no_bg": False, "softmax": True, "eps": 1e-6},
        reg_weight=args.reg_weight,
        anatomy_weight=args.anatomy_weight,
        supervised_weight=args.supervised_weight,
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
    parser.add_argument("--n-labeled", "-nl", default=1, type=int,
                        help="number of training volumes that keep their "
                             "ground-truth labels (semi-supervision)")
    parser.add_argument("--lr", default=1e-3, type=float)
    parser.add_argument("--reg-weight", default=1.0, type=float)
    parser.add_argument("--anatomy-weight", default=3.0, type=float)
    parser.add_argument("--supervised-weight", default=1.0, type=float)
    parser.add_argument("--max-validation-pairs", default=20, type=int)
    parser.add_argument("--max-disp", type=int, default=8,
                        help="displacement bound (voxels) of the Pallas "
                             "spatial transformer; fields beyond it CLAMP "
                             "(saturate) and the reg step reports the "
                             "clipped fraction as disp_overflow. Raise for "
                             "large deformations (costs kernel time), or "
                             "use --no-packed + XLA warps for unbounded "
                             "fields")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the batch over all visible devices "
                             "(gradients pmean over ICI); batch-size must "
                             "divide by the device count")
    parser.add_argument("--spatial-shards", type=int, default=0,
                        help="depth-shard whole volumes over this many "
                             "devices (parallel/spatial.py soft-path joint "
                             "steps; the seg U-Net keeps the packed Pallas "
                             "convs, the reg trunk + warp use the halo'ed "
                             "XLA path)")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--no-packed", action="store_true",
                        help="disable the packed Pallas conv path (use XLA "
                             "convolutions; needs far more HBM at full size)")
    parser.add_argument("--test-only", "-test", action="store_true",
                        help="skip training: restore the best (or latest) "
                             "joint checkpoint and evaluate both nets on "
                             "the held-out testing_list_file")
    parser.add_argument("--data-root", "-root", default="./data", type=str)
    parser.add_argument("--log-root", "-log", default="./logs", type=str)
    args = parser.parse_args()

    config = build_config(args)
    exp = DeepAtlasExperiment(config)
    if not args.test_only:
        exp.train()
    exp.test()


if __name__ == "__main__":
    main()
