"""Segmentation experiment: the full seg train/val/test workload.

Capability parity with models/segmentation.py:18-274 — experiment naming and
checkpoint-dir layout, MultiStep/plateau LR scheduling, periodic validation
with per-class on-device dice, best-checkpoint tracking, TensorBoard scalars
under the reference's tag names, config snapshot, resume, and a logging
``test()``.  The hot loop is a single donated jitted step; volumes prefetch
host->device while the chip trains.
"""
from __future__ import annotations

import datetime
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (Compose, CropVolume, DataLoader, VolumeToArray, endless,
                    get_seg_dataset)
from ..losses import get_loss_function
from ..models import get_network
from ..utils import visualize
from ..utils.profiling import ThroughputMeter, annotate, trace
from .base import BaseExperiment
from .checkpoint import initialize_from, save_checkpoint
from .schedules import make_scheduler
from .steps import (TrainState, make_optimizer, make_seg_eval_step,
                    make_seg_train_step, set_learning_rate)


class SegmentationExperiment(BaseExperiment):
    def __init__(self, config):
        super().__init__(config)
        if self.config.get("debug_mode"):
            print("Debug mode")
            self.config["print_batch_period"] = 2
            self.config["valid_epoch_period"] = 2

        ms = self.config["model_settings"]
        self.exp_name = "Seg_{}{}{}_{}_{}samples_batch_{}_{}epochs_{}_{}_lr_{}{}".format(
            self.config["model"],
            "_bias" if ms.get("bias") else "",
            "_BN" if ms.get("BN") else "",
            os.path.basename(self.config["data_dir"]),
            self.config["num_samples"],
            self.config["batch_size"],
            self.config["n_epochs"],
            self.config["loss"],
            self.config["loss_settings"]["weight_type"],
            self.config["learning_rate"],
            "_scheduler_{}".format(self.config["lr_mode"])
            if self.config["lr_mode"] != "const" else "")

        self.ckpoint_dir = os.path.join(
            self.config["log_dir"],
            self.exp_name if not self.config.get("debug_mode") else "debug_seg",
            str(self.config["random_seed"]))
        print("Init experiment {} seed {}".format(
            self.exp_name, self.config["random_seed"]))
        self.best_score = 0.0
        self.current_epoch = 1
        self.global_step = 0

    # ------------------------------------------------------------- setup
    def setup_log(self):
        os.makedirs(self.ckpoint_dir, exist_ok=True)
        self.save_config_snapshot(self.ckpoint_dir)
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(self.ckpoint_dir)

    def _transforms(self):
        transforms = [VolumeToArray()]
        if self.config.get("flip_left"):
            from ..data import LeftToRight
            transforms.append(LeftToRight())
        if self.config.get("crop_size"):
            transforms.append(CropVolume(self.config["crop_size"]))
        return Compose(transforms)

    def _patch_sampler(self):
        """OAI patch training (BASELINE.json config 4): a running transform
        drawing random / class-balanced ROI crops (transforms.py:322-494)."""
        patch = self.config.get("patch_size")
        if not patch:
            return None
        from ..data import BalancedRandomCrop, RandomCrop
        rng = np.random.RandomState(self.config["random_seed"])
        if self.config.get("sampler", "random") == "balanced":
            return BalancedRandomCrop(
                patch, threshold=self.config.get("patch_threshold", 0.01),
                n_classes=self.config["n_classes"], random_state=rng)
        return RandomCrop(patch,
                          threshold=self.config.get("patch_threshold", 0.0),
                          random_state=rng)

    def setup_train_data(self):
        print("Initializing dataloader")
        dataset_cls = get_seg_dataset(self.config["data"])
        tf = self._transforms()
        training_data = dataset_cls(
            self.config["training_list_file"], self.config["data_dir"],
            with_seg=True, preload=self.config.get("preload", False),
            pre_transform=tf, running_transform=self._patch_sampler(),
            n_samples=self.config["num_samples"] * 2)
        self.training_data_loader = DataLoader(
            training_data, batch_size=self.config["batch_size"], shuffle=True,
            seed=self.config["random_seed"],
            prefetch=self.config.get("prefetch", 2),
            num_workers=self.config.get("num_workers"))
        validation_data = dataset_cls(
            self.config["validation_list_file"],
            self.config.get("valid_data_dir", self.config["data_dir"]),
            with_seg=True, preload=self.config.get("preload", False),
            pre_transform=tf)
        self.validation_data_loader = DataLoader(
            validation_data, batch_size=self.config.get("valid_batch_size", 1),
            shuffle=False, prefetch=2)

    def setup_model(self):
        model_type = get_network(self.config["model"])
        from ..models import resolve_model_settings
        self.model = model_type(
            **resolve_model_settings(self.config["model_settings"]))

    def setup_loss(self):
        self.criterion = get_loss_function(self.config["loss"])(
            **self.config["loss_settings"])

    def setup_optimizer(self):
        self.tx = make_optimizer(self.config["learning_rate"])
        self.scheduler = make_scheduler(
            self.config.get("lr_mode", "const"),
            self.config["learning_rate"], self.config["n_epochs"],
            self.config.get("milestones"), self.config.get("gamma", 0.2),
            self.config.get("valid_epoch_period", 1))

    def _example_input(self):
        batch = next(iter(self.validation_data_loader))
        return jnp.asarray(batch["image"][:1])

    def _init_state(self):
        example = self._example_input()
        variables = self.model.init(
            jax.random.fold_in(self.root_key, 0), example, train=False)
        self.state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=self.tx)
        sp = int(self.config.get("spatial_shards") or 0)
        if sp > 1:
            # whole-volume depth sharding (parallel/spatial.py): the D axis
            # splits over `spatial_shards` devices with halo-exchanged
            # convs — the scaling path for volumes past one chip's HBM
            # (the reference's only lever is crop/patch,
            # lib/transforms.py:124-158).  Exclusive with data_parallel
            # here; DP x SP composition is available via the library API
            # (make_spatial_seg_step(data_axis=...)).
            import numpy as _np
            from jax.sharding import Mesh as _Mesh

            from ..parallel import (make_spatial_seg_eval_step,
                                    make_spatial_seg_step)
            if jax.device_count() < sp:
                raise ValueError(f"spatial_shards={sp} needs {sp} devices, "
                                 f"have {jax.device_count()}")
            if self.config.get("data_parallel"):
                raise ValueError(
                    "spatial_shards and data_parallel are exclusive in the "
                    "experiment config; use the parallel/ API for a 2-D "
                    "(data, space) mesh")
            if self.config["loss"] != "dice":
                raise ValueError(
                    "spatial_shards currently supports the dice criterion "
                    "(the only seg loss with axis_name shard reductions, "
                    "losses/dice.py); got " + repr(self.config["loss"]))
            self.mesh = _Mesh(_np.asarray(jax.devices()[:sp]), ("space",))
            ls = dict(self.config["loss_settings"])
            ls.pop("n_class", None)
            self.train_step = make_spatial_seg_step(
                self.model, get_loss_function(self.config["loss"]),
                n_class=self.config["n_classes"], mesh=self.mesh,
                criterion_kwargs=ls)
            self.eval_step = make_spatial_seg_eval_step(
                self.model, self.config["n_classes"], self.mesh)
        elif self.config.get("data_parallel") and jax.device_count() > 1:
            # BASELINE.json config 5: batch sharded over the mesh's data
            # axis, gradients pmean'd over ICI, params replicated
            from ..parallel import (make_dp_seg_eval_step,
                                    make_dp_seg_train_step, make_mesh,
                                    replicate)
            if self.config["batch_size"] % jax.device_count():
                raise ValueError(
                    f"data_parallel needs batch_size divisible by "
                    f"{jax.device_count()} devices, got "
                    f"{self.config['batch_size']}")
            self.mesh = make_mesh()
            self.state = replicate(self.state, self.mesh)
            self.train_step = make_dp_seg_train_step(self.criterion,
                                                     self.mesh)
            if self.config.get("valid_batch_size", 1) % jax.device_count():
                # ragged eval batches stay on the auto-partitioned jit path
                self.eval_step = make_seg_eval_step(self.config["n_classes"])
            else:
                self.eval_step = make_dp_seg_eval_step(
                    self.config["n_classes"], self.mesh)
        else:
            self.mesh = None
            self.train_step = make_seg_train_step(self.criterion)
            self.eval_step = make_seg_eval_step(self.config["n_classes"])
        # device-side random augmentation (B-spline / rigid / blur),
        # config-driven like the reference's per-experiment Compose
        # (models/segmentation.py:63-64)
        from ..data.augment import make_augmenter
        self.augmenter = make_augmenter(self.config.get("augmentation"))

    def _maybe_resume(self):
        resume_dir = self.config.get("resume_dir")
        if resume_dir:
            template = {"epoch": 0, "best_score": 0.0,
                        "params": self.state.params,
                        "batch_stats": self.state.batch_stats,
                        "opt_state": self.state.opt_state,
                        "scheduler": self.scheduler.state_dict()}
            try:
                restored, finished_epoch, best = initialize_from(resume_dir,
                                                                 template)
            except Exception:
                # older checkpoints carry no scheduler state
                template.pop("scheduler")
                restored, finished_epoch, best = initialize_from(resume_dir,
                                                                 template)
            self.state = self.state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"])
            from .schedules import scheduler_from_restored
            scheduler_from_restored(self.scheduler,
                                    restored.get("scheduler"))
            self.best_score = best
            self.current_epoch = finished_epoch + 1
            print("=> resumed from '{}' (epoch {})".format(resume_dir,
                                                           finished_epoch))

    # ------------------------------------------------------------- train
    def train(self):
        self.setup_train()
        print("Training {}".format(self.exp_name))
        self._init_state()
        self._maybe_resume()
        self._train_iter = endless(self.training_data_loader)

        print(self.config["samples_per_epoch"], self.config["batch_size"])
        print("Start Training:")
        profile_dir = self.config.get("profile_dir")
        for _ in range(self.current_epoch, self.config["n_epochs"] + 1):
            if profile_dir and self.current_epoch == 2:
                # trace the second epoch (first is compile-dominated)
                with trace(profile_dir):
                    self.train_one_epoch()
            else:
                self.train_one_epoch()
            if self.validate():
                # pending until persisted: the save cadence is decoupled
                # from the validation cadence (unlike the reference, which
                # nests the save inside the validation block,
                # lib/tools.py:349), so a best found at a validation epoch
                # must survive to the next periodic save even when the two
                # periods are coprime (ADVICE r4)
                self._pending_best = True
            # the periodic save is NOT gated on the validation cadence:
            # a run whose epochs never hit valid_epoch_period must still
            # leave a checkpoint for test()/resume
            if self.current_epoch % self.config["save_ckpts_epoch_period"] \
                    == 0:
                save_checkpoint({"epoch": self.current_epoch,
                                 "params": self.state.params,
                                 "batch_stats": self.state.batch_stats,
                                 "opt_state": self.state.opt_state,
                                 "best_score": self.best_score,
                                 "scheduler": self.scheduler.state_dict()},
                                getattr(self, "_pending_best", False),
                                self.ckpoint_dir)
                self._pending_best = False
            self.current_epoch += 1
        self.close()
        print("Finished Training: {}".format(self.exp_name))

    def train_one_epoch(self):
        running_loss = 0.0
        period = self.config["print_batch_period"]
        iters_per_epoch = (self.config["samples_per_epoch"]
                           // self.config["batch_size"])
        start = time.time()
        batch = None
        meter = ThroughputMeter(n_chips=jax.device_count())
        meter.start()
        for i in range(iters_per_epoch):
            batch = next(self._train_iter)
            images = jnp.asarray(batch["image"])
            labels = jnp.asarray(batch["segmentation"].astype(np.int32))
            if self.augmenter is not None:
                akey = jax.random.fold_in(self.root_key,
                                          2 ** 20 + self.global_step)
                images, labels = self.augmenter(akey, images, labels)
            with annotate("seg_train_step"):
                self.state, loss, logits = self.train_step(self.state,
                                                           images, labels)
            self.global_step = ((self.current_epoch - 1) * iters_per_epoch
                                + (i + 1) * self.config["batch_size"])
            running_loss += float(loss)
            meter.step(volumes=self.config["batch_size"])
            if i % period == period - 1:
                avg = running_loss / period if i > 0 else running_loss
                print("Epoch[{}/{}] iter {} loss: {:.3f} lr:{} "
                      "{:.3f} vol/s/chip {}".format(
                          self.current_epoch, self.config["n_epochs"], i + 1,
                          avg, self.scheduler.lr,
                          meter.volumes_per_sec_per_chip,
                          datetime.datetime.now().strftime("%D %H:%M:%S")))
                self.writer.add_scalar("loss/training", avg,
                                       global_step=self.global_step)
                self.writer.add_scalar("learning_rate", self.scheduler.lr,
                                       global_step=self.global_step)
                self.writer.add_scalar(
                    "throughput/ingest_wait_fraction",
                    self.training_data_loader.wait_fraction,
                    global_step=self.global_step)
                self.writer.add_scalar("throughput/volumes_per_sec_per_chip",
                                       meter.volumes_per_sec_per_chip,
                                       global_step=self.global_step)
                running_loss = 0.0

        if (batch is not None and self.current_epoch
                % self.config["save_ckpts_epoch_period"] == 0):
            summary = visualize.make_segmentation_image_summary(
                batch["image"], batch["segmentation"], np.asarray(logits))
            self.writer.add_image("training", summary,
                                  global_step=self.global_step)
        del start

    # -------------------------------------------------------------- eval
    def eval(self, dataloader):
        n_fg = self.config["n_classes"] - 1
        dice_sum = np.zeros((n_fg,), np.float64)
        count = 0
        sample_for_vis = None
        for batch in dataloader:
            images = jnp.asarray(batch["image"])
            labels = jnp.asarray(batch["segmentation"].astype(np.int32))
            dice, logits = self.eval_step(self.state, images, labels)
            dice_sum += np.asarray(dice, np.float64).sum(axis=0)
            count += dice.shape[0]
            sample_for_vis = {"img": batch["image"],
                              "truth": batch["segmentation"],
                              "pred": np.asarray(logits)}
        dice_per_class = dice_sum / max(count, 1)
        return dice_per_class, float(dice_per_class.mean()), sample_for_vis

    def validate(self):
        if self.current_epoch % self.config["valid_epoch_period"]:
            return
        start = time.time()
        dice_per_class, dice_avg, samples = self.eval(
            self.validation_data_loader)
        new_lr = self.scheduler.step(
            dice_avg if self.config["lr_mode"] == "plateau" else None)
        self.state = set_learning_rate(self.state, new_lr)

        is_best = dice_avg > self.best_score
        if is_best:
            self.best_score = dice_avg

        data_name = self.config["data"]
        self.writer.add_scalar(f"validation_{data_name}/dice_avg", dice_avg,
                               global_step=self.global_step)
        class_name = self.config.get("class_name", {})
        for c in range(self.config["n_classes"] - 1):
            self.writer.add_scalar(
                "validation_{}/dice_{}".format(
                    data_name, class_name.get(c + 1, str(c + 1))),
                dice_per_class[c], global_step=self.global_step)
        if samples is not None:
            summary = visualize.make_segmentation_image_summary(
                samples["img"], samples["truth"], samples["pred"])
            self.writer.add_image("validation", summary,
                                  global_step=self.global_step)

        print("Validation: Dice Avg: {:.4f} ({:.3f} sec) {}".format(
            dice_avg, time.time() - start,
            datetime.datetime.now().strftime("%D %H:%M:%S")))

        return is_best

    # -------------------------------------------------------------- test
    def setup_test_data(self):
        dataset_cls = get_seg_dataset(self.config["data"])
        testing_data = dataset_cls(
            self.config["testing_list_file"], self.config["data_dir"],
            with_seg=True, preload=False, pre_transform=self._transforms())
        self.testing_data_loader = DataLoader(testing_data, batch_size=1,
                                              shuffle=False, prefetch=2)

    def test(self, best: bool = True, if_log: bool = True):
        self.setup_random_seed()
        self.setup_model()
        self.setup_loss()
        self.setup_optimizer()
        self.setup_test_data()
        self.validation_data_loader = self.testing_data_loader
        self._init_state()

        ckpoint_file = os.path.join(
            self.ckpoint_dir, "model_best" if best else "checkpoint")
        if best and not os.path.isdir(ckpoint_file):
            # no validation ever beat the initial best score (e.g. very
            # short runs) — fall back to the periodic checkpoint instead of
            # crashing (the reference crashes on the missing .pth.tar)
            print("=> no best checkpoint yet; testing the latest periodic "
                  "checkpoint instead")
            ckpoint_file = os.path.join(self.ckpoint_dir, "checkpoint")
        template = {"epoch": 0, "best_score": 0.0,
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                    "opt_state": self.state.opt_state}
        restored, last_epoch, _ = initialize_from(ckpoint_file, template)
        self.state = self.state.replace(params=restored["params"],
                                        batch_stats=restored["batch_stats"])

        dice_per_class, dice_avg, _ = self.eval(self.testing_data_loader)
        if if_log:
            from .base import test_logger
            with test_logger(os.path.join(self.ckpoint_dir,
                                          "test_log.txt")) as log:
                log.info("\n" + "=" * 50 + "\n")
                log.info("Testing Model: %s (%s epochs)\n", ckpoint_file,
                         last_epoch)
                log.info("Test data: %s\n", self.config["data_dir"])
                log.info("Test list: %s\n",
                         self.config["testing_list_file"])
                log.info("\n" + "-" * 50 + "\n")
                log.info("Dice_avg: %s", dice_avg)
                class_name = self.config.get("class_name", {})
                for c in range(self.config["n_classes"] - 1):
                    log.info("Dice_%s:%.3f",
                             class_name.get(c + 1, str(c + 1)),
                             dice_per_class[c])
                log.info("\n" + "-" * 50 + "\n")
        return dice_per_class, dice_avg
