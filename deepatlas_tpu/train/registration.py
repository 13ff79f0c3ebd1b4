"""Registration experiment: pairwise deformable registration training.

The capability the reference README promises as ``train_reg.py`` (TODO at
README.md:15-19) assembled from its building blocks: pairwise reg datasets
(datasets.py:331-451), VoxelMorph + spatial transformer (voxel_morph.py),
LNCC similarity + bending-energy/gradient regularization (loss.py:589-730).
Validation warps the moving labels with the predicted field and reports
on-device mean foreground dice plus Jacobian folding fraction.
"""
from __future__ import annotations

import datetime
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (Compose, CropVolume, DataLoader, VolumeToArray, endless,
                    get_reg_dataset)
from ..losses import get_loss_function
from ..models import get_network
from ..utils import visualize
from .base import BaseExperiment
from .checkpoint import initialize_from, save_checkpoint
from .reg_steps import make_reg_eval_step, make_reg_train_step
from .schedules import make_scheduler
from .steps import TrainState, make_optimizer, set_learning_rate


class RegistrationExperiment(BaseExperiment):
    def __init__(self, config):
        super().__init__(config)
        if self.config.get("debug_mode"):
            print("Debug mode")
            self.config["print_batch_period"] = 2
            self.config["valid_epoch_period"] = 2

        self.exp_name = "Reg_{}_{}_{}epochs_{}_{}_w{}_lr_{}{}".format(
            self.config["model"],
            os.path.basename(self.config["data_dir"]),
            self.config["n_epochs"],
            self.config["loss"],
            self.config.get("reg_loss", "bendingEnergy"),
            self.config.get("reg_weight", 1.0),
            self.config["learning_rate"],
            "_scheduler_{}".format(self.config["lr_mode"])
            if self.config.get("lr_mode", "const") != "const" else "")

        self.ckpoint_dir = os.path.join(
            self.config["log_dir"],
            self.exp_name if not self.config.get("debug_mode") else "debug_reg",
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
        if self.config.get("crop_size"):
            transforms.append(CropVolume(self.config["crop_size"]))
        return Compose(transforms)

    def setup_train_data(self):
        print("Initializing dataloader")
        dataset_cls = get_reg_dataset(self.config["data"])
        tf = self._transforms()
        training_data = dataset_cls(
            self.config["training_list_file"], self.config["data_dir"],
            with_seg=True, preload=self.config.get("preload", False),
            pre_transform=tf, n_samples=self.config.get("num_samples"))
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
            validation_data, batch_size=1, shuffle=False, prefetch=2)

    def setup_model(self):
        model_type = get_network(self.config["model"])
        from ..models import resolve_model_settings
        self.model = model_type(
            **resolve_model_settings(self.config.get("model_settings", {})))

    def setup_loss(self):
        self.sim_loss = get_loss_function(self.config["loss"])(
            **self.config.get("loss_settings", {}))
        self.reg_loss = get_loss_function(
            self.config.get("reg_loss", "bendingEnergy"))(
            **self.config.get("reg_loss_settings", {}))

    def setup_optimizer(self):
        self.tx = make_optimizer(self.config["learning_rate"])
        self.scheduler = make_scheduler(
            self.config.get("lr_mode", "const"),
            self.config["learning_rate"], self.config["n_epochs"],
            self.config.get("milestones"), self.config.get("gamma", 0.2),
            self.config.get("valid_epoch_period", 1))

    def _init_state(self):
        batch_m, batch_f = next(iter(self.validation_data_loader))
        moving = jnp.asarray(batch_m["image"][:1])
        fixed = jnp.asarray(batch_f["image"][:1])
        variables = self.model.init(jax.random.fold_in(self.root_key, 0),
                                    moving, fixed)
        self.state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=self.tx)
        ms = self.config.get("model_settings", {})
        self.mesh = None
        sp = int(self.config.get("spatial_shards") or 0)
        if sp > 1:
            # whole-volume depth sharding (parallel/spatial.py): stride-2
            # halo convs + halo'ed spatial-transformer warp; requires the
            # XLA trunk and the axis_name-capable losses (LNCC +
            # bendingEnergy).  Validation stays single-device (whole-volume
            # metrics on one chip; use the library API for sharded eval).
            import numpy as _np
            from jax.sharding import Mesh as _Mesh

            from ..parallel import make_spatial_reg_step
            if jax.device_count() < sp:
                raise ValueError(f"spatial_shards={sp} needs {sp} devices, "
                                 f"have {jax.device_count()}")
            if ms.get("packed") or ms.get("use_pallas_warp"):
                raise ValueError(
                    "spatial_shards requires the XLA trunk and warp — set "
                    "model_settings packed=False, use_pallas_warp=False")
            if self.config["loss"] != "lncc" or self.config.get(
                    "reg_loss", "bendingEnergy") != "bendingEnergy":
                raise ValueError(
                    "spatial_shards supports the lncc + bendingEnergy "
                    "losses (the axis_name-capable pair, losses/)")
            if self.config.get("data_parallel"):
                raise ValueError(
                    "spatial_shards and data_parallel are exclusive in the "
                    "experiment config")
            self.mesh = _Mesh(_np.asarray(jax.devices()[:sp]), ("space",))
            self.train_step = make_spatial_reg_step(
                self.model, get_loss_function(self.config["loss"]),
                get_loss_function(self.config.get("reg_loss",
                                                  "bendingEnergy")),
                self.config.get("reg_weight", 1.0), self.mesh,
                sim_kwargs=self.config.get("loss_settings", {}),
                reg_kwargs=self.config.get("reg_loss_settings", {}))
        elif self.config.get("data_parallel") and jax.device_count() > 1:
            from ..parallel import (make_dp_reg_train_step, make_mesh,
                                    replicate)
            if self.config["batch_size"] % jax.device_count():
                raise ValueError(
                    f"data_parallel needs batch_size divisible by "
                    f"{jax.device_count()} devices, got "
                    f"{self.config['batch_size']}")
            self.mesh = make_mesh()
            self.state = replicate(self.state, self.mesh)
            self.train_step = make_dp_reg_train_step(
                self.sim_loss, self.reg_loss,
                self.config.get("reg_weight", 1.0), self.mesh)
        else:
            self.train_step = make_reg_train_step(
                self.sim_loss, self.reg_loss,
                self.config.get("reg_weight", 1.0),
                # surface the Pallas warp's saturation as a step metric
                max_disp=(ms.get("max_disp", 8)
                          if ms.get("use_pallas_warp") else None))
        self.eval_step = make_reg_eval_step(self.config["n_classes"])

    def _maybe_resume(self):
        resume_dir = self.config.get("resume_dir")
        if resume_dir:
            template = {"epoch": 0, "reg_best_score": 0.0,
                        "params": self.state.params,
                        "opt_state": self.state.opt_state,
                        "scheduler": self.scheduler.state_dict()}
            try:
                restored, finished_epoch, best = initialize_from(resume_dir,
                                                                 template)
            except Exception:
                template.pop("scheduler")
                restored, finished_epoch, best = initialize_from(resume_dir,
                                                                 template)
            self.state = self.state.replace(params=restored["params"],
                                            opt_state=restored["opt_state"])
            from .schedules import scheduler_from_restored
            scheduler_from_restored(self.scheduler,
                                    restored.get("scheduler"))
            self.best_score = best
            self.current_epoch = finished_epoch + 1

    # ------------------------------------------------------------- train
    def train(self):
        self.setup_train()
        print("Training {}".format(self.exp_name))
        self._init_state()
        self._maybe_resume()
        self._train_iter = endless(self.training_data_loader)
        print("Start Training:")
        for _ in range(self.current_epoch, self.config["n_epochs"] + 1):
            self.train_one_epoch()
            if self.validate():
                # pending-best survives to the next periodic save when the
                # save/validation cadences are coprime (ADVICE r4; the
                # reference nests saves inside validation, lib/tools.py:349)
                self._pending_best = True
            # periodic save independent of the validation cadence (a run
            # that never validates must still leave a checkpoint)
            if self.current_epoch % self.config["save_ckpts_epoch_period"] \
                    == 0:
                save_checkpoint({"epoch": self.current_epoch,
                                 "params": self.state.params,
                                 "opt_state": self.state.opt_state,
                                 "reg_best_score": self.best_score,
                                 "scheduler": self.scheduler.state_dict()},
                                getattr(self, "_pending_best", False),
                                self.ckpoint_dir)
                self._pending_best = False
            self.current_epoch += 1
        self.close()
        print("Finished Training: {}".format(self.exp_name))

    def train_one_epoch(self):
        running = {"loss": 0.0, "sim": 0.0, "reg": 0.0}
        period = self.config["print_batch_period"]
        iters = (self.config["samples_per_epoch"]
                 // self.config["batch_size"])
        for i in range(iters):
            batch_m, batch_f = next(self._train_iter)
            moving = jnp.asarray(batch_m["image"])
            fixed = jnp.asarray(batch_f["image"])
            if self.mesh is not None:
                if "space" in self.mesh.shape:
                    from ..parallel import shard_volume_batch
                    moving, fixed = shard_volume_batch((moving, fixed),
                                                       self.mesh)
                else:
                    from ..parallel import shard_batch
                    moving, fixed = shard_batch((moving, fixed), self.mesh)
            self.state, metrics = self.train_step(self.state, moving, fixed)
            self.global_step = ((self.current_epoch - 1) * iters + i + 1) \
                * self.config["batch_size"]
            for k in running:
                running[k] += float(metrics[k])
            if i % period == period - 1:
                n = period if i > 0 else 1
                print("Epoch[{}/{}] iter {} loss {:.4f} sim {:.4f} reg "
                      "{:.4f} lr {} {}".format(
                          self.current_epoch, self.config["n_epochs"], i + 1,
                          running["loss"] / n, running["sim"] / n,
                          running["reg"] / n, self.scheduler.lr,
                          datetime.datetime.now().strftime("%D %H:%M:%S")))
                self.writer.add_scalar("loss/training",
                                       running["loss"] / n, self.global_step)
                self.writer.add_scalar("loss/similarity",
                                       running["sim"] / n, self.global_step)
                self.writer.add_scalar("loss/regularization",
                                       running["reg"] / n, self.global_step)
                self.writer.add_scalar("learning_rate", self.scheduler.lr,
                                       self.global_step)
                running = {k: 0.0 for k in running}

    # -------------------------------------------------------------- eval
    def eval(self, dataloader, max_pairs: int = None):
        n_fg = self.config["n_classes"] - 1
        dice_sum = np.zeros((n_fg,), np.float64)
        folding_sum = 0.0
        count = 0
        vis_sample = None
        for batch_m, batch_f in dataloader:
            moving = jnp.asarray(batch_m["image"])
            fixed = jnp.asarray(batch_f["image"])
            mseg = jnp.asarray(batch_m["segmentation"].astype(np.int32))
            fseg = jnp.asarray(batch_f["segmentation"].astype(np.int32))
            dice, folding, warped = self.eval_step(self.state, moving, fixed,
                                                   mseg, fseg)
            dice_sum += np.asarray(dice, np.float64).sum(axis=0)
            folding_sum += float(folding)
            count += dice.shape[0]
            vis_sample = (batch_m, batch_f, np.asarray(warped))
            if max_pairs and count >= max_pairs:
                break
        dice_per_class = dice_sum / max(count, 1)
        return (dice_per_class, float(dice_per_class.mean()),
                folding_sum / max(count, 1), vis_sample)

    def validate(self):
        if self.current_epoch % self.config["valid_epoch_period"]:
            return
        start = time.time()
        dice_per_class, dice_avg, folding, _ = self.eval(
            self.validation_data_loader,
            max_pairs=self.config.get("max_validation_pairs"))
        new_lr = self.scheduler.step(
            dice_avg if self.config.get("lr_mode") == "plateau" else None)
        self.state = set_learning_rate(self.state, new_lr)

        is_best = dice_avg > self.best_score
        if is_best:
            self.best_score = dice_avg
        data_name = self.config["data"]
        self.writer.add_scalar(f"validation_{data_name}/dice_avg", dice_avg,
                               self.global_step)
        self.writer.add_scalar(f"validation_{data_name}/folding_fraction",
                               folding, self.global_step)
        if self.config.get("image_summary", True):
            self._write_image_summaries()
        print("Validation: Dice Avg: {:.4f} folding {:.5f} ({:.3f} sec) {}"
              .format(dice_avg, folding, time.time() - start,
                      datetime.datetime.now().strftime("%D %H:%M:%S")))
        return is_best

    def _write_image_summaries(self):
        """TensorBoard image panels for the first validation pair: the
        reference's registration summary (3-plane source|warped|target,
        displacement magnitude, warped masks — lib/visualize.py:227-293)
        plus the deformation contour grid (lib/visualize.py:105-189)."""
        import numpy as np

        from ..ops import warp_labels
        from ..utils.visualize import (generate_deform_grid,
                                       make_registration_image_summary)

        batch_m, batch_f = next(iter(self.validation_data_loader))
        moving = jnp.asarray(batch_m["image"][:1])
        fixed = jnp.asarray(batch_f["image"][:1])
        mseg = jnp.asarray(batch_m["segmentation"][:1].astype(np.int32))
        fseg = jnp.asarray(batch_f["segmentation"][:1].astype(np.int32))
        if not hasattr(self, "_vis_fwd"):
            self._vis_fwd = jax.jit(
                lambda state, m, f: state.apply_fn(
                    {"params": state.params}, m, f, train=False))
        disp, warped, deform = self._vis_fwd(self.state, moving, fixed)
        warped_seg = warp_labels(mseg, deform)
        grids = make_registration_image_summary(
            np.asarray(moving), np.asarray(fixed),
            np.asarray(warped, np.float32), np.asarray(disp, np.float32),
            np.asarray(deform, np.float32), np.asarray(mseg),
            np.asarray(fseg), np.asarray(warped_seg))
        for name, img in grids.items():
            self.writer.add_image(f"validation/{name}", img,
                                  self.global_step)
        mid = deform.shape[1] // 2
        grid_img = generate_deform_grid(
            np.asarray(deform, np.float32)[0, mid, :, :, 0:2],
            np.clip(np.asarray(warped, np.float32)[0, mid, :, :, 0], 0, 1))
        self.writer.add_image("validation/deform_grid", grid_img,
                              self.global_step)

    # -------------------------------------------------------------- test
    def test(self, best: bool = True, if_log: bool = True):
        self.setup_random_seed()
        self.setup_model()
        self.setup_loss()
        self.setup_optimizer()
        dataset_cls = get_reg_dataset(self.config["data"])
        testing_data = dataset_cls(
            self.config["testing_list_file"], self.config["data_dir"],
            with_seg=True, preload=False, pre_transform=self._transforms())
        self.validation_data_loader = DataLoader(testing_data, batch_size=1,
                                                 shuffle=False, prefetch=2)
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
        template = {"epoch": 0, "reg_best_score": 0.0,
                    "params": self.state.params,
                    "opt_state": self.state.opt_state}
        restored, last_epoch, _ = initialize_from(ckpoint_file, template)
        self.state = self.state.replace(params=restored["params"])
        dice_per_class, dice_avg, folding, _ = self.eval(
            self.validation_data_loader,
            max_pairs=self.config.get("max_validation_pairs"))
        if if_log:
            from .base import test_logger
            with test_logger(os.path.join(self.ckpoint_dir,
                                          "test_log.txt")) as log:
                log.info("Testing Model: %s (%s epochs)", ckpoint_file,
                         last_epoch)
                log.info("Dice_avg: %s folding: %s", dice_avg, folding)
        return dice_per_class, dice_avg, folding
