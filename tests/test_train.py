"""Integration tests: tiny synthetic dataset -> few train steps -> loss
decreases; checkpoint round-trips; schedulers follow reference semantics
(SURVEY.md §4c)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.data import NiftiImage, write_nifti
from deepatlas_tpu.train import (MultiStepLR, ReduceLROnPlateau,
                                 SegmentationExperiment, initialize_from,
                                 save_checkpoint)
from deepatlas_tpu.train.schedules import make_scheduler


def make_mindboggle_corpus(root, n=4, shape=(12, 14, 12), n_classes=3):
    """Synthetic MindBoggle-layout corpus: blobby foreground labels whose
    intensity correlates with the label (learnable in a few steps)."""
    rng = np.random.RandomState(7)
    img_dir = root / "image_in_MNI152_normalized"
    seg_dir = root / "label_31_reID_merged"
    img_dir.mkdir(parents=True, exist_ok=True)
    seg_dir.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n):
        seg = np.zeros(shape, np.uint8)
        d, h, w = shape
        seg[d // 4:d // 2, h // 4:h // 2, w // 4:w // 2] = 1
        seg[d // 2:3 * d // 4, h // 2:3 * h // 4, w // 2:3 * w // 4] = 2
        img = (seg.astype(np.float32) / n_classes
               + rng.rand(*shape).astype(np.float32) * 0.1)
        name = f"scan{i}"
        names.append(name)
        write_nifti(img_dir / f"{name}.nii.gz", NiftiImage(img))
        write_nifti(seg_dir / f"{name}.nii.gz", NiftiImage(seg))
    for list_name in ("train.txt", "valid.txt", "test.txt"):
        (root / list_name).write_text("".join(f"{n}\n" for n in names))
    return names


def tiny_config(root, n_classes=3, n_epochs=2):
    return dict(
        debug_mode=False, resume_dir="", random_seed=230, data="MindBoggle",
        n_epochs=n_epochs, samples_per_epoch=4, batch_size=1,
        valid_batch_size=1, print_batch_period=50, valid_epoch_period=1,
        save_ckpts_epoch_period=1,
        model="UNet_light",
        model_settings={"in_channel": 1, "n_classes": n_classes,
                        "bias": True, "BN": True},
        n_classes=n_classes,
        class_name={k: str(k) for k in range(1, n_classes)},
        crop_size=[2, 3, 2],
        loss="dice",
        loss_settings={"n_class": n_classes, "weight_type": "Uniform",
                       "no_bg": False, "softmax": True, "eps": 1e-6},
        learning_rate=1e-2, lr_mode="multiStep", milestones=[0.5, 1],
        gamma=0.2, num_samples=2, preload=True,
        data_dir=str(root), valid_data_dir=str(root),
        training_list_file=str(root / "train.txt"),
        validation_list_file=str(root / "valid.txt"),
        testing_list_file=str(root / "test.txt"),
        log_dir=str(root / "logs"),
    )


@pytest.fixture(scope="module")
def trained_experiment(tmp_path_factory):
    root = tmp_path_factory.mktemp("mb101")
    make_mindboggle_corpus(root)
    config = tiny_config(root)
    exp = SegmentationExperiment(config)
    exp.train()
    return exp, config, root


@pytest.mark.slow
class TestSegTraining:
    def test_training_improves_dice(self, trained_experiment):
        exp, _, _ = trained_experiment
        # blobs are trivially learnable: validation dice must beat chance
        assert exp.best_score > 0.3

    def test_checkpoint_files_exist(self, trained_experiment):
        exp, _, _ = trained_experiment
        assert os.path.isdir(os.path.join(exp.ckpoint_dir, "checkpoint"))
        assert os.path.isdir(os.path.join(exp.ckpoint_dir, "model_best"))
        assert os.path.isfile(os.path.join(exp.ckpoint_dir,
                                           "train_config.json"))

    def test_test_entrypoint(self, trained_experiment):
        exp, config, _ = trained_experiment
        exp2 = SegmentationExperiment(config)
        dice_per_class, dice_avg = exp2.test(best=True, if_log=False)
        assert dice_per_class.shape == (config["n_classes"] - 1,)
        assert 0.0 <= dice_avg <= 1.0
        np.testing.assert_allclose(dice_avg, exp.best_score, atol=1e-5)

    def test_resume_continues_epoch(self, trained_experiment):
        exp, config, root = trained_experiment
        cfg = dict(config)
        cfg["resume_dir"] = os.path.join(exp.ckpoint_dir, "checkpoint")
        cfg["n_epochs"] = 3
        exp3 = SegmentationExperiment(cfg)
        exp3.train()  # runs only epoch 3
        assert exp3.current_epoch == 4
        assert exp3.best_score >= exp.best_score - 1e-6


class TestCheckpointRoundtrip:
    def test_pytree_roundtrip(self, tmp_path):
        state = {"epoch": 3, "best_score": 0.75,
                 "params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "opt_state": {"mu": jnp.ones((2, 3))}}
        save_checkpoint(state, is_best=True, path=str(tmp_path))
        restored, epoch, best = initialize_from(
            os.path.join(str(tmp_path), "model_best"), state)
        assert epoch == 3 and best == 0.75
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                                   np.arange(6.0).reshape(2, 3))

    def test_missing_checkpoint_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no checkpoint found"):
            initialize_from(str(tmp_path / "nope"))

    def test_best_score_aliases(self, tmp_path):
        """reg_best_score / seg_best_score keys accepted
        (models/base.py:96-101)."""
        state = {"epoch": 1, "seg_best_score": 0.5, "params": {}}
        save_checkpoint(state, False, str(tmp_path))
        _, _, best = initialize_from(
            os.path.join(str(tmp_path), "checkpoint"), state)
        assert best == 0.5


class TestSchedulers:
    def test_multistep_matches_torch_semantics(self):
        sched = MultiStepLR(1e-3, milestones=[2, 4], gamma=0.1)
        lrs = [sched.step() for _ in range(5)]
        np.testing.assert_allclose(
            lrs, [1e-3, 1e-4, 1e-4, 1e-5, 1e-5], rtol=1e-6)

    def test_plateau_reduces_after_patience(self):
        sched = ReduceLROnPlateau(1e-3, factor=0.5, patience=2,
                                  threshold=0.003, min_lr=1e-5)
        sched.step(0.5)
        for _ in range(3):
            lr = sched.step(0.5)  # no improvement
        assert lr == pytest.approx(5e-4)

    def test_plateau_respects_min_lr(self):
        sched = ReduceLROnPlateau(1e-3, factor=0.01, patience=0,
                                  min_lr=1e-5)
        sched.step(1.0)
        lr = sched.step(0.0)
        assert lr == pytest.approx(1e-5)

    def test_factory_resolves_milestone_fractions(self):
        sched = make_scheduler("multiStep", 1e-3, n_epochs=100,
                               milestones=[0.5, 1], gamma=0.2)
        assert sched.milestones == [50, 100]

    def test_const_mode_supported(self):
        sched = make_scheduler("const", 1e-3, 10)
        assert sched.step() == 1e-3
