"""Integration tests: registration and joint DeepAtlas training on a tiny
synthetic corpus (SURVEY.md §4c extended to BASELINE.json configs 2-3)."""
import os

import numpy as np
import pytest

from deepatlas_tpu.train import DeepAtlasExperiment, RegistrationExperiment
from tests.test_train import make_mindboggle_corpus


def reg_config(root, n_classes=3, n_epochs=2):
    return dict(
        debug_mode=False, resume_dir="", random_seed=230, data="MindBoggle",
        n_epochs=n_epochs, samples_per_epoch=4, batch_size=1,
        print_batch_period=50, valid_epoch_period=1,
        save_ckpts_epoch_period=1,
        model="voxel_morph_cvpr",
        model_settings={"enc_filters": (4, 8, 8, 8, 8),
                        "dec_filters": (8, 8, 8, 4, 4)},
        n_classes=n_classes,
        crop_size=None,
        loss="lncc", loss_settings={"filter_size": 5},
        reg_loss="bendingEnergy", reg_loss_settings={}, reg_weight=0.5,
        max_validation_pairs=4,
        learning_rate=1e-3, lr_mode="multiStep", milestones=[0.5, 1],
        gamma=0.2, num_samples=None, preload=True,
        data_dir=str(root), valid_data_dir=str(root),
        training_list_file=str(root / "train.txt"),
        validation_list_file=str(root / "valid.txt"),
        testing_list_file=str(root / "test.txt"),
        log_dir=str(root / "logs"),
    )


class TestRegistrationTraining:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("mb101reg")
        make_mindboggle_corpus(root, n=3, shape=(12, 14, 12))
        config = reg_config(root)
        exp = RegistrationExperiment(config)
        exp.train()
        return exp, config

    def test_runs_and_checkpoints(self, trained):
        exp, _ = trained
        assert os.path.isdir(os.path.join(exp.ckpoint_dir, "checkpoint"))
        assert exp.best_score > 0  # identical blobs -> warped dice > 0

    def test_test_entrypoint(self, trained):
        exp, config = trained
        exp2 = RegistrationExperiment(config)
        dice_per_class, dice_avg, folding = exp2.test(best=True,
                                                      if_log=False)
        assert dice_per_class.shape == (config["n_classes"] - 1,)
        assert 0.0 <= folding <= 1.0


class TestDeepAtlasTraining:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("mb101joint")
        make_mindboggle_corpus(root, n=3, shape=(12, 14, 12))
        config = dict(
            debug_mode=False, resume_dir="", random_seed=230,
            data="MindBoggle", n_epochs=2, samples_per_epoch=4, batch_size=1,
            print_batch_period=50, valid_epoch_period=1,
            save_ckpts_epoch_period=1,
            seg_model="UNet_light",
            seg_model_settings={"in_channel": 1, "n_classes": 3,
                                "bias": True, "BN": True},
            reg_model="voxel_morph_cvpr",
            reg_model_settings={"enc_filters": (4, 8, 8, 8, 8),
                                "dec_filters": (8, 8, 8, 4, 4)},
            n_classes=3, n_labeled=1,
            crop_size=[2, 3, 2],
            sim_loss="lncc", sim_loss_settings={"filter_size": 5},
            reg_loss="bendingEnergy", reg_loss_settings={},
            seg_loss="dice",
            seg_loss_settings={"n_class": 3, "weight_type": "Uniform",
                               "no_bg": False, "softmax": True, "eps": 1e-6},
            reg_weight=0.5, anatomy_weight=1.0, supervised_weight=1.0,
            max_validation_pairs=4,
            learning_rate=1e-2, lr_mode="const", num_samples=None,
            preload=True,
            data_dir=str(root), valid_data_dir=str(root),
            training_list_file=str(root / "train.txt"),
            validation_list_file=str(root / "valid.txt"),
            testing_list_file=str(root / "test.txt"),
            log_dir=str(root / "logs"),
        )
        exp = DeepAtlasExperiment(config)
        exp.train()
        return exp, config, root

    def test_both_nets_trained_and_scored(self, trained):
        exp, _, _ = trained
        assert exp.seg_best_score > 0
        assert exp.reg_best_score > 0

    def test_joint_checkpoint_carries_both_nets(self, trained):
        """Joint checkpoints store both nets and the seg/reg best-score
        aliases (models/base.py:96-101 evidence)."""
        from deepatlas_tpu.train.checkpoint import load_checkpoint
        exp, _, _ = trained
        restored = load_checkpoint(
            os.path.join(exp.ckpoint_dir, "checkpoint"))
        for key in ("seg_params", "reg_params", "seg_best_score",
                    "reg_best_score", "epoch"):
            assert key in restored

    def test_resume_joint(self, trained):
        exp, config, root = trained
        cfg = dict(config)
        cfg["resume_dir"] = os.path.join(exp.ckpoint_dir, "checkpoint")
        cfg["n_epochs"] = 3
        exp2 = DeepAtlasExperiment(cfg)
        exp2.train()
        assert exp2.current_epoch == 4

    def test_semi_supervision_flags(self, trained):
        exp, _, _ = trained
        # only the first n_labeled=1 scan is treated as labeled
        assert len(exp.labeled_names) == 1


def test_joint_seg_two_pass_matches_single_pass(rng):
    """The two-pass gradient split (chain-rule sum) is exact: same updated
    params as the single-pass step."""
    import jax
    import jax.numpy as jnp
    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetTemplate, VoxelMorphCVPR2018
    from deepatlas_tpu.train import TrainState, make_optimizer
    from deepatlas_tpu.train.reg_steps import make_joint_seg_step

    nc = 3
    shape = (2, 8, 8, 8, 1)
    seg_model = UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                             in_channel=1, n_classes=nc, bias=True, BN=True,
                             act="LeakyReLU")
    reg_model = VoxelMorphCVPR2018(enc_filters=(2, 4, 4, 4, 4),
                                   dec_filters=(4, 4, 4, 2, 2))
    moving = jnp.asarray(rng.rand(*shape).astype(np.float32))
    fixed = jnp.asarray(rng.rand(*shape).astype(np.float32))
    mseg = jnp.asarray(rng.randint(0, nc, shape[:4]).astype(np.int32))
    fseg = jnp.asarray(rng.randint(0, nc, shape[:4]).astype(np.int32))
    has = jnp.asarray([True, False])

    sv = seg_model.init(jax.random.PRNGKey(0), moving, train=False)
    rv = reg_model.init(jax.random.PRNGKey(1), moving, fixed)
    rs = TrainState.create(apply_fn=reg_model.apply, params=rv["params"],
                           batch_stats={}, tx=make_optimizer(1e-3))
    sup = get_loss_function("dice")(n_class=nc, weight_type="Uniform",
                                    softmax=True)

    results = []
    for two_pass in (False, True):
        # deep-copy: the step donates its state and sv is reused
        fresh = jax.tree_util.tree_map(jnp.copy, sv)
        ss = TrainState.create(apply_fn=seg_model.apply,
                               params=fresh["params"],
                               batch_stats=fresh.get("batch_stats", {}),
                               tx=make_optimizer(1e-3))
        step = make_joint_seg_step(sup, 1.0, 1.0, nc, two_pass=two_pass)
        ss2, metrics = step(ss, rs, moving, fixed, mseg, fseg, has, has)
        results.append((ss2.params, metrics))

    (p_single, m_single), (p_two, m_two) = results
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_two["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_single),
                    jax.tree_util.tree_leaves(p_two)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
