"""Mesh / data-parallel tests on the virtual 8-device CPU mesh
(SURVEY.md §4d): DP gradients equal single-device gradients on the merged
batch; DP eval equals global confusion dice; batch sharding layouts."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.losses import get_loss_function
from deepatlas_tpu.metrics import multiclass_dice
from deepatlas_tpu.models import UNetTemplate, VoxelMorphCVPR2018
from deepatlas_tpu.parallel import (make_dp_reg_train_step,
                                    make_dp_seg_eval_step,
                                    make_dp_seg_train_step, make_mesh,
                                    replicate, shard_batch)
from deepatlas_tpu.train import (TrainState, make_optimizer,
                                 make_seg_train_step)

N_CLASSES = 3


def tiny_seg_model():
    return UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                        in_channel=1, n_classes=N_CLASSES, bias=True,
                        BN=True, act="LeakyReLU")


def make_state(model, example, key=0, **init_kw):
    variables = model.init(jax.random.PRNGKey(key), *example, **init_kw)
    return TrainState.create(apply_fn=model.apply,
                             params=variables["params"],
                             batch_stats=variables.get("batch_stats", {}),
                             tx=make_optimizer(1e-3))


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() >= 8

    def test_make_mesh(self):
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8}

    def test_mesh_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh(10 ** 6)


class TestDPSeg:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.RandomState(0)
        model = tiny_seg_model()
        images = rng.rand(8, 8, 8, 8, 1).astype(np.float32)
        labels = rng.randint(0, N_CLASSES, (8, 8, 8, 8)).astype(np.int32)
        state = make_state(model, (jnp.asarray(images[:1]),), train=False)
        criterion = get_loss_function("dice")(n_class=N_CLASSES,
                                              weight_type="Uniform",
                                              softmax=True)
        return model, state, criterion, images, labels

    def test_dp_matches_single_device_step(self, setup):
        """One DP step over 8 shards == one single-device step on the full
        batch (same pmean-of-grads math)."""
        model, state, criterion, images, labels = setup
        mesh = make_mesh(8)

        dp_step = make_dp_seg_train_step(criterion, mesh)
        # NB: replicate() must deep-copy — dp_step donates its state, and the
        # fixture's arrays are shared across tests
        dp_state = replicate(state, mesh)
        batch = shard_batch({"image": images, "seg": labels}, mesh)
        dp_state, dp_loss, dp_logits = dp_step(dp_state, batch["image"],
                                               batch["seg"])
        assert dp_logits.shape[:1] == (8,)

        single_step = make_seg_train_step(criterion)
        ref_state, ref_loss, _ = single_step(
            make_state(model, (jnp.asarray(images[:1]),), train=False),
            jnp.asarray(images), jnp.asarray(labels))

        # losses: DP loss is the pmean of 8 shard losses; the single-device
        # loss is over the merged batch — for a batch-mean loss these agree
        np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=2e-2)
        # params after one step agree closely (grads differ only by the
        # mean-of-shard-means vs global-mean weighting of this loss)
        dp_flat = jax.tree_util.tree_leaves(dp_state.params)
        ref_flat = jax.tree_util.tree_leaves(ref_state.params)
        for a, b in zip(dp_flat, ref_flat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)

    def test_dp_eval_matches_per_volume_dice(self, setup):
        model, state, criterion, images, labels = setup
        mesh = make_mesh(8)
        eval_step = make_dp_seg_eval_step(N_CLASSES, mesh)
        dp_state = replicate(state, mesh)
        batch = shard_batch({"image": images, "seg": labels}, mesh)
        dp_dice, dp_logits = eval_step(dp_state, batch["image"],
                                       batch["seg"])
        assert dp_logits.shape[:1] == (8,)

        logits = model.apply({"params": state.params,
                              "batch_stats": state.batch_stats},
                             jnp.asarray(images), train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ref = np.asarray(multiclass_dice(preds, jnp.asarray(labels),
                                         N_CLASSES))
        np.testing.assert_allclose(np.asarray(dp_dice), ref, atol=1e-5)

    def test_dp_confusion_eval_matches_global_confusion(self, setup):
        from deepatlas_tpu.parallel import make_dp_confusion_eval_step
        model, state, criterion, images, labels = setup
        mesh = make_mesh(8)
        eval_step = make_dp_confusion_eval_step(N_CLASSES, mesh)
        dp_state = replicate(state, mesh)
        batch = shard_batch({"image": images, "seg": labels}, mesh)
        dp_dice = np.asarray(eval_step(dp_state, batch["image"],
                                       batch["seg"]))
        logits = model.apply({"params": state.params,
                              "batch_stats": state.batch_stats},
                             jnp.asarray(images), train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ref = np.asarray(multiclass_dice(
            preds.reshape(1, -1, 8, 8),
            jnp.asarray(labels).reshape(1, -1, 8, 8), N_CLASSES))[0]
        np.testing.assert_allclose(dp_dice, ref, atol=1e-5)


@pytest.mark.slow
class TestDPReg:
    def test_dp_reg_step_runs_and_reduces(self):
        rng = np.random.RandomState(0)
        mesh = make_mesh(8)
        model = VoxelMorphCVPR2018(enc_filters=(2, 4, 4, 4, 4),
                                   dec_filters=(4, 4, 4, 2, 2))
        moving = rng.rand(8, 8, 8, 8, 1).astype(np.float32)
        fixed = rng.rand(8, 8, 8, 8, 1).astype(np.float32)
        state = make_state(model, (jnp.asarray(moving[:1]),
                                   jnp.asarray(fixed[:1])))
        sim = get_loss_function("lncc")(filter_size=5)
        reg = get_loss_function("bendingEnergy")()
        step = make_dp_reg_train_step(sim, reg, 0.5, mesh)
        dp_state = replicate(state, mesh)
        batch = shard_batch({"m": moving, "f": fixed}, mesh)
        new_state, metrics = step(dp_state, batch["m"], batch["f"])
        assert np.isfinite(float(metrics["loss"]))
        # params actually changed
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(new_state.params)[0]
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0


@pytest.mark.slow
class TestDPExperiment:
    def test_seg_experiment_data_parallel(self, tmp_path):
        """End-to-end DP training through SegmentationExperiment on the
        virtual 8-device mesh (BASELINE.json config 5)."""
        from tests.test_train import make_mindboggle_corpus, tiny_config
        from deepatlas_tpu.train import SegmentationExperiment

        make_mindboggle_corpus(tmp_path, n=8)
        config = tiny_config(tmp_path, n_epochs=1)
        config.update(data_parallel=True, batch_size=8, valid_batch_size=8,
                      samples_per_epoch=16, num_samples=4)
        exp = SegmentationExperiment(config)
        exp.train()
        assert exp.mesh is not None and exp.mesh.shape == {"data": 8}
        assert exp.best_score >= 0.0

    def test_dp_batch_size_mismatch_raises(self, tmp_path):
        from tests.test_train import make_mindboggle_corpus, tiny_config
        from deepatlas_tpu.train import SegmentationExperiment

        make_mindboggle_corpus(tmp_path)
        config = tiny_config(tmp_path, n_epochs=1)
        config.update(data_parallel=True, batch_size=3)
        exp = SegmentationExperiment(config)
        with pytest.raises(ValueError, match="divisible"):
            exp.train()


@pytest.mark.slow
class TestDPJointExperiment:
    def test_deepatlas_experiment_data_parallel(self, tmp_path):
        """train_deepatlas --data-parallel end-to-end on the virtual
        8-device mesh (round-1 VERDICT next-step 4)."""
        from tests.test_train import make_mindboggle_corpus
        from deepatlas_tpu.train import DeepAtlasExperiment

        root = tmp_path / "mb"
        make_mindboggle_corpus(root, n=8, shape=(8, 8, 8), n_classes=4)
        config = dict(
            debug_mode=True, resume_dir="", random_seed=230,
            data="MindBoggle", n_epochs=1, samples_per_epoch=8,
            batch_size=8, print_batch_period=1, valid_epoch_period=1,
            save_ckpts_epoch_period=1,
            seg_model="UNet_light",
            seg_model_settings={"in_channel": 1, "n_classes": 4,
                                "bias": True, "BN": True},
            reg_model="voxel_morph_cvpr",
            reg_model_settings={"enc_filters": (2, 4, 4, 4, 4),
                                "dec_filters": (4, 4, 4, 2, 2)},
            use_pallas_warp=False,
            n_classes=4, n_labeled=2,
            sim_loss="lncc", sim_loss_settings={"filter_size": 5},
            reg_loss="bendingEnergy", reg_loss_settings={},
            seg_loss="dice",
            seg_loss_settings={"n_class": 4, "weight_type": "Uniform",
                               "softmax": True},
            reg_weight=1.0, anatomy_weight=1.0, supervised_weight=1.0,
            max_validation_pairs=2, learning_rate=1e-3, lr_mode="const",
            data_parallel=True, image_summary=False,
            data_dir=str(root), valid_data_dir=str(root),
            training_list_file=str(root / "train.txt"),
            validation_list_file=str(root / "valid.txt"),
            log_dir=str(tmp_path / "logs"),
        )
        exp = DeepAtlasExperiment(config)
        exp.train()
        assert exp.mesh is not None
        assert np.isfinite(exp.seg_best_score)


@pytest.mark.slow
class TestDPJointKernelsEngaged:
    """The DP joint path with the Pallas kernels ACTUALLY ENGAGED inside
    shard_map (round-2 VERDICT weak #2): shapes deep enough for the slab
    pipelines, ``require_kernel=True`` everywhere (an XLA fallback would
    raise at trace time), mixed per-shard labels so one shard takes the
    hard-fused lax.cond branch and the other the dense soft branch."""

    def test_dp_joint_kernels_match_single_device(self):
        import optax

        from deepatlas_tpu.parallel import make_dp_joint_steps
        from deepatlas_tpu.pallas import pallas_grid_sample
        from deepatlas_tpu.train.reg_steps import (make_joint_reg_step,
                                                   make_joint_seg_step)
        from functools import partial

        rng = np.random.RandomState(5)
        nc, md = 3, 2
        shape = (2, 8, 16, 16, 1)
        # BN=False for the exact-equivalence half: DP BatchNorm normalizes
        # per shard while a single device normalizes over the merged batch
        # (documented per-shard semantics) — without BN the two programs
        # compute identical math
        seg_model = UNetTemplate(encoders=((2, 4), (4, 4)),
                                 decoders=((4, 4, 4),), in_channel=1,
                                 n_classes=N_CLASSES, bias=True, BN=False,
                                 act="LeakyReLU")
        reg_model = VoxelMorphCVPR2018(enc_filters=(2, 4, 4, 4, 4),
                                       dec_filters=(4, 4, 4, 2, 2))
        moving = jnp.asarray(rng.rand(*shape).astype(np.float32))
        fixed = jnp.asarray(rng.rand(*shape).astype(np.float32))
        mseg = jnp.asarray(rng.randint(0, nc, shape[:4]).astype(np.int32))
        fseg = jnp.asarray(rng.randint(0, nc, shape[:4]).astype(np.int32))
        # equivalence batch: fully unlabeled — single-device any()-based
        # supervised weighting and DP per-shard weighting coincide (both
        # zero), and the dense soft path (Pallas warp + splat) runs on
        # EVERY shard.  The mixed hard/soft divergence is exercised below.
        has = jnp.asarray([False, False])

        sim = get_loss_function("lncc")(filter_size=5)
        regl = get_loss_function("bendingEnergy")()
        sup = get_loss_function("dice")(n_class=nc, weight_type="Uniform",
                                        softmax=True)
        wfn = partial(pallas_grid_sample, max_disp=md, require_kernel=True)
        wfn_vals = partial(pallas_grid_sample, max_disp=md, grad="values",
                           require_kernel=True)
        akw = {"require_kernel": True}

        def fresh_states():
            sv = seg_model.init(jax.random.PRNGKey(0), moving[:1],
                                train=False)
            rv = reg_model.init(jax.random.PRNGKey(1), moving[:1],
                                fixed[:1])
            # SGD: Adam normalizes away the scale of fp noise between the
            # two compiled programs
            ss = TrainState.create(apply_fn=seg_model.apply,
                                   params=sv["params"],
                                   batch_stats=sv.get("batch_stats", {}),
                                   tx=optax.sgd(1e-2))
            rs = TrainState.create(apply_fn=reg_model.apply,
                                   params=rv["params"], batch_stats={},
                                   tx=optax.sgd(1e-2))
            return ss, rs

        # DP on a 2-device mesh
        mesh = make_mesh(2)
        dp_reg, dp_seg = make_dp_joint_steps(
            sim, regl, sup, reg_weight=1.0, anatomy_weight=1.0,
            supervised_weight=1.0, n_class=nc, mesh=mesh,
            warp_fn=wfn, seg_warp_fn=wfn_vals, max_disp=md,
            fused_anatomy=True, two_pass=True, hard_fused=True,
            anatomy_kwargs=akw)
        ss, rs = fresh_states()
        dp_ss, dp_rs = replicate(ss, mesh), replicate(rs, mesh)
        args = shard_batch((moving, fixed, mseg, fseg, has, has), mesh)
        dp_rs, dp_rm = dp_reg(dp_rs, dp_ss, *args)
        dp_ss, dp_sm = dp_seg(dp_ss, dp_rs, *args)

        # single-device reference on the merged batch
        sr = make_joint_reg_step(sim, regl, 1.0, 1.0, nc, warp_fn=wfn,
                                 max_disp=md, fused_anatomy=True,
                                 anatomy_kwargs=akw)
        sg = make_joint_seg_step(sup, 1.0, 1.0, nc, warp_fn=wfn_vals,
                                 two_pass=True, hard_fused=True,
                                 max_disp=md, anatomy_kwargs=akw)
        ss2, rs2 = fresh_states()
        rs2, rm = sr(rs2, ss2, moving, fixed, mseg, fseg, has, has)
        ss2, sm = sg(ss2, rs2, moving, fixed, mseg, fseg, has, has)

        np.testing.assert_allclose(float(dp_rm["loss"]), float(rm["loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(dp_sm["loss"]), float(sm["loss"]),
                                   rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(dp_rs.params),
                        jax.tree_util.tree_leaves(rs2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(dp_ss.params),
                        jax.tree_util.tree_leaves(ss2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

        # per-shard hard/soft divergence: shard 0 fully labeled takes the
        # hard lax.cond branch (C=1 matched anatomy value), shard 1 the
        # dense soft branch — no collectives inside the cond, so the
        # step must run and stay finite (NB: DP weighs supervised terms
        # per shard, finer than the single-device any()-batch semantics,
        # so there is no single-device twin to compare against here)
        mixed = jnp.asarray([True, False])
        args_mixed = shard_batch((moving, fixed, mseg, fseg, mixed, mixed),
                                 mesh)
        # snapshot before the call: the step donates its state buffers
        a0 = np.asarray(jax.tree_util.tree_leaves(dp_ss.params)[0])
        dp_ss2, dp_sm2 = dp_seg(dp_ss, dp_rs, *args_mixed)
        assert np.isfinite(float(dp_sm2["loss"]))
        assert np.isfinite(float(dp_sm2["anatomy"]))
        a1 = np.asarray(jax.tree_util.tree_leaves(dp_ss2.params)[0])
        assert np.abs(a0 - a1).max() > 0

        # one-sided label structures: every shard takes the m-hard (resp.
        # f-hard) switch branch (constant warped one-hot / adjoint splat,
        # kernels engaged via require_kernel) and DP equals the
        # single-device step on the merged batch — the per-shard
        # supervised weights coincide with the any()-batch semantics when
        # the label pattern is uniform across shards
        both_l = jnp.asarray([True, True])
        for has_m, has_f in ((both_l, has), (has, both_l)):
            args_1s = shard_batch((moving, fixed, mseg, fseg, has_m,
                                   has_f), mesh)
            ss3, rs3 = fresh_states()
            dp_ss3, dp_rs3 = replicate(ss3, mesh), replicate(rs3, mesh)
            dp_ss3, dp_sm3 = dp_seg(dp_ss3, dp_rs3, *args_1s)
            ss4, rs4 = fresh_states()
            ss4, sm4 = sg(ss4, rs4, moving, fixed, mseg, fseg, has_m,
                          has_f)
            np.testing.assert_allclose(float(dp_sm3["loss"]),
                                       float(sm4["loss"]), rtol=1e-4)
            np.testing.assert_allclose(float(dp_sm3["anatomy"]),
                                       float(sm4["anatomy"]), rtol=1e-4)
            for a, b in zip(jax.tree_util.tree_leaves(dp_ss3.params),
                            jax.tree_util.tree_leaves(ss4.params)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=2e-5)

        # opposite one-sided patterns per shard: shard 0 takes m-hard,
        # shard 1 f-hard — switch indices diverge across shards with no
        # collectives inside; the step must run and stay finite
        hm = jnp.asarray([True, False])
        hf = jnp.asarray([False, True])
        args_div = shard_batch((moving, fixed, mseg, fseg, hm, hf), mesh)
        dp_ss4, dp_sm4 = dp_seg(dp_ss2, dp_rs, *args_div)
        assert np.isfinite(float(dp_sm4["loss"]))
        assert np.isfinite(float(dp_sm4["anatomy"]))

    def test_require_kernel_raises_on_shallow_volume(self):
        from deepatlas_tpu.pallas import pallas_grid_sample
        vol = jnp.zeros((1, 4, 8, 8, 2))
        grid = jnp.zeros((1, 4, 8, 8, 3))
        with pytest.raises(ValueError, match="require_kernel"):
            pallas_grid_sample(vol, grid, max_disp=8, require_kernel=True)


@pytest.mark.slow
def test_packed_models_inside_shard_map():
    """The packed-layout Pallas conv tier (models/packed.py) of BOTH
    flagship nets — forward AND backward — composed inside shard_map with
    gradient pmean over the mesh (round-2 VERDICT weak #2: the multi-chip
    packed configuration previously had zero correctness evidence).
    Interpret-mode kernels; one compact seg-U-Net program to bound host
    XLA compile time (the packed U-Net exercises the PackedConvBlock /
    packed deconv / pool machinery the packed VoxelMorph shares; full
    packed joint steps cost ~15 min of CPU compile, and even the two-net
    program ~7 min)."""
    from functools import partial as _p  # noqa: F401

    from jax import lax
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    from deepatlas_tpu.models import UNetLight, VoxelMorphCVPR2018

    mesh = make_mesh(2)
    nc = 4
    shape = (2, 8, 8, 16, 1)
    pseg = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=False,
                     packed=True, interpret=True)
    key = jax.random.PRNGKey(3)
    moving = jax.random.uniform(key, shape, jnp.float32)
    psv = pseg.init(jax.random.fold_in(key, 2), moving[:1], train=False)

    def loss_fn(psv, m):
        logits = pseg.apply(psv, m, train=True)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    def grads_fn(psv, m):
        loss, grads = jax.value_and_grad(loss_fn)(psv, m)
        return lax.pmean(loss, "data"), lax.pmean(grads, "data")

    sharded = shard_map(grads_fn, mesh=mesh,
                        in_specs=(P(), P("data")),
                        out_specs=(P(), P()), check_vma=False)
    loss, grads = jax.jit(sharded)(psv, moving)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(np.asarray(g)))
                          for g in leaves)
    # gradients actually flow through the packed kernels
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)

    # sharded result == single-device math on the merged batch
    ref_loss, _ = jax.jit(jax.value_and_grad(loss_fn))(psv, moving)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


@pytest.mark.slow
class TestSpatialExperiment:
    def test_seg_experiment_spatial_shards(self, tmp_path):
        """End-to-end whole-volume depth-sharded training through
        SegmentationExperiment (config spatial_shards=2): halo-exchanged
        convs + psum'd dice/BN inside the experiment loop, spatial eval."""
        from tests.test_train import make_mindboggle_corpus, tiny_config
        from deepatlas_tpu.train import SegmentationExperiment

        # cropped volume (32, 16, 16): D=32 divides shards(2) x 2^(levels-1)
        make_mindboggle_corpus(tmp_path, n=4, shape=(36, 22, 20))
        config = tiny_config(tmp_path, n_epochs=1)
        config.update(spatial_shards=2, samples_per_epoch=4)
        exp = SegmentationExperiment(config)
        exp.train()
        assert exp.mesh is not None and exp.mesh.shape == {"space": 2}
        assert exp.best_score >= 0.0

    def test_spatial_shards_config_guards(self, tmp_path):
        from tests.test_train import make_mindboggle_corpus, tiny_config
        from deepatlas_tpu.train import SegmentationExperiment

        make_mindboggle_corpus(tmp_path, n=4, shape=(36, 22, 20))
        config = tiny_config(tmp_path, n_epochs=1)
        config.update(spatial_shards=2, data_parallel=True)
        with pytest.raises(ValueError, match="exclusive"):
            SegmentationExperiment(config).train()
        # packed now COMPOSES with spatial sharding (round-4:
        # models/packed.py spatial_axis; parity in tests/test_spatial.py
        # test_spatial_packed_*) — the old "XLA conv path" rejection is
        # gone.  The remaining criterion guard still fires:
        config = tiny_config(tmp_path, n_epochs=1)
        config.update(spatial_shards=2, loss="cross_entropy",
                      loss_settings={"weight_type": "Uniform"})
        with pytest.raises(ValueError, match="dice criterion"):
            SegmentationExperiment(config).train()

    def test_reg_experiment_spatial_shards(self, tmp_path):
        """End-to-end depth-sharded registration training through
        RegistrationExperiment (config spatial_shards=2): stride-2 halo
        convs + halo'ed warp + axis-reduced LNCC/bending in the experiment
        loop; validation runs single-device."""
        from tests.test_train import make_mindboggle_corpus
        from tests.test_train_reg import reg_config
        from deepatlas_tpu.train import RegistrationExperiment

        # D=32 divides shards(2) x 2^4 (four stride-2 halvings per shard)
        make_mindboggle_corpus(tmp_path, n=3, shape=(32, 16, 16))
        config = reg_config(tmp_path, n_epochs=1)
        config.update(spatial_shards=2, max_validation_pairs=2)
        config["model_settings"]["flow_scale"] = 0.1
        exp = RegistrationExperiment(config)
        exp.train()
        assert exp.mesh is not None and exp.mesh.shape == {"space": 2}
        assert np.isfinite(exp.best_score)

    def test_deepatlas_experiment_spatial_shards(self, tmp_path):
        """train_deepatlas --spatial-shards end-to-end: soft-path joint
        steps on depth-sharded whole volumes through the experiment loop
        (frozen-net label substitution, halo'ed anatomy warp, psum'd
        dice), mixed-label batches."""
        from tests.test_train import make_mindboggle_corpus
        from deepatlas_tpu.train import DeepAtlasExperiment

        root = tmp_path / "mb"
        # D=32 = 2 shards x 16: four stride-2 halvings stay even in the
        # VoxelMorph encoder; UNet_light needs dims divisible by 8
        make_mindboggle_corpus(root, n=4, shape=(32, 16, 16), n_classes=4)
        config = dict(
            debug_mode=True, resume_dir="", random_seed=230,
            data="MindBoggle", n_epochs=1, samples_per_epoch=4,
            batch_size=1, print_batch_period=1, valid_epoch_period=1,
            save_ckpts_epoch_period=1,
            seg_model="UNet_light",
            seg_model_settings={"in_channel": 1, "n_classes": 4,
                                "bias": True, "BN": True},
            reg_model="voxel_morph_cvpr",
            reg_model_settings={"enc_filters": (2, 4, 4, 4, 4),
                                "dec_filters": (4, 4, 4, 2, 2),
                                "flow_scale": 0.1},
            use_pallas_warp=False,
            n_classes=4, n_labeled=2,
            sim_loss="lncc", sim_loss_settings={"filter_size": 5},
            reg_loss="bendingEnergy", reg_loss_settings={},
            seg_loss="dice",
            seg_loss_settings={"n_class": 4, "weight_type": "Uniform",
                               "softmax": True},
            reg_weight=1.0, anatomy_weight=1.0, supervised_weight=1.0,
            max_validation_pairs=2, learning_rate=1e-3, lr_mode="const",
            spatial_shards=2, image_summary=False,
            data_dir=str(root), valid_data_dir=str(root),
            training_list_file=str(root / "train.txt"),
            validation_list_file=str(root / "valid.txt"),
            log_dir=str(tmp_path / "logs"),
        )
        exp = DeepAtlasExperiment(config)
        exp.train()
        assert exp.mesh is not None and exp.mesh.shape == {"space": 2}
        assert np.isfinite(exp.seg_best_score)
