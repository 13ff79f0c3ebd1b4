"""Degenerate-mesh (size-1) specialization: parity with the plain steps.

``maybe_shard_map`` (parallel/collectives.py) binds the mesh axes with
size-1 ``vmap``s instead of ``shard_map`` when every named axis has size
1, and ``shard_volume_batch``/``shard_batch``/``replicate`` plain-put at
``mesh.size == 1`` — so the compiled module is a plain single-device
program (no SPMD partitioning), while the IDENTICAL local-step code runs.
Motivation is measured in PERF.md round-5: under the axon TPU client,
SPMD-compiled executables materialize non-aliased outputs through the
host tunnel (the same full-size seg step: 192.8 ms plain vs 34.7 s SPMD,
tools/probe_spatial_inputs.py); on any backend the degenerate case also
skips SPMD compile time.

These tests pin the size-1 paths leaf-for-leaf against the plain
single-device steps (the multi-device shard_map paths are pinned by
tests/test_spatial.py and tests/test_parallel.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, SingleDeviceSharding

from deepatlas_tpu.losses import get_loss_function
from deepatlas_tpu.models import UNetTemplate
from deepatlas_tpu.parallel import (make_dp_seg_train_step,
                                    make_spatial_seg_eval_step,
                                    make_spatial_seg_step, replicate,
                                    shard_batch, shard_volume_batch)
from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                       make_seg_eval_step,
                                       make_seg_train_step)


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def small_model(BN=True):
    return UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                        in_channel=1, n_classes=3, bias=not BN, BN=BN,
                        act="LeakyReLU")


def make_state(model, x):
    sv = model.init(jax.random.PRNGKey(0), x, train=False)
    return TrainState.create(apply_fn=model.apply, params=sv["params"],
                             batch_stats=sv.get("batch_stats", {}),
                             tx=make_optimizer(1e-3))


def mesh1(axis="space"):
    return Mesh(np.asarray(jax.devices()[:1]), (axis,))


def _assert_tree_close(a, b, atol=0.0):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_shard_volume_batch_uncommitted_at_mesh_of_1(rng):
    x = jnp.asarray(rng.rand(1, 8, 8, 8, 1).astype(np.float32))
    xs, = shard_volume_batch((x,), mesh1())
    assert isinstance(xs.sharding, SingleDeviceSharding)
    bs, = shard_batch((x,), mesh1("data"))
    assert isinstance(bs.sharding, SingleDeviceSharding)
    rt = replicate({"w": x}, mesh1("data"))
    assert isinstance(rt["w"].sharding, SingleDeviceSharding)


def test_spatial_seg_step_mesh_of_1_matches_plain(rng):
    model = small_model(BN=True)
    x = jnp.asarray(rng.rand(2, 16, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 16, 8, 8)).astype(np.int32))
    factory = get_loss_function("dice")
    crit = factory(n_class=3, weight_type="Uniform", softmax=True)

    sr, loss_ref, logits_ref = make_seg_train_step(crit)(
        make_state(model, x), x, labels)

    mesh = mesh1()
    sp_step = make_spatial_seg_step(
        model, factory, n_class=3, mesh=mesh,
        criterion_kwargs=dict(weight_type="Uniform", softmax=True))
    xs, ls = shard_volume_batch((x, labels), mesh)
    ss, loss_sp, logits_sp = sp_step(make_state(model, x), xs, ls)

    # bit-exact: the degenerate path compiles the same math without SPMD
    assert float(loss_sp) == pytest.approx(float(loss_ref), abs=1e-7)
    _assert_tree_close(ss.params, sr.params, atol=1e-7)
    _assert_tree_close(ss.batch_stats, sr.batch_stats, atol=1e-7)
    np.testing.assert_allclose(np.asarray(logits_sp),
                               np.asarray(logits_ref), atol=1e-6)


def test_spatial_eval_mesh_of_1_matches_plain(rng):
    model = small_model(BN=True)
    x = jnp.asarray(rng.rand(1, 16, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (1, 16, 8, 8)).astype(np.int32))
    st = make_state(model, x)
    dice_ref, _ = make_seg_eval_step(3)(st, x, labels)
    mesh = mesh1()
    xs, ls = shard_volume_batch((x, labels), mesh)
    dice_sp, _ = make_spatial_seg_eval_step(model, 3, mesh)(st, xs, ls)
    np.testing.assert_allclose(np.asarray(dice_sp), np.asarray(dice_ref),
                               atol=1e-6)


def test_dp_seg_step_mesh_of_1_matches_plain(rng):
    model = small_model(BN=True)
    x = jnp.asarray(rng.rand(2, 8, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 8, 8, 8)).astype(np.int32))
    factory = get_loss_function("dice")
    crit = factory(n_class=3, weight_type="Uniform", softmax=True)

    sr, loss_ref, _ = make_seg_train_step(crit)(make_state(model, x), x,
                                                labels)

    mesh = mesh1("data")
    dp_step = make_dp_seg_train_step(crit, mesh)
    xb, lb = shard_batch((x, labels), mesh)
    st = replicate(make_state(model, x), mesh)
    sd, loss_dp, _ = dp_step(st, xb, lb)

    assert float(loss_dp) == pytest.approx(float(loss_ref), abs=1e-7)
    _assert_tree_close(sd.params, sr.params, atol=1e-7)
    _assert_tree_close(sd.batch_stats, sr.batch_stats, atol=1e-7)


@pytest.mark.slow
def test_spatial_joint_steps_mesh_of_1_run(rng):
    """The joint spatial steps on a 1-mesh execute and produce finite
    losses/metrics through the vmap-bound axis (including axis_index via
    shard_identity_grid and the lax.cond label substitution)."""
    from deepatlas_tpu.losses import (get_loss_function as glf)
    from deepatlas_tpu.models import VoxelMorphCVPR2018
    from deepatlas_tpu.parallel.spatial import make_spatial_joint_steps

    n_class = 3
    x = jnp.asarray(rng.rand(1, 32, 16, 16, 1).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 32, 16, 16, 1).astype(np.float32))
    ms = jnp.asarray(rng.randint(0, n_class,
                                 (1, 32, 16, 16)).astype(np.int32))
    fs = jnp.asarray(rng.randint(0, n_class,
                                 (1, 32, 16, 16)).astype(np.int32))
    has = jnp.ones((1,), bool)

    seg_model = small_model(BN=True)
    reg_model = VoxelMorphCVPR2018(enc_filters=(4, 8, 8, 8, 8),
                                   dec_filters=(8, 8, 8, 4, 4),
                                   flow_scale=0.1)
    seg_state = make_state(seg_model, x)
    rv = reg_model.init(jax.random.PRNGKey(1), x, y, train=False)
    reg_state = TrainState.create(apply_fn=reg_model.apply,
                                  params=rv["params"], batch_stats={},
                                  tx=make_optimizer(1e-3))

    mesh = mesh1()
    jr, js = make_spatial_joint_steps(
        seg_model, reg_model, glf("lncc"), glf("bendingEnergy"),
        glf("dice"), n_class=n_class, reg_weight=0.1, anatomy_weight=1.0,
        supervised_weight=1.0, mesh=mesh, max_disp=4,
        sim_kwargs=dict(window=3), supervised_kwargs=dict(
            weight_type="Uniform", softmax=True))
    batch = shard_volume_batch((x, y, ms, fs), mesh)
    rs2, rmet = jr(reg_state, seg_state, *batch, has, has)
    ss2, smet = js(seg_state, rs2, *batch, has, has)
    for v in list(rmet.values()) + list(smet.values()):
        assert np.isfinite(float(v))
