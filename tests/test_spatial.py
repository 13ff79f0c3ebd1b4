"""Spatial (depth-sharded) parallelism: parity with single-device math.

The sharded forward/step must be numerically the unsharded one: halo
exchange reproduces SAME conv padding at shard boundaries (zero at global
edges), BatchNorm moments and dice sums psum over the axis, gradients sum
over shards.  Reference context: the reference is single-device
(SURVEY.md §2 parallelism statement); spatial sharding is the TPU-native
whole-volume alternative to its crop/patch memory levers
(lib/transforms.py:124-158, 322-494).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deepatlas_tpu.losses import get_loss_function
from deepatlas_tpu.models import UNetTemplate
from deepatlas_tpu.parallel.spatial import (make_spatial_seg_forward,
                                            make_spatial_seg_step,
                                            shard_volume_batch)
from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                       make_seg_train_step)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def small_model(BN=True):
    # bias=False alongside BN: a conv bias feeding BatchNorm is cancelled by
    # the mean subtraction — its true gradient is ~0 and Adam amplifies the
    # float-noise residue to lr-scale steps in ANY implementation, which
    # would make post-step param comparison meaningless for those leaves
    return UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                        in_channel=1, n_classes=3, bias=not BN, BN=BN,
                        act="LeakyReLU")


def make_state(model, x):
    sv = model.init(jax.random.PRNGKey(0), x, train=False)
    return TrainState.create(apply_fn=model.apply, params=sv["params"],
                             batch_stats=sv.get("batch_stats", {}),
                             tx=make_optimizer(1e-3))


def space_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


def test_halo_exchange_matches_pad(rng):
    from functools import partial

    from deepatlas_tpu.ops.halo import halo_exchange_d
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = space_mesh(4)
    x = jnp.asarray(rng.rand(1, 16, 4, 4, 2).astype(np.float32))

    fn = shard_map(partial(halo_exchange_d, axis_name="space", halo=2),
                   mesh=mesh, in_specs=P(None, "space"),
                   out_specs=P(None, "space"), check_rep=False)
    out = np.asarray(fn(x))
    # each shard's block must equal the zero-padded global slice
    xp = np.pad(np.asarray(x), [(0, 0), (2, 2), (0, 0), (0, 0), (0, 0)])
    blocks = [xp[:, 4 * i:4 * i + 8] for i in range(4)]
    np.testing.assert_allclose(out, np.concatenate(blocks, axis=1))


@pytest.mark.parametrize("BN", [False, True])
def test_spatial_forward_matches_single(rng, BN):
    model = small_model(BN)
    x = jnp.asarray(rng.rand(1, 16, 8, 8, 1).astype(np.float32))
    state = make_state(model, x)
    ref = model.apply(
        {"params": state.params, **({"batch_stats": state.batch_stats}
                                    if BN else {})}, x, train=False)

    mesh = space_mesh(4)
    fwd = make_spatial_seg_forward(model, mesh)
    out = fwd(state, shard_volume_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_spatial_step_matches_single(rng):
    model = small_model(BN=True)
    x = jnp.asarray(rng.rand(2, 16, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 16, 8, 8)).astype(np.int32))

    factory = get_loss_function("dice")
    crit = factory(n_class=3, weight_type="Uniform", softmax=True)
    state_ref = make_state(model, x)
    ref_step = make_seg_train_step(crit)
    sr, loss_ref, _ = ref_step(state_ref, x, labels)

    mesh = space_mesh(4)
    state_sp = make_state(model, x)
    sp_step = make_spatial_seg_step(
        model, factory, n_class=3, mesh=mesh,
        criterion_kwargs=dict(weight_type="Uniform", softmax=True))
    xs, ls = shard_volume_batch((x, labels), mesh)
    ss, loss_sp, _ = sp_step(state_sp, xs, ls)

    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss.batch_stats),
                    jax.tree_util.tree_leaves(sr.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_spatial_with_data_parallel(rng):
    """DP x SP on a 2-D (data, space) mesh equals the single-device step on
    the full batch."""
    from jax.sharding import Mesh as Mesh2

    model = small_model(BN=False)
    x = jnp.asarray(rng.rand(2, 16, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 16, 8, 8)).astype(np.int32))

    factory = get_loss_function("dice")
    crit = factory(n_class=3, weight_type="Uniform", softmax=True)
    state_ref = make_state(model, x)
    sr, loss_ref, _ = make_seg_train_step(crit)(state_ref, x, labels)

    mesh = Mesh2(np.asarray(jax.devices()[:8]).reshape(2, 4),
                 ("data", "space"))
    state_sp = make_state(model, x)
    sp_step = make_spatial_seg_step(
        model, factory, n_class=3, mesh=mesh, data_axis="data",
        criterion_kwargs=dict(weight_type="Uniform", softmax=True))
    xs, ls = shard_volume_batch((x, labels), mesh, data_axis="data")
    ss, loss_sp, _ = sp_step(state_sp, xs, ls)

    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_spatial_rejects_upsample():
    m = UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                     in_channel=1, n_classes=3, upsample=True)
    mesh = space_mesh(2)
    with pytest.raises(ValueError, match="spatial_axis is not supported"):
        fwd = make_spatial_seg_forward(m, mesh)
        x = jnp.zeros((1, 16, 8, 8, 1))
        st = make_state(UNetTemplate(encoders=((2, 4), (4, 4)),
                                     decoders=((4, 4, 4),), in_channel=1,
                                     n_classes=3), x)
        fwd(st, shard_volume_batch(x, mesh))


def packed_small_model(BN=True):
    """A packed-tier small U-Net (packed_levels=1 packs the top level; the
    deeper level + transition stay XLA — the packed/XLA seam is exactly
    what the halo composition must preserve).  Channel counts are powers
    of two >= 8: packed BN floors lane groups at 8 (models/packed.py
    effective_cout)."""
    return UNetTemplate(encoders=((8, 8), (8, 8)), decoders=((8, 8, 8),),
                        in_channel=1, n_classes=3, bias=not BN, BN=BN,
                        act="LeakyReLU", packed=True, packed_levels=1,
                        interpret=True)


@pytest.mark.slow
def test_spatial_packed_forward_matches_single(rng):
    """Depth-sharded PACKED forward == single-device packed forward: the
    packed conv halo-exchanges D planes and slices the interior of the
    kernel's zero-padded output (round-3 VERDICT next #5 — the spatial
    tier no longer forfeits the Pallas perf layer)."""
    model = packed_small_model(BN=True)
    # W=32: the packed deconv's 8-channel w-group is 16, so the half-res
    # level needs stored W 16 (pallas/deconv3d.py::deconv_w_blk)
    x = jnp.asarray(rng.rand(1, 16, 8, 32, 1).astype(np.float32))
    state = make_state(model, x)
    ref = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats}, x, train=False)

    mesh = space_mesh(4)
    fwd = make_spatial_seg_forward(model, mesh)
    out = fwd(state, shard_volume_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_spatial_packed_step_matches_single(rng):
    """Depth-sharded PACKED train step == single-device packed step (loss,
    params, BN stats) — PackedBatchNorm moments psum over the axis, conv
    gradients flow back through the halo exchange."""
    model = packed_small_model(BN=True)
    x = jnp.asarray(rng.rand(1, 16, 8, 32, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (1, 16, 8, 32)).astype(np.int32))

    factory = get_loss_function("dice")
    crit = factory(n_class=3, weight_type="Uniform", softmax=True)
    state_ref = make_state(model, x)
    sr, loss_ref, _ = make_seg_train_step(crit)(state_ref, x, labels)

    mesh = space_mesh(4)
    state_sp = make_state(model, x)
    sp_step = make_spatial_seg_step(
        model, factory, n_class=3, mesh=mesh,
        criterion_kwargs=dict(weight_type="Uniform", softmax=True))
    xs, ls = shard_volume_batch((x, labels), mesh)
    ss, loss_sp, _ = sp_step(state_sp, xs, ls)

    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss.batch_stats),
                    jax.tree_util.tree_leaves(sr.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_spatial_fixed_unet_forward(rng):
    """The fixed UNet (3 pools, unets.py:70-179) also runs depth-sharded."""
    from deepatlas_tpu.models import UNet

    model = UNet(in_channel=1, n_classes=2, bias=True, BN=False)
    x = jnp.asarray(rng.rand(1, 32, 8, 8, 1).astype(np.float32))
    state = make_state(model, x)
    ref = model.apply({"params": state.params}, x, train=False)

    mesh = space_mesh(4)
    fwd = make_spatial_seg_forward(model, mesh)
    out = fwd(state, shard_volume_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _shardmap_scalar(fn, mesh, *args):
    """Run a loss fn under shard_map with D-sharded inputs; returns scalar."""
    from functools import partial

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    wrapped = shard_map(fn, mesh=mesh,
                        in_specs=tuple(P(None, "space") for _ in args),
                        out_specs=P(), check_vma=False)
    return jax.jit(wrapped)(*args)


def test_spatial_lncc_matches_global(rng):
    from deepatlas_tpu.losses import lncc_loss

    mesh = space_mesh(4)
    a = jnp.asarray(rng.rand(1, 32, 12, 12, 1).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 32, 12, 12, 1).astype(np.float32))
    ref = float(lncc_loss(a, b, filter_size=9))
    got = float(_shardmap_scalar(
        lambda x, y: lncc_loss(x, y, filter_size=9, axis_name="space"),
        mesh, a, b))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@pytest.mark.parametrize("norm", ["L2", "L1"])
def test_spatial_bending_matches_global(rng, norm):
    from deepatlas_tpu.losses import bending_energy_loss

    mesh = space_mesh(4)
    f = jnp.asarray(rng.randn(1, 32, 10, 12, 3).astype(np.float32))
    ref = float(bending_energy_loss(f, norm=norm))
    got = float(_shardmap_scalar(
        lambda x: bending_energy_loss(x, norm=norm, axis_name="space"),
        mesh, f))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_spatial_voxelmorph_forward_matches_single(rng):
    """Depth-sharded VoxelMorph: stride-2 halo convs, local nearest
    upsampling, global-aware identity, halo'ed spatial-transformer warp."""
    from functools import partial

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    import dataclasses

    from deepatlas_tpu.models import VoxelMorphCVPR2018

    # D = 64 = 4 shards x 16: four stride-2 halvings keep every shard
    # depth even (the stride-2 halo conv requires it)
    model = VoxelMorphCVPR2018(enc_filters=(4, 8, 8, 8, 8),
                               dec_filters=(8, 8, 8, 4, 4),
                               flow_scale=0.1)
    mov = jnp.asarray(rng.rand(1, 64, 16, 16, 1).astype(np.float32))
    fix = jnp.asarray(rng.rand(1, 64, 16, 16, 1).astype(np.float32))
    sv = model.init(jax.random.PRNGKey(0), mov, fix)
    disp_r, warped_r, deform_r = model.apply(sv, mov, fix, train=False)

    mesh = space_mesh(4)
    sp = dataclasses.replace(model, spatial_axis="space")
    fn = shard_map(
        lambda m, f: sp.apply(sv, m, f, train=False), mesh=mesh,
        in_specs=(P(None, "space"), P(None, "space")),
        out_specs=(P(None, "space"),) * 3, check_vma=False)
    disp_s, warped_s, deform_s = jax.jit(fn)(mov, fix)

    np.testing.assert_allclose(np.asarray(disp_s), np.asarray(disp_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(deform_s), np.asarray(deform_r),
                               atol=2e-5)
    # |disp| stays far below max_disp (flow_scale=0.1), so the spatial
    # warp's clamp is inactive and the exact XLA warp is the reference
    np.testing.assert_allclose(np.asarray(warped_s), np.asarray(warped_r),
                               atol=1e-4)


@pytest.mark.slow
def test_spatial_reg_step_matches_single(rng):
    from deepatlas_tpu.losses import (_bending_factory,
                                      _lncc_factory)  # type: ignore
    from deepatlas_tpu.models import VoxelMorphCVPR2018
    from deepatlas_tpu.parallel.spatial import make_spatial_reg_step
    from deepatlas_tpu.train.reg_steps import make_reg_train_step

    model = VoxelMorphCVPR2018(enc_filters=(4, 8, 8, 8, 8),
                               dec_filters=(8, 8, 8, 4, 4),
                               flow_scale=0.1)
    mov = jnp.asarray(rng.rand(1, 64, 16, 16, 1).astype(np.float32))
    fix = jnp.asarray(rng.rand(1, 64, 16, 16, 1).astype(np.float32))

    def fresh():
        sv = model.init(jax.random.PRNGKey(0), mov, fix)
        return TrainState.create(apply_fn=model.apply, params=sv["params"],
                                 batch_stats={}, tx=make_optimizer(1e-3))

    sim = _lncc_factory(filter_size=9)
    reg = _bending_factory()
    sr, m_ref = make_reg_train_step(sim, reg, reg_weight=0.5)(fresh(), mov,
                                                              fix)

    mesh = space_mesh(4)
    sp_step = make_spatial_reg_step(model, _lncc_factory, _bending_factory,
                                    reg_weight=0.5, mesh=mesh,
                                    sim_kwargs=dict(filter_size=9))
    ms, fs = shard_volume_batch((mov, fix), mesh)
    ss, m_sp = sp_step(fresh(), ms, fs)

    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_sp["sim"]), float(m_ref["sim"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_sp["reg"]), float(m_ref["reg"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_spatial_joint_steps_match_single(rng):
    """Depth-sharded joint DeepAtlas reg + seg (soft-path) steps equal the
    single-device ones on a mixed-label pair (moving labeled, fixed not —
    the frozen-net substitution and the soft anatomy both engage)."""
    from deepatlas_tpu.losses import (_bending_factory, _dice_factory,
                                      _lncc_factory)  # type: ignore
    from deepatlas_tpu.models import VoxelMorphCVPR2018
    from deepatlas_tpu.parallel.spatial import make_spatial_joint_steps
    from deepatlas_tpu.train.reg_steps import (make_joint_reg_step,
                                               make_joint_seg_step)

    n_class = 3
    seg_model = UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                             in_channel=1, n_classes=n_class, bias=False,
                             BN=True, act="LeakyReLU")
    reg_model = VoxelMorphCVPR2018(enc_filters=(4, 8, 8, 8, 8),
                                   dec_filters=(8, 8, 8, 4, 4),
                                   flow_scale=0.1)
    mov = jnp.asarray(rng.rand(1, 64, 16, 16, 1).astype(np.float32))
    fix = jnp.asarray(rng.rand(1, 64, 16, 16, 1).astype(np.float32))
    mseg = jnp.asarray(rng.randint(0, n_class, (1, 64, 16, 16)), jnp.int32)
    fseg = jnp.asarray(rng.randint(0, n_class, (1, 64, 16, 16)), jnp.int32)
    m_has = jnp.asarray([True])
    f_has = jnp.asarray([False])

    def fresh(model, *xs):
        # SGD, not Adam: the spatial warp's local-frame coordinate
        # round-trip can flip the trilinear floor at (measure-zero)
        # near-integer coordinates — an O(eps) value change but a different
        # subgradient choice, which Adam normalizes up to lr-scale steps on
        # near-zero-gradient leaves; SGD keeps the comparison meaningful
        import optax
        sv = model.init(jax.random.PRNGKey(0), *xs, train=False)
        return TrainState.create(apply_fn=model.apply, params=sv["params"],
                                 batch_stats=sv.get("batch_stats", {}),
                                 tx=optax.sgd(1e-2))

    sup_kw = dict(weight_type="Uniform", softmax=True, eps=1e-6)
    sim = _lncc_factory(filter_size=9)
    breg = _bending_factory()
    sup = _dice_factory(n_class=n_class, **sup_kw)
    ref_reg_step = make_joint_reg_step(sim, breg, reg_weight=0.5,
                                       anatomy_weight=0.3, n_class=n_class)
    ref_seg_step = make_joint_seg_step(sup, anatomy_weight=0.3,
                                       supervised_weight=1.0,
                                       n_class=n_class, two_pass=False)
    rs_ref, rm_ref = ref_reg_step(fresh(reg_model, mov, fix),
                                  fresh(seg_model, mov), mov, fix, mseg,
                                  fseg, m_has, f_has)
    ss_ref, sm_ref = ref_seg_step(fresh(seg_model, mov),
                                  fresh(reg_model, mov, fix), mov, fix,
                                  mseg, fseg, m_has, f_has)

    mesh = space_mesh(4)
    sp_reg_step, sp_seg_step = make_spatial_joint_steps(
        seg_model, reg_model, _lncc_factory, _bending_factory,
        _dice_factory, n_class=n_class, reg_weight=0.5, anatomy_weight=0.3,
        supervised_weight=1.0, mesh=mesh,
        sim_kwargs=dict(filter_size=9), supervised_kwargs=sup_kw)
    shards = shard_volume_batch((mov, fix, mseg, fseg), mesh)
    rs_sp, rm_sp = sp_reg_step(fresh(reg_model, mov, fix),
                               fresh(seg_model, mov), *shards, m_has, f_has)
    ss_sp, sm_sp = sp_seg_step(fresh(seg_model, mov),
                               fresh(reg_model, mov, fix), *shards, m_has,
                               f_has)

    for k in ("loss", "sim", "reg", "anatomy"):
        np.testing.assert_allclose(float(rm_sp[k]), float(rm_ref[k]),
                                   rtol=2e-5, err_msg=f"reg metric {k}")
    for k in ("loss", "anatomy", "supervised"):
        np.testing.assert_allclose(float(sm_sp[k]), float(sm_ref[k]),
                                   rtol=2e-5, err_msg=f"seg metric {k}")
    for a, b in zip(jax.tree_util.tree_leaves(rs_sp.params),
                    jax.tree_util.tree_leaves(rs_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss_sp.params),
                    jax.tree_util.tree_leaves(ss_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ss_sp.batch_stats),
                    jax.tree_util.tree_leaves(ss_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
def test_spatial_reg_step_dp_sp_mesh(rng):
    """DP x SP registration: batch over 'data', depth over 'space' on a
    (2, 4) mesh — loss/metrics/updated params equal the single-device
    batch-2 step."""
    import optax

    from deepatlas_tpu.losses import (_bending_factory,
                                      _lncc_factory)  # type: ignore
    from deepatlas_tpu.models import VoxelMorphCVPR2018
    from deepatlas_tpu.parallel.spatial import make_spatial_reg_step
    from deepatlas_tpu.train.reg_steps import make_reg_train_step

    model = VoxelMorphCVPR2018(enc_filters=(4, 8, 8, 8, 8),
                               dec_filters=(8, 8, 8, 4, 4),
                               flow_scale=0.1)
    mov = jnp.asarray(rng.rand(2, 64, 16, 16, 1).astype(np.float32))
    fix = jnp.asarray(rng.rand(2, 64, 16, 16, 1).astype(np.float32))

    def fresh():
        sv = model.init(jax.random.PRNGKey(0), mov, fix)
        return TrainState.create(apply_fn=model.apply, params=sv["params"],
                                 batch_stats={}, tx=optax.sgd(1e-2))

    sr, m_ref = make_reg_train_step(_lncc_factory(filter_size=9),
                                    _bending_factory(),
                                    reg_weight=0.5)(fresh(), mov, fix)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "space"))
    sp_step = make_spatial_reg_step(model, _lncc_factory, _bending_factory,
                                    reg_weight=0.5, mesh=mesh,
                                    data_axis="data",
                                    sim_kwargs=dict(filter_size=9))
    ms, fs = shard_volume_batch((mov, fix), mesh, data_axis="data")
    ss, m_sp = sp_step(fresh(), ms, fs)

    for k in ("loss", "sim", "reg"):
        np.testing.assert_allclose(float(m_sp[k]), float(m_ref[k]),
                                   rtol=2e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(ss.params),
                    jax.tree_util.tree_leaves(sr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_spatial_seg_eval_matches_single(rng):
    from deepatlas_tpu.parallel.spatial import make_spatial_seg_eval_step
    from deepatlas_tpu.train.steps import make_seg_eval_step

    model = small_model(BN=True)
    x = jnp.asarray(rng.rand(2, 16, 8, 8, 1).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 16, 8, 8)).astype(np.int32))
    state = make_state(model, x)
    dice_ref, logits_ref = make_seg_eval_step(3)(state, x, labels)

    mesh = space_mesh(4)
    ev = make_spatial_seg_eval_step(model, 3, mesh)
    xs, ls = shard_volume_batch((x, labels), mesh)
    dice_sp, logits_sp = ev(state, xs, ls)

    np.testing.assert_allclose(np.asarray(dice_sp), np.asarray(dice_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_sp),
                               np.asarray(logits_ref), atol=2e-5)
