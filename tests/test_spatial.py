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


def test_spatial_rejects_packed_and_upsample():
    m = UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                     in_channel=1, n_classes=3, packed=True)
    mesh = space_mesh(2)
    with pytest.raises(ValueError, match="spatial_axis is not supported"):
        fwd = make_spatial_seg_forward(m, mesh)
        x = jnp.zeros((1, 16, 8, 8, 1))
        st = make_state(UNetTemplate(encoders=((2, 4), (4, 4)),
                                     decoders=((4, 4, 4),), in_channel=1,
                                     n_classes=3), x)
        fwd(st, shard_volume_batch(x, mesh))


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
