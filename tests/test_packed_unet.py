"""Packed-layout UNet vs the standard (XLA) UNetTemplate path.

Same plan, same transferred parameters, same input — outputs must agree to
float tolerance (the packed path is the same math on Pallas kernels,
interpret mode on CPU).  Pins the UNet_light flagship configuration.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.models import UNetLight

VOL = (1, 16, 24, 16, 1)
NC = 4


def transfer_params(std, bn, pk_model):
    """Map the standard tree onto ``pk_model``'s packed tree via the real
    utility (models/packed.py::transfer_unet_params) — the tests follow the
    model's current ``packed_levels`` default."""
    del bn  # the utility reads model.BN
    from deepatlas_tpu.models.packed import transfer_unet_params

    return transfer_unet_params(std, pk_model)


@pytest.mark.parametrize("bn", [False, True])
@pytest.mark.slow
def test_packed_unet_matches_standard(rng, bn):
    x = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    std_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=bn)
    pk_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=bn,
                         packed=True, interpret=True)
    std_vars = std_model.init(jax.random.PRNGKey(0), x, train=False)
    pk_vars = transfer_params(std_vars, bn, pk_model)

    ref = std_model.apply(std_vars, x, train=False)
    out = pk_model.apply(pk_vars, x, train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_packed_unet_train_mode_bn_stats(rng):
    x = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    std_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=True)
    pk_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=True,
                         packed=True, interpret=True)
    std_vars = std_model.init(jax.random.PRNGKey(0), x, train=False)
    pk_vars = transfer_params(std_vars, True, pk_model)

    ref, std_mut = std_model.apply(std_vars, x, train=True,
                                   mutable=["batch_stats"])
    out, pk_mut = pk_model.apply(pk_vars, x, train=True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)
    # running stats of the first block must agree (valid-voxel statistics)
    ref_m = std_mut["batch_stats"]["ConvBlock_0"]["BatchNorm_0"]["mean"]
    pk_m = pk_mut["batch_stats"]["PackedConvBlock_0"]["PackedBatchNorm_0"][
        "mean"]
    np.testing.assert_allclose(np.asarray(pk_m), np.asarray(ref_m),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_packed_unet_input_grads_match(rng):
    x = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    ct = jnp.asarray(rng.randn(VOL[1], VOL[2], VOL[3], NC)
                     .astype(np.float32))
    std_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=False)
    pk_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=False,
                         packed=True, interpret=True)
    std_vars = std_model.init(jax.random.PRNGKey(0), x, train=False)
    pk_vars = transfer_params(std_vars, False, pk_model)

    g_ref = jax.grad(lambda x: jnp.sum(
        std_model.apply(std_vars, x, train=True) * ct))(x)
    g_pk = jax.grad(lambda x: jnp.sum(
        pk_model.apply(pk_vars, x, train=True) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("pl_levels", [1, 2, 3])
@pytest.mark.slow
def test_transfer_utility_and_deeper_packing(rng, pl_levels):
    """models/packed.py::transfer_unet_params maps the standard tree onto
    ANY packed_levels variant (checkpoint portability between variants);
    packed_levels=3 additionally packs the quarter-resolution C=64 level
    (round-2 VERDICT next-step 5)."""
    from deepatlas_tpu.models.packed import transfer_unet_params

    x = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    std_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=True)
    pk_model = UNetLight(in_channel=1, n_classes=NC, bias=True, BN=True,
                         packed=True, interpret=True,
                         packed_levels=pl_levels)
    std_vars = std_model.init(jax.random.PRNGKey(0), x, train=False)
    pk_vars = transfer_unet_params(std_vars, pk_model)

    # the mapped tree must match what the packed model would create
    ref_tree = jax.tree_util.tree_structure(
        pk_model.init(jax.random.PRNGKey(1), x, train=False)["params"])
    assert jax.tree_util.tree_structure(pk_vars["params"]) == ref_tree
    n_pcb = sum(1 for k in pk_vars["params"] if k.startswith("PackedConv"))
    # per level: 2 enc convs + 2 dec convs; the final 1x1 is packed too
    assert n_pcb == {1: 5, 2: 9, 3: 13}[pl_levels]

    ref = std_model.apply(std_vars, x, train=False)
    out = pk_model.apply(pk_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_packed_channel_constraint_error():
    """A hand-built non-power-of-two channel pair fails with the clear
    lane-packing error (pallas/conv3d.py::choose_w_blk) rather than a
    shape crash deep inside Mosaic — the shipped plans avoid it by padding
    (models/packed.py::effective_cout), so only direct kernel use can hit
    it."""
    from deepatlas_tpu.pallas.conv3d import choose_w_blk

    with pytest.raises(ValueError, match="powers of two.*pad channels"):
        choose_w_blk(24, 32)
    with pytest.raises(ValueError, match="powers of two"):
        choose_w_blk(16, 48)
    assert choose_w_blk(16, 32) == 8
