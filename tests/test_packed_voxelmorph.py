"""Packed VoxelMorph trunk vs the standard XLA path (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.models import VoxelMorphCVPR2018

VOL = (1, 16, 24, 16, 1)


def transfer(std):
    """Standard param tree -> packed param tree (module creation order)."""
    p = std["params"]
    out = {}
    mapping = {"ConvBlock_0": "PackedConvBlock_0",
               "ConvBlock_1": "PackedConvBlock_1",
               "ConvBlock_2": "ConvBlock_0", "ConvBlock_3": "ConvBlock_1",
               "ConvBlock_4": "ConvBlock_2", "ConvBlock_5": "ConvBlock_3",
               "ConvBlock_6": "ConvBlock_4", "ConvBlock_7": "ConvBlock_5",
               "ConvBlock_8": "PackedConvBlock_2",
               "ConvBlock_9": "PackedConvBlock_3"}
    for src_name, dst_name in mapping.items():
        src = p[src_name]
        if dst_name.startswith("Packed"):
            out[dst_name] = {"kernel": src["Conv_0"]["kernel"],
                             "bias": src["Conv_0"]["bias"]}
        else:
            out[dst_name] = src
    out["PackedConvBlock_4"] = {"kernel": p["Conv_0"]["kernel"],
                                "bias": p["Conv_0"]["bias"]}
    return {"params": out}


@pytest.mark.slow
def test_packed_voxelmorph_matches_standard(rng):
    src = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    tgt = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    std_m = VoxelMorphCVPR2018()
    pk_m = VoxelMorphCVPR2018(packed=True, interpret=True)
    std_vars = std_m.init(jax.random.PRNGKey(0), src, tgt)
    pk_vars = transfer(std_vars)

    disp_r, warped_r, deform_r = std_m.apply(std_vars, src, tgt)
    disp_p, warped_p, deform_p = pk_m.apply(pk_vars, src, tgt)
    np.testing.assert_allclose(np.asarray(disp_p), np.asarray(disp_r),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(warped_p), np.asarray(warped_r),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_packed_voxelmorph_grads_flow(rng):
    src = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    tgt = jnp.asarray(rng.rand(*VOL).astype(np.float32))
    std_m = VoxelMorphCVPR2018()
    pk_m = VoxelMorphCVPR2018(packed=True, interpret=True)
    std_vars = std_m.init(jax.random.PRNGKey(0), src, tgt)
    pk_vars = transfer(std_vars)

    def loss(vars_, model):
        disp, warped, _ = model.apply(vars_, src, tgt)
        return jnp.mean((warped - tgt) ** 2) + jnp.mean(disp ** 2)

    g_ref = jax.grad(lambda v: loss(v, std_m))(std_vars)["params"]
    g_pk = jax.grad(lambda v: loss(v, pk_m))(pk_vars)["params"]
    # the flow head's gradient must match through the packed path
    np.testing.assert_allclose(
        np.asarray(g_pk["PackedConvBlock_4"]["kernel"]),
        np.asarray(g_ref["Conv_0"]["kernel"]), atol=2e-4, rtol=2e-3)
    # and the entry conv's gradient (full chain through packed levels)
    np.testing.assert_allclose(
        np.asarray(g_pk["PackedConvBlock_0"]["kernel"]),
        np.asarray(g_ref["ConvBlock_0"]["Conv_0"]["kernel"]),
        atol=2e-3, rtol=2e-2)
