"""Packed-layout Pallas conv vs lax.conv_general_dilated (interpret mode).

The packed conv (pallas/conv3d.py) replaces XLA's TPU convolution at the
U-Nets' small channel counts; these tests pin forward and backward parity
against the XLA composition on CPU (SURVEY.md §4(e) strategy).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.pallas.conv3d import (build_band_bank, choose_w_blk,
                                         pack_channels, packed_conv3d,
                                         packed_width, unpack_channels)


def xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3 if k.shape[0] == 3 else [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def run_packed(x, k, w):
    c_in, c_out = k.shape[-2], k.shape[-1]
    ws = packed_width(w, c_in, c_out)
    xp = pack_channels(x, ws)[0]
    out = packed_conv3d(xp, k, c_in=c_in, w_valid=w,
                        kernel_size=k.shape[0], interpret=True)
    return unpack_channels(out[None], c_out, w)


@pytest.mark.parametrize("cin,cout", [(8, 16), (16, 16), (16, 32), (32, 16)])
def test_forward_matches_xla(rng, cin, cout):
    d, h, w = 10, 12, 24
    x = jnp.asarray(rng.randn(1, d, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32)) * 0.2
    out = run_packed(x, k, w)
    ref = xla_conv(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_forward_width_padding(rng):
    # W=21 is not a multiple of the w-group: stored width pads, result exact
    d, h, w, cin, cout = 10, 9, 21, 16, 16
    x = jnp.asarray(rng.randn(1, d, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32)) * 0.2
    out = run_packed(x, k, w)
    ref = xla_conv(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_pointwise_matches_xla(rng):
    d, h, w, cin, cout = 6, 8, 16, 16, 32
    x = jnp.asarray(rng.randn(1, d, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 1, cin, cout).astype(np.float32)) * 0.2
    out = run_packed(x, k, w)
    ref = xla_conv(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("ksize", [3, 1])
def test_grads_match_xla(rng, ksize):
    d, h, w, cin, cout = 8, 10, 16, 16, 16
    x0 = rng.randn(1, d, h, w, cin).astype(np.float32)
    k0 = (rng.randn(ksize, ksize, ksize, cin, cout) * 0.2).astype(np.float32)
    ct = rng.randn(1, d, h, w, cout).astype(np.float32)

    def loss_packed(x, k):
        return jnp.sum(run_packed(x, k, w) * ct)

    def loss_xla(x, k):
        return jnp.sum(xla_conv(x, k) * ct)

    gx_p, gk_p = jax.grad(loss_packed, argnums=(0, 1))(jnp.asarray(x0),
                                                       jnp.asarray(k0))
    gx_r, gk_r = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(x0),
                                                    jnp.asarray(k0))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               atol=3e-3, rtol=3e-4)


def test_band_bank_band_structure(rng):
    # every nonzero of B must be a kernel entry; band covers all 27 taps
    cin = cout = 16
    w_blk = choose_w_blk(cin, cout)
    k = jnp.asarray(rng.randn(3, 3, 3, cin, cout).astype(np.float32))
    B = np.asarray(build_band_bank(k, cin, cout, w_blk))
    assert B.shape == (9 * w_blk * cin, 3 * w_blk * cout)
    nz = np.count_nonzero(B)
    # per (dz, dy): 3*w_blk - 2 in-range (wi, wo) pairs within the r=0
    # block plus one group-crossing pair in each of r=±1, each dense in
    # (ci, co) — 3*w_blk total
    assert nz == 9 * 3 * w_blk * cin * cout


def test_non_power_of_two_channels_clear_error():
    """The lane-packing constraint (pallas/conv3d.py::choose_w_blk) must
    fail loudly with guidance for a hand-built non-conforming config —
    shipped configs pad to the next power of two (models/packed.py::pack),
    so this error only reaches users who bypass that (round-2 VERDICT
    weak #9)."""
    import pytest

    with pytest.raises(ValueError, match="powers of two.*pad channels"):
        choose_w_blk(24, 32)
    with pytest.raises(ValueError, match="powers of two"):
        choose_w_blk(16, 31)


@pytest.mark.parametrize("p_blk,d", [(2, 7), (4, 12), (3, 10)])
def test_block_forward_matches_xla(rng, p_blk, d):
    """Experimental multi-plane forward (`packed_conv3d_block`): p_blk
    output planes per grid step via the halo'd window + global-roll
    variants (`_variants_nd`), against the XLA reference — including a
    depth that is not a multiple of p_blk (tail padding)."""
    from deepatlas_tpu.pallas.conv3d import packed_conv3d_block

    h, w, cin, cout = 8, 12, 8, 16
    x = jnp.asarray(rng.rand(1, d, h, w, cin).astype(np.float32))
    k = jnp.asarray(0.1 * rng.randn(3, 3, 3, cin, cout).astype(np.float32))
    ref = xla_conv(x, k)
    ws = packed_width(w, cin, cout)
    xp = pack_channels(x, ws)[0]
    out = packed_conv3d_block(xp, k, c_in=cin, w_valid=w, p_blk=p_blk,
                              interpret=True)
    blk = unpack_channels(out[None], cout, w)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(ref), atol=2e-5)
