"""Image-similarity losses for registration.

TPU-native reimplementations of the reference's similarity terms:
  * global NCC (loss.py:485-501)
  * VoxelMorph single-window LNCC, filter_size 9 — the reg similarity loss
    (loss.py:589-617)
  * multi-scale strided/dilated LNCC with the size-dependent scale schedule
    (loss.py:512-586)
  * MSE (loss.py:504-509)

Local sums use separable windowed reductions (ops/window.py) instead of dense
ones-kernel conv3d — O(3k) adds per voxel instead of O(k^3) MACs, the right
trade on the VPU; the Pallas fused warp+LNCC kernel replaces this on the hot
path (pallas/ package).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..ops import window_sum


def ncc_loss(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - global normalized cross-correlation, averaged over batch."""
    b = input.shape[0]
    x = input.reshape(b, -1)
    y = target.reshape(b, -1)
    xc = x - x.mean(axis=1, keepdims=True)
    yc = y - y.mean(axis=1, keepdims=True)
    ncc = (xc * yc).mean(axis=1) / (
        jnp.sqrt((xc ** 2).mean(axis=1)) * jnp.sqrt((yc ** 2).mean(axis=1)))
    return 1.0 - ncc.mean()


def mse_loss(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((input - target) ** 2)


def _lncc_cc(i_img: jnp.ndarray, j_img: jnp.ndarray, window, stride, dilation,
             eps: float) -> jnp.ndarray:
    """Squared local correlation coefficient map for one window config."""
    win = (window, window, window) if isinstance(window, int) else window
    numel = float(win[0] * win[1] * win[2])

    i_sum = window_sum(i_img, window, stride, dilation)
    j_sum = window_sum(j_img, window, stride, dilation)
    i2_sum = window_sum(i_img ** 2, window, stride, dilation)
    j2_sum = window_sum(j_img ** 2, window, stride, dilation)
    ij_sum = window_sum(i_img * j_img, window, stride, dilation)

    i_mean = i_sum / numel
    j_mean = j_sum / numel

    cross = ij_sum - i_mean * j_sum - j_mean * i_sum + i_mean * j_mean * numel
    i_var = i2_sum - 2 * i_mean * i_sum + i_mean ** 2 * numel
    j_var = j2_sum - 2 * j_mean * j_sum + j_mean ** 2 * numel
    return (cross ** 2) / (i_var * j_var + eps)


def lncc_loss(input: jnp.ndarray, target: jnp.ndarray, filter_size: int = 9,
              eps: float = 1e-6,
              axis_name: str | None = None) -> jnp.ndarray:
    """VoxelMorph windowed LNCC: 1 - mean local CC² over valid windows.

    Args:
      input, target: ``(B, D, H, W, C)`` volumes (C normally 1).
      axis_name: when D is depth-sharded over a mesh axis
        (parallel/spatial.py), windows near shard boundaries read a
        ``filter_size // 2``-plane halo from the neighbours; global-edge
        windows keep their zero padding (the halos there are zero), and
        the final mean is a pmean over equal-size shards — exactly the
        single-device loss.
    """
    if axis_name is None:
        cc = _lncc_cc(input, target, filter_size, 1, 1, eps)
        return 1.0 - jnp.mean(cc)
    import jax

    from ..ops.halo import halo_exchange_d
    k = filter_size
    hp = k // 2
    b, d_loc = input.shape[:2]
    n = jax.lax.axis_size(axis_name)
    d = d_loc * n
    idx = jax.lax.axis_index(axis_name)
    ih = halo_exchange_d(input, axis_name, hp)
    jh = halo_exchange_d(target, axis_name, hp)
    # window sums are VALID: the halo'd frame yields d_loc window starts at
    # global positions [z0 - hp, z0 + d_loc - hp) — the shards tile all
    # starts exactly once; mask the out-of-volume ones (2*hp per volume)
    # and divide by the static global valid count
    cc = _lncc_cc(ih, jh, k, 1, 1, eps)
    g = idx * d_loc - hp + jnp.arange(cc.shape[1])
    mask = ((g >= 0) & (g <= d - k)).astype(cc.dtype)[None, :, None, None,
                                                      None]
    total = b * (d - k + 1) * cc.shape[2] * cc.shape[3] * cc.shape[4]
    s = jax.lax.psum(jnp.sum(cc * mask), axis_name)
    return 1.0 - s / total


def multiscale_lncc_schedule(img_shape: Sequence[int]):
    """The reference's shape-dependent scale schedule (loss.py:516-542).

    Resolved at trace time (static shapes), returning
    (scales, weights, dilations, steps).
    """
    max_scale = min(img_shape)
    if max_scale > 128:
        scales = [max_scale // 16, max_scale // 8, max_scale // 4]
        weights = [0.1, 0.3, 0.6]
        dilations = [2, 2, 2]
    elif max_scale > 64:
        scales = [max_scale // 4, max_scale // 2]
        weights = [0.3, 0.7]
        dilations = [2, 2]
    else:
        scales = [max_scale // 2]
        weights = [1.0]
        dilations = [1]
    steps = [max((s + 1) // 4, 1) for s in scales]
    return scales, weights, dilations, steps


def multiscale_lncc_loss(input: jnp.ndarray, target: jnp.ndarray,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Multi-scale LNCC with strided, dilated windows (loss.py:544-586)."""
    scales, weights, dilations, steps = multiscale_lncc_schedule(
        input.shape[1:4])
    total = 0.0
    for scale, weight, dil, step in zip(scales, weights, dilations, steps):
        cc = _lncc_cc(input, target, scale, step, dil, eps)
        total = total + weight * (1.0 - jnp.mean(cc))
    return total
