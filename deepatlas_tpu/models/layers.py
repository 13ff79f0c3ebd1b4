"""Building-block layers for the 3D networks.

TPU-native equivalents of the reference conv blocks
(lib/network_factory/modules.py:28-87, unets.py:24-58): channel-last NDHWC
convolutions (XLA's preferred TPU layout), Xavier-normal kernel init + zero
bias (the reference's ``weights_init``, unets.py:61-67), BatchNorm with
torch-matching momentum/epsilon.

The reference's ``convBlock`` residual option is broken (``x += x``,
modules.py:60) and unused; we implement a real residual add, off by default.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

conv_kernel_init = nn.initializers.glorot_normal()


def get_activation(act: Union[str, Callable]) -> Callable:
    if callable(act):
        return act
    table = {
        "ReLU": nn.relu,
        "LeakyReLU": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "None": lambda x: x,
    }
    if act not in table:
        raise NotImplementedError(
            f"Not Implemented activation type {act}, only {list(table)} "
            f"are available now")
    return table[act]


class ConvBlock(nn.Module):
    """Conv3d(k, stride, padding) + optional BatchNorm + activation.

    ``dtype`` is the compute dtype (params stay float32): bfloat16 feeds the
    MXU at full rate and halves activation memory on TPU.

    ``spatial_axis``: mesh-axis name when the input's D dimension is sharded
    over devices (parallel/spatial.py).  The conv then reads ``padding``
    neighbour planes via halo exchange (ops/halo.py) and pads D VALID —
    exactly the unsharded SAME conv — and BatchNorm reduces its batch
    moments over the axis so statistics match the unsharded model.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    batchnorm: bool = False
    act: str = "ReLU"
    residual: bool = False
    dtype: Any = None
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d_pad = (self.padding, self.padding)
        if self.spatial_axis is not None:
            # stride 1: k=2p+1 halo reproduces SAME padding exactly.
            # stride 2 (k3 p1, the VoxelMorph encoder): global output plane
            # g reads inputs [2g-1, 2g+1]; with even shard depth the shard
            # boundary falls on an even global index, so one halo plane +
            # VALID depth is exactly the unsharded conv (each shard's first
            # window starts at its left halo plane).
            ok = (self.stride == 1 and self.kernel_size == 2 * self.padding
                  + 1) or (self.stride == 2 and self.kernel_size == 3
                           and self.padding == 1)
            if not ok:
                raise ValueError(
                    "spatial sharding supports stride-1 k=2p+1 and "
                    "stride-2 k3 p1 convs; got "
                    f"k={self.kernel_size} s={self.stride} p={self.padding}")
            if self.stride == 2 and x.shape[1] % 2:
                raise ValueError(
                    f"stride-2 spatial conv needs even shard depth, got "
                    f"{x.shape[1]} — use fewer shards or pad D")
            from ..ops.halo import halo_exchange_d
            x = halo_exchange_d(x, self.spatial_axis, self.padding)
            d_pad = (0, 0)
        y = nn.Conv(self.features, (self.kernel_size,) * 3,
                    strides=(self.stride,) * 3,
                    padding=[d_pad] + [(self.padding, self.padding)] * 2,
                    use_bias=self.use_bias, dtype=self.dtype,
                    kernel_init=conv_kernel_init)(x)
        if self.batchnorm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.spatial_axis)(y)
        y = get_activation(self.act)(y)
        if self.residual:
            if self.spatial_axis is not None:
                x = x[:, self.padding:x.shape[1] - self.padding]
            y = y + x
        return y


class DeconvBlock(nn.Module):
    """ConvTranspose3d + optional BatchNorm + activation.

    With kernel==stride (the k2 s2 upsampler used throughout, unets.py:240-241)
    there is no output overlap and this matches torch ConvTranspose3d exactly.
    That also makes it shard-local under depth sharding (every output plane
    depends on exactly one input plane), so ``spatial_axis`` only routes the
    BatchNorm moment reduction.
    """
    features: int
    kernel_size: int = 2
    stride: int = 2
    use_bias: bool = True
    batchnorm: bool = False
    act: str = "ReLU"
    dtype: Any = None
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_axis is not None and self.kernel_size != self.stride:
            raise ValueError(
                "spatial sharding requires kernel == stride deconvs "
                f"(shard-local); got k={self.kernel_size} s={self.stride}")
        y = nn.ConvTranspose(self.features, (self.kernel_size,) * 3,
                             strides=(self.stride,) * 3,
                             padding="VALID",
                             use_bias=self.use_bias, dtype=self.dtype,
                             transpose_kernel=True,
                             kernel_init=conv_kernel_init)(x)
        if self.batchnorm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.spatial_axis)(y)
        y = get_activation(self.act)(y)
        return y


def max_pool_3d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """MaxPool3d(window) with floor semantics (torch default)."""
    return nn.max_pool(x, (window,) * 3, strides=(window,) * 3,
                       padding="VALID")
