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

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.Conv(self.features, (self.kernel_size,) * 3,
                    strides=(self.stride,) * 3,
                    padding=[(self.padding, self.padding)] * 3,
                    use_bias=self.use_bias, dtype=self.dtype,
                    kernel_init=conv_kernel_init)(x)
        if self.batchnorm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(y)
        y = get_activation(self.act)(y)
        if self.residual:
            y = y + x
        return y


class DeconvBlock(nn.Module):
    """ConvTranspose3d + optional BatchNorm + activation.

    With kernel==stride (the k2 s2 upsampler used throughout, unets.py:240-241)
    there is no output overlap and this matches torch ConvTranspose3d exactly.
    """
    features: int
    kernel_size: int = 2
    stride: int = 2
    use_bias: bool = True
    batchnorm: bool = False
    act: str = "ReLU"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.ConvTranspose(self.features, (self.kernel_size,) * 3,
                             strides=(self.stride,) * 3,
                             padding="VALID",
                             use_bias=self.use_bias, dtype=self.dtype,
                             transpose_kernel=True,
                             kernel_init=conv_kernel_init)(x)
        if self.batchnorm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(y)
        y = get_activation(self.act)(y)
        return y


def max_pool_3d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """MaxPool3d(window) with floor semantics (torch default)."""
    return nn.max_pool(x, (window,) * 3, strides=(window,) * 3,
                       padding="VALID")
