"""Golden tests: separable windowed sums vs F.conv3d with a ones kernel."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deepatlas_tpu.ops import window_sum


@pytest.mark.parametrize("k,stride,dil", [(3, 1, 1), (9, 1, 1), (5, 2, 1),
                                          (4, 2, 2), (7, 2, 2)])
def test_window_sum_matches_conv3d(rng, k, stride, dil):
    x = rng.rand(2, 20, 21, 22, 1).astype(np.float32)
    ours = np.asarray(window_sum(jnp.asarray(x), k, stride, dil))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    kern = torch.ones(1, 1, k, k, k)
    ref = F.conv3d(xt, kern, padding=0, stride=stride, dilation=dil)
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1),
                               rtol=1e-5, atol=1e-3)


def test_window_sum_multichannel(rng):
    x = rng.rand(1, 12, 12, 12, 4).astype(np.float32)
    out = np.asarray(window_sum(jnp.asarray(x), 3))
    assert out.shape == (1, 10, 10, 10, 4)
    # channel independence: each channel equals its own single-channel result
    for c in range(4):
        single = np.asarray(window_sum(jnp.asarray(x[..., c:c + 1]), 3))
        np.testing.assert_allclose(out[..., c:c + 1], single, rtol=1e-6)
