"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY.md §4d: mesh
tests exercise shard_map DP on host CPU devices without TPUs).
"""
import os

# force-override: the machine environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on host CPU with virtual devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# f32 parity tests against torch need full-precision convs/matmuls; the
# framework itself keeps JAX's fast default (bf16 passes on the TPU MXU).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(230)  # the reference's fixed seed (train_seg.py:36)
