"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY.md §4d: mesh
tests exercise shard_map DP on host CPU devices without TPUs).
"""
import os

# force-override: the machine environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on host CPU with virtual devices.  Under the
# axon PJRT plugin the JAX_PLATFORMS / XLA_FLAGS env vars are ignored, so the
# jax.config knobs (applied before backend init) are the reliable switch.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# f32 parity tests against torch need full-precision convs/matmuls; the
# framework itself keeps JAX's fast default (bf16 passes on the TPU MXU).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(230)  # the reference's fixed seed (train_seg.py:36)
