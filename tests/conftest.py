"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY.md §4d: mesh
tests exercise shard_map DP on host CPU devices without TPUs).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(230)  # the reference's fixed seed (train_seg.py:36)
