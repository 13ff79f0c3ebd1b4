"""Device-mesh construction."""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices.

    The data-parallel axis rides ICI on a single host/pod slice; multi-host
    extension only changes the device list (``jax.devices()`` already spans
    hosts under ``jax.distributed``), not the consumers of the mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                f"available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
