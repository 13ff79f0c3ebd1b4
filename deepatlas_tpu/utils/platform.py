"""Honor the standard JAX platform env switches under the axon plugin.

Users (and the test/driver harnesses) select the backend with
``JAX_PLATFORMS=cpu`` and size the virtual CPU mesh with
``XLA_FLAGS=--xla_force_host_platform_device_count=N``.  The axon PJRT
plugin ignores both env vars, so a CLI launched that way would still try
to initialize the TPU tunnel (and hang if it is down).  Calling
``honor_platform_env()`` before any jax use applies the equivalent
``jax.config`` knobs, which the plugin does respect.  A no-op when the
env vars are unset or the backend is already initialized.
"""
from __future__ import annotations

import os
import re


def honor_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        if "cpu" in plat:
            m = re.search(r"xla_force_host_platform_device_count=(\d+)",
                          os.environ.get("XLA_FLAGS", ""))
            if m:
                jax.config.update("jax_num_cpu_devices", int(m.group(1)))
    except RuntimeError:
        pass  # backend already initialized — leave it be
