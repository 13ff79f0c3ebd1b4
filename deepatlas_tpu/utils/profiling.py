"""Profiling and throughput observability.

The reference's tracing story is ad-hoc wall-clock prints and tqdm bars
(segmentation.py:133,183; lib/tools.py:274-282) plus an ``nvidia-smi``
memory probe (lib/tools.py:138-155).  TPU-native equivalents:

  * ``trace`` / ``annotate``     — ``jax.profiler`` traces viewable in
    TensorBoard/Perfetto, with named step annotations.
  * ``ThroughputMeter``          — steps/sec and volumes/sec/chip counters
    (the BASELINE.json headline metric), EMA-smoothed.
  * ``device_memory_stats``      — per-device HBM usage from the runtime
    (the ``get_gpu_memory_map`` equivalent).
  * ``sync`` — a *real* device fence: ``jax.block_until_ready`` can return
    early under the axon remote backend (measured), so timing helpers fence
    with a host transfer of a scalar dependency.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


def sync(x) -> None:
    """Block until ``x`` (array or pytree) is actually computed."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Dict[str, int]:
    """Live HBM stats for one device (bytes); empty if unsupported."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: int(stats[k]) for k in keys if k in stats}


class ThroughputMeter:
    """steps/sec and volumes/sec/chip counters with EMA smoothing."""

    def __init__(self, n_chips: int = 1, ema: float = 0.9):
        self.n_chips = max(n_chips, 1)
        self.ema = ema
        self._last: Optional[float] = None
        self._rate: Optional[float] = None
        self.steps = 0
        self.volumes = 0

    def start(self) -> None:
        self._last = time.perf_counter()

    def step(self, volumes: int = 1) -> None:
        """Record one completed step that processed ``volumes`` volumes."""
        now = time.perf_counter()
        self.steps += 1
        self.volumes += volumes
        if self._last is not None:
            dt = now - self._last
            if dt > 0:
                rate = volumes / dt
                self._rate = (rate if self._rate is None
                              else self.ema * self._rate
                              + (1 - self.ema) * rate)
        self._last = now

    @property
    def volumes_per_sec(self) -> float:
        return self._rate or 0.0

    @property
    def volumes_per_sec_per_chip(self) -> float:
        return (self._rate or 0.0) / self.n_chips

    def summary(self) -> Dict[str, float]:
        return {"steps": self.steps, "volumes": self.volumes,
                "volumes_per_sec": round(self.volumes_per_sec, 4),
                "volumes_per_sec_per_chip":
                    round(self.volumes_per_sec_per_chip, 4)}
