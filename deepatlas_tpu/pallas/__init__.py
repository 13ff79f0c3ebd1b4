"""Pallas TPU kernels for the hot ops (BASELINE.json north star).

``pallas_grid_sample`` / ``pallas_warp`` replace the XLA gather composition
of ops/warp.py on TPU, where XLA's generic gather lowering runs far off the
HBM roofline.  The XLA path remains the exactness reference and the fallback
for unbounded displacement fields and tiny volumes.
"""
from .warp import (clamp_displacement, displacement_overflow,
                   pallas_grid_sample, pallas_warp)
from .warp_lncc import warp_lncc_loss

__all__ = ["clamp_displacement", "displacement_overflow",
           "pallas_grid_sample", "pallas_warp", "warp_lncc_loss"]
