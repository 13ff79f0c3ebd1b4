"""Core volumetric ops: identity grids, warping, resizing, windowed sums."""
from .grid import identity_grid, identity_grid_batch, normalize_displacement
from .onehot import one_hot
from .resize import nearest_resize, trilinear_resize
from .warp import (clamp_displacement, displacement_overflow,
                   grid_sample, warp, warp_labels, warp_values_adjoint)
from .window import window_sum

__all__ = [
    "clamp_displacement",
    "displacement_overflow",
    "identity_grid", "identity_grid_batch", "normalize_displacement",
    "one_hot", "nearest_resize", "trilinear_resize",
    "grid_sample", "warp", "warp_labels", "warp_values_adjoint",
    "window_sum",
]
