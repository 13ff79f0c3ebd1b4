"""Device-side random augmentation (jit-compiled resampling).

TPU-native replacements for the reference's ITK-filter augmentations:
  * ``random_bspline_warp``   — RandomBSplineTransform (transforms.py:161-200):
    random control-point displacements evaluated through the cardinal
    B-spline basis (orders 1-3; the reference's ITK BSplineTransform,
    default order 2) as separable basis matmuls, applied with our
    spatial transformer.
  * ``random_rigid_warp``     — RandomRigidTransform (transforms.py:202-260):
    random Euler rotations about the volume center + random translation,
    realized as an affine sampling grid.
  * ``gaussian_blur``         — GaussianBlur (transforms.py:293-306):
    separable Gaussian convolution.

All are pure functions of an explicit PRNG key (reproducible, vmappable,
fusable into the input pipeline) instead of stateful host-side filters.
Angles are degrees, translations voxels, matching the reference's parameter
conventions (stddev = value/2, transforms.py:230-236).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import grid_sample, identity_grid, normalize_displacement


def _bspline_basis(t: jnp.ndarray, order: int) -> jnp.ndarray:
    """Cardinal (uniform) B-spline basis of degree ``order`` (support
    width order+1): B_1 the tent, B_2 the C^1 quadratic, B_3 the C^2
    cubic ITK's BSplineTransform uses by default."""
    at = jnp.abs(t)
    if order == 1:
        return jnp.maximum(0.0, 1.0 - at)
    if order == 2:
        return jnp.where(at <= 0.5, 0.75 - at ** 2,
                         jnp.where(at <= 1.5, 0.5 * (at - 1.5) ** 2, 0.0))
    if order == 3:
        return jnp.where(
            at <= 1.0, 2.0 / 3.0 - at ** 2 + at ** 3 / 2.0,
            jnp.where(at <= 2.0, (2.0 - at) ** 3 / 6.0, 0.0))
    raise ValueError(f"bspline order must be 1, 2 or 3, got {order}")


def _bspline_axis_weights(size: int, cells: int, order: int) -> jnp.ndarray:
    """(size, cells+order) dense-evaluation matrix of the B-spline basis.

    ITK layout (BSplineTransformInitializer semantics, reference
    transforms.py:182): ``cells`` mesh cells spanning the volume extent,
    ``cells + order`` control points at cell coordinates
    ``j - (order-1)/2`` — every voxel sits in the full support of exactly
    ``order+1`` basis functions (partition of unity everywhere)."""
    u = jnp.arange(size, dtype=jnp.float32) / max(size - 1, 1) * cells
    pos = jnp.arange(cells + order, dtype=jnp.float32) - (order - 1) / 2.0
    return _bspline_basis(u[:, None] - pos[None, :], order)


@partial(jax.jit, static_argnames=("vol_shape", "mesh_size", "freeze_axes",
                                   "order", "random_mode"))
def random_bspline_field(key, vol_shape: Tuple[int, int, int],
                         mesh_size: Tuple[int, int, int] = (3, 3, 3),
                         deform_scale: float = 1.0,
                         freeze_axes: Tuple[int, ...] = (),
                         order: int = 2,
                         random_mode: str = "Normal",
                         ) -> jnp.ndarray:
    """Dense normalized displacement field from a random B-spline control
    grid — the ITK ``BSplineTransform`` deformation model (reference
    transforms.py:161-200) evaluated as three tiny separable basis matmuls.

    ``mesh_size`` counts mesh CELLS per axis (ITK semantics): the control
    grid has ``mesh + order`` points per axis.  ``order`` is the spline
    degree — 2 (C^1 quadratic) matches the reference's default
    ``bspline_order=2`` (transforms.py:167); 3 gives ITK's C^2 cubic; 1
    degrades to the trilinear surrogate (creases at cell boundaries).
    Control displacements are ``N(0, (deform_scale/2)^2)`` voxels
    (``random_mode='Normal'``, transforms.py:185-186) or
    ``U[0, deform_scale)`` (``'Uniform'``, transforms.py:187-188).

    Returns ``(D, H, W, 3)`` normalized displacement, last axis (x, y, z).
    """
    cpts = tuple(m + order for m in mesh_size)
    if random_mode == "Normal":
        ctrl = jax.random.normal(key, cpts + (3,)) * (deform_scale / 2.0)
    elif random_mode == "Uniform":
        ctrl = jax.random.uniform(key, cpts + (3,)) * deform_scale
    else:
        raise ValueError(f"random_mode must be 'Normal' or 'Uniform', got "
                         f"{random_mode!r}")
    for axis in freeze_axes:
        ctrl = ctrl.at[..., axis].set(0.0)
    wz, wy, wx = (_bspline_axis_weights(s, m, order)
                  for s, m in zip(vol_shape, mesh_size))
    dense = jnp.einsum("zi,yj,xk,ijkc->zyxc", wz, wy, wx, ctrl,
                       precision="highest")
    return normalize_displacement(dense)


@partial(jax.jit, static_argnames=())
def _warp_pair(image, seg, deform):
    warped_img = grid_sample(image[None], deform[None], mode="trilinear")[0]
    warped_seg = None
    if seg is not None:
        seg_vol = seg[None, ..., None].astype(deform.dtype)
        warped_seg = grid_sample(seg_vol, deform[None],
                                 mode="nearest")[0, ..., 0].astype(seg.dtype)
    return warped_img, warped_seg


def random_bspline_warp(key, image: jnp.ndarray,
                        seg: Optional[jnp.ndarray] = None,
                        mesh_size: Tuple[int, int, int] = (3, 3, 3),
                        deform_scale: float = 1.0,
                        ratio: float = 0.5,
                        freeze_axes: Tuple[int, ...] = (),
                        order: int = 2,
                        random_mode: str = "Normal"):
    """Randomly B-spline-warp ``image`` (trilinear) and ``seg`` (nearest)
    with probability ``ratio``.

    Args:
      image: ``(D, H, W, C)``; seg: ``(D, H, W)`` or None.
    """
    k_apply, k_field = jax.random.split(key)
    disp = random_bspline_field(k_field, image.shape[:3], mesh_size,
                                deform_scale, freeze_axes, order,
                                random_mode)
    apply = jax.random.uniform(k_apply) < ratio
    disp = jnp.where(apply, disp, jnp.zeros_like(disp))
    deform = disp + identity_grid(image.shape[:3], dtype=disp.dtype)
    return _warp_pair(image, seg, deform)


def _euler_matrix(rx, ry, rz):
    """Rotation matrix Rz @ Ry @ Rx acting on (x, y, z) coordinates."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    r_x = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    r_y = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    r_z = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return r_z @ r_y @ r_x


def random_rigid_warp(key, image: jnp.ndarray,
                      seg: Optional[jnp.ndarray] = None,
                      rotation_angles: Sequence[float] = (0.0, 0.0, 0.0),
                      translation: Sequence[float] = (0.0, 0.0, 0.0),
                      ratio: float = 1.0, mode: str = "both"):
    """Random rigid (Euler rotation + translation) resampling.

    ``rotation_angles`` are per-axis degree scales (sampled N(0, a/2) like
    transforms.py:230-232), ``translation`` per-axis voxel scales.
    ``mode``: 'both' | 'img' | 'seg' (transforms.py:245-253).
    """
    d, h, w = image.shape[:3]
    keys = jax.random.split(key, 3)
    angles = jax.random.normal(keys[0], (3,)) \
        * (jnp.asarray(rotation_angles) / 2.0) * (jnp.pi / 180.0)
    trans_vox = jax.random.normal(keys[1], (3,)) \
        * (jnp.asarray(translation, dtype=jnp.float32) / 2.0)
    rot = _euler_matrix(angles[0], angles[1], angles[2])

    grid = identity_grid((d, h, w))          # (D,H,W,3), (x,y,z) in [-1,1]
    # rotate about the center (normalized coords are already centered),
    # then translate (voxels -> normalized units)
    half = jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0, (d - 1) / 2.0])
    rotated = jnp.einsum("dhwc,rc->dhwr", grid, rot)
    deform = rotated + trans_vox / half

    apply = jax.random.uniform(keys[2]) < ratio
    deform = jnp.where(apply, deform, grid)

    warped_img, warped_seg = _warp_pair(image, seg, deform)
    if mode == "img":
        warped_seg = seg
    elif mode == "seg":
        warped_img = image
    elif mode != "both":
        raise ValueError(f"Wrong rigid transformation mode :{mode}!")
    return warped_img, warped_seg


@partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_blur(image: jnp.ndarray, sigma: float = 0.7,
                  truncate: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur of a ``(D, H, W, C)`` volume."""
    radius = max(1, int(truncate * sigma + 0.5))
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * (offs / sigma) ** 2)
    kern = kern / kern.sum()
    out = image
    for axis in range(3):
        moved = jnp.moveaxis(out, axis, -1)
        padded = jnp.pad(moved, [(0, 0)] * 3 + [(radius, radius)],
                         mode="edge")
        conv = jax.vmap(lambda row: jnp.convolve(row, kern, mode="valid"))
        flat = padded.reshape(-1, padded.shape[-1])
        moved = conv(flat).reshape(moved.shape)
        out = jnp.moveaxis(moved, -1, axis)
    return out


def make_augmenter(config: dict):
    """Config-driven batch augmenter for the experiments.

    The reference composes its random transforms per experiment
    (models/segmentation.py:63-64); here a config dict enables the
    device-side equivalents, e.g.::

        {"bspline": {"mesh_size": [3, 3, 3], "deform_scale": 2.0,
                     "ratio": 0.5},
         "rigid":   {"rotation_angles": [5, 5, 5],
                     "translation": [2, 2, 2], "ratio": 0.5,
                     "mode": "both"},
         "blur":    {"sigma": 0.7, "ratio": 0.3}}

    Returns ``augment(key, images (B,D,H,W,C), segs (B,D,H,W) | None) ->
    (images, segs)`` applying the enabled augmentations per batch element
    (independent keys), or ``None`` when the config is empty/falsy.
    """
    if not config:
        return None
    bspline = config.get("bspline")
    rigid = config.get("rigid")
    blur = config.get("blur")

    def augment_one(key, image, seg):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if bspline:
            image, seg = random_bspline_warp(
                k1, image, seg,
                mesh_size=tuple(bspline.get("mesh_size", (3, 3, 3))),
                deform_scale=bspline.get("deform_scale", 1.0),
                ratio=bspline.get("ratio", 0.5),
                freeze_axes=tuple(bspline.get("freeze_axes", ())),
                order=bspline.get("order",
                                  bspline.get("bspline_order", 2)),
                random_mode=bspline.get("random_mode", "Normal"))
        if rigid:
            image, seg = random_rigid_warp(
                k2, image, seg,
                rotation_angles=tuple(rigid.get("rotation_angles",
                                                (0.0, 0.0, 0.0))),
                translation=tuple(rigid.get("translation", (0.0, 0.0, 0.0))),
                ratio=rigid.get("ratio", 1.0),
                mode=rigid.get("mode", "both"))
        if blur:
            blurred = gaussian_blur(image, sigma=blur.get("sigma", 0.7))
            apply = jax.random.uniform(k3) < blur.get("ratio", 1.0)
            image = jnp.where(apply, blurred, image)
        del k4
        return image, seg

    # one jitted vmap over per-element fold_in keys — a single device
    # program per batch instead of B sequential calls (which would
    # serialize all augmentations on one device before DP sharding)
    aug_img_seg = jax.jit(jax.vmap(augment_one))
    aug_img = jax.jit(jax.vmap(lambda k, img: augment_one(k, img, None)[0]))

    def augment(key, images, segs=None):
        b = images.shape[0]
        keys = jax.vmap(partial(jax.random.fold_in, key))(jnp.arange(b))
        if segs is None:
            return aug_img(keys, images), None
        return aug_img_seg(keys, images, segs)

    return augment
