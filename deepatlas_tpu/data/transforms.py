"""Host-side data transforms (numpy).

Capability parity with lib/transforms.py, re-based on numpy arrays in
``(z, y, x)`` = (D, H, W) index order (the array order SimpleITK hands the
reference, transforms.py:514-517) and channel-last tensors:

  * ``VolumeToArray``    — SitkToTensor (transforms.py:71-92): clamp image to
    [0,1] float32 with a trailing channel axis; segmentation to uint8.
  * ``CropVolume``       — CropTensor (transforms.py:124-158).
  * ``LeftToRight``      — OAI left-knee flip (transforms.py:269-284).
  * ``RandomCrop`` / ``BalancedRandomCrop`` — OAI patch sampling
    (transforms.py:322-505); crop sizes given in (D, H, W).
  * ``Partition``        — overlap-tile partition + ``assemble``
    (transforms.py:508-649) for sliding-window inference.
  * ``SegmentationLabelFilter`` — label zeroing (transforms.py:692-706).
  * ``Compose`` / ``IdentityTransform``.

Random *resampling* augmentations (B-spline, rigid, blur) are device-side
jit programs — see data/augment.py — replacing the reference's ITK filters.

Samples flow as dicts {'image': (D,H,W,1) float32, 'segmentation': (D,H,W)
uint8, 'name': str, ['spacing': (sx,sy,sz), 'like': NiftiImage]}.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

from .nifti import NiftiImage


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class IdentityTransform:
    def __call__(self, sample):
        return sample


class VolumeToArray:
    """NiftiImage -> numpy arrays; image clamped to [0, 1] float32 with a
    trailing channel axis, segmentation to uint8."""

    def __call__(self, sample):
        img = sample["image"]
        if isinstance(img, NiftiImage):
            sample["spacing"] = img.spacing
            sample["like"] = img
            img = img.data
        img = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
        if img.ndim == 3:
            img = img[..., None]
        sample["image"] = img
        if "segmentation" in sample and sample["segmentation"] is not None:
            seg = sample["segmentation"]
            if isinstance(seg, NiftiImage):
                seg = seg.data
            sample["segmentation"] = np.asarray(seg, dtype=np.uint8)
        return sample


class CropVolume:
    """Crop borders; ``crop_size`` is (d, h, w) symmetric or
    (d_lo, h_lo, w_lo, d_hi, h_hi, w_hi)."""

    def __init__(self, crop_size: Sequence[int]):
        crop_size = list(crop_size)
        if len(crop_size) == 3:
            self.crop = crop_size + crop_size
        elif len(crop_size) == 6:
            self.crop = crop_size
        else:
            raise ValueError("crop size should be of length 3 or 6, but "
                             f"{len(crop_size)} is given")

    def __call__(self, sample):
        c = self.crop
        img = sample["image"]
        d, h, w = img.shape[:3]
        sl = (slice(c[0], d - c[3]), slice(c[1], h - c[4]),
              slice(c[2], w - c[5]))
        sample["image"] = img[sl]
        if "segmentation" in sample and sample["segmentation"] is not None:
            sample["segmentation"] = sample["segmentation"][sl]
        return sample


class PadVolume:
    """Pad spatial dims up to a target (D, H, W) shape (TPU static-shape
    helper; images pad with 0 / edge, segmentation with 0)."""

    def __init__(self, target_shape: Sequence[int], mode: str = "constant"):
        self.target = tuple(target_shape)
        self.mode = mode

    def __call__(self, sample):
        img = sample["image"]
        pads = []
        for axis in range(3):
            extra = self.target[axis] - img.shape[axis]
            if extra < 0:
                raise ValueError(
                    f"PadVolume target {self.target} smaller than volume "
                    f"{img.shape[:3]}")
            pads.append((extra // 2, extra - extra // 2))
        sample["image"] = np.pad(img, pads + [(0, 0)], mode=self.mode)
        if "segmentation" in sample and sample["segmentation"] is not None:
            sample["segmentation"] = np.pad(sample["segmentation"], pads,
                                            mode="constant")
        return sample


class LeftToRight:
    """Flip LEFT-side scans along the first axis (OAI knees)."""

    def __call__(self, sample):
        if "LEFT" in sample.get("name", ""):
            sample["image"] = np.flip(sample["image"], axis=0).copy()
            seg = sample.get("segmentation")
            if seg is not None:
                sample["segmentation"] = np.flip(seg, axis=0).copy()
        return sample


class SegmentationLabelFilter:
    def __init__(self, ignore_labels: Sequence[int]):
        self.ignore_labels = list(ignore_labels)

    def __call__(self, sample):
        seg = sample.get("segmentation")
        if seg is not None:
            seg = seg.copy()
            for label in self.ignore_labels:
                seg[seg == label] = 0
            sample["segmentation"] = seg
        return sample


def _rand_start(rng, extent):
    return rng.randint(0, extent) if extent > 0 else 0


class RandomCrop:
    """Random ROI crop with a minimum foreground fraction
    (transforms.py:322-388); output_size in (D, H, W)."""

    def __init__(self, output_size: Union[int, Sequence[int]],
                 threshold: float = 0.0, random_state=None,
                 max_tries: int = 100):
        if isinstance(output_size, int):
            output_size = (output_size,) * 3
        self.size = tuple(output_size)
        self.threshold = threshold
        self.rng = random_state or np.random.RandomState()
        self.max_tries = max_tries

    def _crop_at(self, sample, start):
        sl = tuple(slice(s, s + n) for s, n in zip(start, self.size))
        out = dict(sample)
        out["image"] = sample["image"][sl]
        if sample.get("segmentation") is not None:
            out["segmentation"] = sample["segmentation"][sl]
        return out

    def __call__(self, sample):
        img = sample["image"]
        extent = [img.shape[i] - self.size[i] for i in range(3)]
        for _ in range(self.max_tries):
            start = [_rand_start(self.rng, e) for e in extent]
            out = self._crop_at(sample, start)
            seg = out.get("segmentation")
            if seg is None or self.threshold <= 0:
                return out
            if seg.sum() / seg.size > self.threshold:
                return out
        return out


class BalancedRandomCrop(RandomCrop):
    """Round-robin class-targeted patches (transforms.py:391-494): cycles
    through target classes 0..n_classes, requiring the current class to
    exceed its fraction threshold."""

    def __init__(self, output_size, threshold=0.01, n_classes: int = 3,
                 random_state=None, max_tries: int = 100):
        super().__init__(output_size, 0.0, random_state, max_tries)
        if isinstance(threshold, float):
            threshold = (threshold,) * n_classes
        self.thresholds = tuple(threshold)
        self.n_classes = n_classes
        self.current_class = min(2, n_classes - 1)

    def __call__(self, sample):
        img = sample["image"]
        extent = [img.shape[i] - self.size[i] for i in range(3)]
        target = self.current_class
        out = None
        for _ in range(self.max_tries):
            start = [_rand_start(self.rng, e) for e in extent]
            out = self._crop_at(sample, start)
            seg = out.get("segmentation")
            if seg is None or target == 0:
                break
            frac = np.mean(seg == target)
            if frac > self.thresholds[min(target, len(self.thresholds) - 1)]:
                break
        out["class"] = target
        self.current_class += 1
        if self.current_class > self.n_classes:
            self.current_class = 0
        return out


class Partition:
    """Overlap-tile partition of a volume for sliding-window inference
    (transforms.py:508-649).

    ``tile_size`` / ``overlap_size`` are (D, H, W).  ``__call__`` pads the
    volume (reflect) to a whole tile grid and returns the stacked tiles;
    ``assemble`` reassembles per-tile predictions, either by stitching the
    effective (non-overlap) centers or by per-label voting.
    """

    def __init__(self, tile_size: Sequence[int], overlap_size: Sequence[int],
                 padding_mode: str = "reflect", mode: str = "pred"):
        self.tile_size = np.asarray(tile_size, dtype=int)
        self.overlap_size = np.asarray(overlap_size, dtype=int)
        self.padding_mode = padding_mode
        self.mode = mode

    def __call__(self, sample):
        image = sample["image"]
        has_channel = image.ndim == 4
        img = image[..., 0] if has_channel else image
        self.image_size = np.array(img.shape)
        self.effective_size = self.tile_size - self.overlap_size * 2
        self.tiles_grid_size = np.ceil(
            self.image_size / self.effective_size).astype(int)
        self.padded_size = (self.effective_size * self.tiles_grid_size
                            + self.overlap_size * 2 - self.image_size)
        self.like = sample.get("like")

        pad = [(int(self.overlap_size[i]),
                int(self.padded_size[i] - self.overlap_size[i]))
               for i in range(3)]
        img_padded = np.pad(img, pad, mode=self.padding_mode)

        tiles = self._extract_tiles(img_padded, self.tile_size)
        sample = dict(sample)
        sample["image"] = tiles[..., None].astype(np.float32)

        seg = sample.get("segmentation")
        if seg is not None and self.mode == "eval":
            seg_padded = np.pad(seg, pad, mode=self.padding_mode)
            sample["segmentation"] = self._extract_tiles(seg_padded,
                                                         self.tile_size)
        return sample

    def _extract_tiles(self, padded, tile_size):
        g = self.tiles_grid_size
        e = self.effective_size
        tiles = []
        for i in range(g[0]):
            for j in range(g[1]):
                for k in range(g[2]):
                    tiles.append(padded[
                        i * e[0]:i * e[0] + tile_size[0],
                        j * e[1]:j * e[1] + tile_size[1],
                        k * e[2]:k * e[2] + tile_size[2]])
        return np.stack(tiles, axis=0)

    def assemble(self, tiles: np.ndarray, is_vote: bool = False,
                 crop_size: Optional[Sequence[int]] = None,
                 data_type=None, as_image: bool = False):
        """Reassemble per-tile label predictions to the original volume.

        Args:
          tiles: ``(N, D, H, W)`` predicted label tiles (tile order from
            ``__call__``).
          is_vote: per-voxel, per-label voting over overlapping tiles
            instead of center stitching.
          crop_size: optional (h, w, d)-style border zeroing (matches the
            reference's crop_size axis quirk at transforms.py:640).
        """
        tiles = np.asarray(tiles)
        g = self.tiles_grid_size
        e = self.effective_size
        o = self.overlap_size

        if is_vote:
            labels = np.unique(tiles)
            full = e * g + o * 2
            votes = np.zeros((labels.size,) + tuple(full), dtype=np.int32)
            for i in range(g[0]):
                for j in range(g[1]):
                    for k in range(g[2]):
                        ind = (i * g[1] + j) * g[2] + k
                        tile = tiles[ind]
                        for li, label in enumerate(labels):
                            mask = tile == label
                            votes[li,
                                  i * e[0]:i * e[0] + self.tile_size[0],
                                  j * e[1]:j * e[1] + self.tile_size[1],
                                  k * e[2]:k * e[2] + self.tile_size[2]] += mask
                        # NB: winning *index* mapped back through `labels`
            win = np.argmax(votes, axis=0)
            out = labels[win][o[0]:o[0] + self.image_size[0],
                              o[1]:o[1] + self.image_size[1],
                              o[2]:o[2] + self.image_size[2]].astype(np.uint8)
        else:
            out = np.zeros(tuple(e * g), dtype=tiles.dtype)
            for i in range(g[0]):
                for j in range(g[1]):
                    for k in range(g[2]):
                        ind = (i * g[1] + j) * g[2] + k
                        out[i * e[0]:(i + 1) * e[0],
                            j * e[1]:(j + 1) * e[1],
                            k * e[2]:(k + 1) * e[2]] = tiles[ind][
                            o[0]:self.tile_size[0] - o[0],
                            o[1]:self.tile_size[1] - o[1],
                            o[2]:self.tile_size[2] - o[2]]
            out = out[:self.image_size[0], :self.image_size[1],
                      :self.image_size[2]]

        if data_type is not None:
            out = out.astype(data_type)
        if crop_size:
            cropped = np.zeros_like(out)
            cz, cx, cy = crop_size[2], crop_size[0], crop_size[1]
            cropped[cz:-cz or None, cx:-cx or None, cy:-cy or None] = \
                out[cz:-cz or None, cx:-cx or None, cy:-cy or None]
            out = cropped
        if as_image:
            img = NiftiImage(data=out)
            if self.like is not None:
                img.copy_information(self.like)
            return img
        return out


class Resample:
    """Resample image + segmentation to a target voxel size
    (lib/transforms.py:9-57 capability).

    Output size per axis is ``ceil(old_spacing * old_size / new_spacing)``
    (the reference's formula).  The image resamples trilinearly via the
    native tier (numpy fallback); the segmentation resamples
    nearest-neighbour — a documented divergence from the reference, which
    runs *linear* interpolation on the label mask too (blending label ids);
    pass ``seg_interpolator="linear"`` for bit-faithful quirk parity.

    Must run before ``VolumeToArray`` does its channel/clamp work? No —
    it operates on the numpy (D, H, W[, 1]) arrays + the ``spacing`` key
    that ``VolumeToArray`` records, so compose it *after* VolumeToArray.
    """

    def __init__(self, voxel_size, seg_interpolator: str = "nearest"):
        if isinstance(voxel_size, (int, float)):
            voxel_size = (float(voxel_size),) * 3
        if len(voxel_size) != 3:
            raise ValueError("voxel_size must be a float or 3-tuple")
        self.voxel_size = tuple(float(v) for v in voxel_size)  # (sx, sy, sz)
        if seg_interpolator not in ("nearest", "linear"):
            raise ValueError("seg_interpolator must be nearest|linear")
        self.seg_interpolator = seg_interpolator

    @staticmethod
    def _trilinear(vol, out_shape):
        from ._native import resample_trilinear_native
        out = resample_trilinear_native(vol, out_shape)
        if out is not None:
            return out
        # numpy fallback: sample target voxel centers in the source grid
        sz, sy, sx = vol.shape
        dz, dy, dx = out_shape
        zc = (np.arange(dz) + 0.5) * (sz / dz) - 0.5
        yc = (np.arange(dy) + 0.5) * (sy / dy) - 0.5
        xc = (np.arange(dx) + 0.5) * (sx / dx) - 0.5

        def axis_idx(c, n):
            i0 = np.floor(c).astype(np.int64)
            t = c - i0
            return (np.clip(i0, 0, n - 1), np.clip(i0 + 1, 0, n - 1),
                    t.astype(np.float32))

        z0, z1, tz = axis_idx(zc, sz)
        y0, y1, ty = axis_idx(yc, sy)
        x0, x1, tx = axis_idx(xc, sx)
        v = vol
        c00 = v[z0][:, y0][:, :, x0] * (1 - tx) + v[z0][:, y0][:, :, x1] * tx
        c01 = v[z0][:, y1][:, :, x0] * (1 - tx) + v[z0][:, y1][:, :, x1] * tx
        c10 = v[z1][:, y0][:, :, x0] * (1 - tx) + v[z1][:, y0][:, :, x1] * tx
        c11 = v[z1][:, y1][:, :, x0] * (1 - tx) + v[z1][:, y1][:, :, x1] * tx
        c0 = c00 * (1 - ty[None, :, None]) + c01 * ty[None, :, None]
        c1 = c10 * (1 - ty[None, :, None]) + c11 * ty[None, :, None]
        return (c0 * (1 - tz[:, None, None])
                + c1 * tz[:, None, None]).astype(np.float32)

    @staticmethod
    def _nearest(vol, out_shape):
        from ._native import resample_nearest_native
        out = resample_nearest_native(vol, out_shape)
        if out is not None:
            return out
        sz, sy, sx = vol.shape
        dz, dy, dx = out_shape
        zi = np.clip(np.floor((np.arange(dz) + 0.5) * (sz / dz)).astype(
            np.int64), 0, sz - 1)
        yi = np.clip(np.floor((np.arange(dy) + 0.5) * (sy / dy)).astype(
            np.int64), 0, sy - 1)
        xi = np.clip(np.floor((np.arange(dx) + 0.5) * (sx / dx)).astype(
            np.int64), 0, sx - 1)
        return vol[zi][:, yi][:, :, xi]

    def __call__(self, sample):
        import math

        spacing = sample.get("spacing", (1.0, 1.0, 1.0))  # (sx, sy, sz)
        img = sample["image"]
        squeeze = img.ndim == 4
        vol = img[..., 0] if squeeze else img            # (D, H, W)
        sz, sy, sx = vol.shape
        # sizes are (x, y, z) in sitk convention; arrays are (z, y, x)
        new_sx = int(math.ceil(spacing[0] * sx / self.voxel_size[0]))
        new_sy = int(math.ceil(spacing[1] * sy / self.voxel_size[1]))
        new_sz = int(math.ceil(spacing[2] * sz / self.voxel_size[2]))
        out_shape = (new_sz, new_sy, new_sx)
        out = self._trilinear(np.asarray(vol, np.float32), out_shape)
        sample["image"] = out[..., None] if squeeze else out
        sample["spacing"] = self.voxel_size
        seg = sample.get("segmentation")
        if seg is not None:
            seg_f = np.asarray(seg, np.float32)
            if self.seg_interpolator == "nearest":
                res = self._nearest(seg_f, out_shape)
            else:
                res = self._trilinear(seg_f, out_shape)
            sample["segmentation"] = np.rint(res).astype(seg.dtype)
        return sample


class Normalization:
    """Zero-mean / unit-variance intensity normalization of the image
    (lib/transforms.py:59-68, sitk.NormalizeImageFilter capability).
    Runs on the numpy image via the native tier (numpy fallback)."""

    def __call__(self, sample):
        from ._native import normalize_native

        img = np.asarray(sample["image"], np.float32)
        out = normalize_native(img.reshape(-1), clamp01=False)
        if out is not None:
            sample["image"] = out.reshape(img.shape)
        else:
            mu = float(img.mean())
            sd = float(img.std())
            sample["image"] = (img - mu) / (sd + 1e-12)
        return sample


class BilateralFilter:
    """Edge-preserving bilateral smoothing of the image with probability
    ``ratio`` (lib/transforms.py:308-320, sitk.Bilateral capability).

    ``domain_sigma`` is the spatial gaussian sigma in voxels,
    ``range_sigma`` the intensity gaussian sigma; the range gaussian is
    evaluated through a sampled lookup table like ITK's
    numberOfRangeGaussianSamples."""

    def __init__(self, domain_sigma: float = 0.5, range_sigma: float = 0.06,
                 n_range_samples: int = 50, ratio: float = 1.0,
                 rng: Optional[np.random.RandomState] = None):
        self.domain_sigma = domain_sigma
        self.range_sigma = range_sigma
        self.n_range_samples = n_range_samples
        self.ratio = ratio
        self.rng = rng or np.random

    def _filter(self, vol):
        from ._native import bilateral_native

        out = bilateral_native(vol, self.domain_sigma, self.range_sigma,
                               self.n_range_samples)
        if out is not None:
            return out
        # numpy fallback (small volumes / no toolchain): brute-force window
        r = max(int(np.ceil(2.5 * self.domain_sigma)), 1)
        pad = np.pad(vol, r, mode="edge")
        num = np.zeros_like(vol)
        den = np.zeros_like(vol)
        inv_d = 1.0 / (2 * self.domain_sigma ** 2)
        inv_r = 1.0 / (2 * self.range_sigma ** 2)
        sz, sy, sx = vol.shape
        for dz in range(-r, r + 1):
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    sw = np.exp(-(dz * dz + dy * dy + dx * dx) * inv_d)
                    nb = pad[r + dz:r + dz + sz, r + dy:r + dy + sy,
                             r + dx:r + dx + sx]
                    wgt = sw * np.exp(-(nb - vol) ** 2 * inv_r)
                    num += wgt * nb
                    den += wgt
        return (num / np.maximum(den, 1e-12)).astype(np.float32)

    def __call__(self, sample):
        if float(self.rng.rand(1)[0]) >= self.ratio:
            return sample
        img = sample["image"]
        squeeze = img.ndim == 4
        vol = np.asarray(img[..., 0] if squeeze else img, np.float32)
        out = self._filter(vol)
        sample["image"] = out[..., None] if squeeze else out
        return sample
