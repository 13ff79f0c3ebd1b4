"""ctypes bindings for the native I/O library (native/deepatlas_io.cpp).

The native tier mirrors what the reference delegates to SimpleITK's C++
(NIfTI read, axis-aligned resampling, normalization — lib/datasets.py:117-121,
lib/transforms.py:9-92).  The library auto-builds with g++ on first use and
every entry point has a pure-Python fallback, so the package works without a
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libdeepatlas_io.so")

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.da_nifti_header.argtypes = [ctypes.c_char_p, i32p, f32p, i32p]
    lib.da_nifti_header.restype = ctypes.c_int
    lib.da_nifti_read_f32.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64,
                                      f32p, f32p]
    lib.da_nifti_read_f32.restype = ctypes.c_int
    lib.da_nifti_write.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_int32, f32p,
                                   ctypes.c_int]
    lib.da_nifti_write.restype = ctypes.c_int
    lib.da_resample_nearest.argtypes = [f32p] + [ctypes.c_int32] * 3 + \
        [f32p] + [ctypes.c_int32] * 3
    lib.da_resample_nearest.restype = None
    lib.da_bilateral.argtypes = [f32p, f32p] + [ctypes.c_int32] * 3 + \
        [ctypes.c_float, ctypes.c_float, ctypes.c_int32]
    lib.da_bilateral.restype = None
    lib.da_resample_trilinear.argtypes = [f32p] + [ctypes.c_int32] * 3 + \
        [f32p] + [ctypes.c_int32] * 3
    lib.da_resample_trilinear.restype = None
    lib.da_normalize.argtypes = [f32p, ctypes.c_int64, ctypes.c_int]
    lib.da_normalize.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_nifti_native(path: str):
    """Native NIfTI read -> (data (z,y,x) float32, spacing, affine) or None
    when the library (or the file's encoding) is unsupported."""
    lib = _load()
    if lib is None:
        return None
    dims = np.zeros(8, np.int32)
    pixdim = np.zeros(8, np.float32)
    dtype_code = np.zeros(1, np.int32)
    rc = lib.da_nifti_header(
        path.encode(), dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pixdim.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dtype_code.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    ndim = int(dims[0])
    if ndim < 3 or ndim > 5:
        return None
    shape_xyz = [int(dims[i]) for i in range(1, ndim + 1)]
    n = int(np.prod(shape_xyz))
    out = np.empty(n, np.float32)
    spacing = np.zeros(3, np.float32)
    affine = np.zeros(16, np.float32)
    rc = lib.da_nifti_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        affine.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        return None
    # NIfTI stores x fastest -> C-view is (..., z, y, x); squeeze trailing
    data = out.reshape(tuple(reversed(shape_xyz)))
    while data.ndim > 3 and data.shape[0] == 1:
        data = data[0]
    return data, tuple(float(s) for s in spacing), affine.reshape(4, 4)


def write_nifti_native(path: str, data: np.ndarray,
                       spacing: Tuple[float, float, float] = (1., 1., 1.),
                       as_uint8: bool = False) -> bool:
    lib = _load()
    if lib is None:
        return False
    d = np.ascontiguousarray(data, np.float32)
    nz, ny, nx = d.shape
    sp = np.asarray(spacing, np.float32)
    rc = lib.da_nifti_write(
        path.encode(), d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, sp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if as_uint8 else 0)
    return rc == 0


def resample_trilinear_native(vol: np.ndarray,
                              out_shape: Tuple[int, int, int]
                              ) -> Optional[np.ndarray]:
    """Resample (z, y, x) float32 volume to out_shape (z, y, x)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(vol, np.float32)
    sz, sy, sx = src.shape
    dz, dy, dx = out_shape
    dst = np.empty((dz, dy, dx), np.float32)
    lib.da_resample_trilinear(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sx, sy, sz,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dx, dy, dz)
    return dst


def normalize_native(vol: np.ndarray, clamp01: bool = True
                     ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(vol, np.float32)
    lib.da_normalize(v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     v.size, 1 if clamp01 else 0)
    return v


def resample_nearest_native(vol: np.ndarray,
                            out_shape: Tuple[int, int, int]
                            ) -> Optional[np.ndarray]:
    """Nearest-neighbour resample (label masks) to out_shape (z, y, x)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(vol, np.float32)
    sz, sy, sx = src.shape
    dz, dy, dx = out_shape
    dst = np.empty((dz, dy, dx), np.float32)
    lib.da_resample_nearest(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sx, sy, sz,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dx, dy, dz)
    return dst


def bilateral_native(vol: np.ndarray, domain_sigma: float,
                     range_sigma: float,
                     n_range_samples: int = 50) -> Optional[np.ndarray]:
    """3-D bilateral filter (z, y, x) float32."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(vol, np.float32)
    sz, sy, sx = src.shape
    dst = np.empty_like(src)
    lib.da_bilateral(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sx, sy, sz, float(domain_sigma), float(range_sigma),
        int(n_range_samples))
    return dst
