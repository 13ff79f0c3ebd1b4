"""Native C++ I/O library vs the pure-Python reference implementations."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from deepatlas_tpu.data import _native
from deepatlas_tpu.data.nifti import NiftiImage, read_nifti, write_nifti
from deepatlas_tpu.ops import trilinear_resize

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason="native library not built")


@pytest.fixture
def vol(rng):
    return (rng.rand(13, 17, 19) * 100).astype(np.float32)


def test_read_matches_python_reader(tmp_path, vol):
    path = str(tmp_path / "v.nii.gz")
    write_nifti(path, NiftiImage(data=vol, spacing=(1.5, 2.0, 2.5)))
    py = read_nifti(path, prefer_native=False)
    res = _native.read_nifti_native(path)
    assert res is not None
    data, spacing, affine = res
    np.testing.assert_allclose(data, np.asarray(py.data, np.float32))
    np.testing.assert_allclose(spacing, py.spacing, rtol=1e-6)


def test_native_write_roundtrip(tmp_path, vol):
    path = str(tmp_path / "w.nii.gz")
    assert _native.write_nifti_native(path, vol, spacing=(2.0, 1.0, 3.0))
    back = read_nifti(path, prefer_native=False)
    np.testing.assert_allclose(np.asarray(back.data), vol)
    np.testing.assert_allclose(back.spacing, (2.0, 1.0, 3.0), rtol=1e-6)


def test_read_nifti_prefers_native(tmp_path, vol):
    path = str(tmp_path / "p.nii.gz")
    write_nifti(path, NiftiImage(data=vol))
    img = read_nifti(path)  # native path
    np.testing.assert_allclose(np.asarray(img.data, np.float32), vol)


def test_uint8_labels(tmp_path, rng):
    seg = rng.randint(0, 32, (9, 11, 13)).astype(np.uint8)
    path = str(tmp_path / "s.nii.gz")
    write_nifti(path, NiftiImage(data=seg))
    res = _native.read_nifti_native(path)
    data = res[0]
    np.testing.assert_array_equal(data.astype(np.uint8), seg)


def test_resample_matches_half_pixel_trilinear(vol):
    out = _native.resample_trilinear_native(vol, (7, 9, 29))
    ref = trilinear_resize(jnp.asarray(vol)[None, ..., None], (7, 9, 29),
                           align_corners=False)[0, ..., 0]
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-3, rtol=1e-4)


def test_normalize_matches_numpy(vol):
    out = _native.normalize_native(vol.copy(), clamp01=False)
    ref = (vol - vol.mean()) / vol.std()
    np.testing.assert_allclose(out, ref, atol=1e-4)
    clamped = _native.normalize_native(vol.copy(), clamp01=True)
    np.testing.assert_allclose(clamped, np.clip(ref, 0, 1), atol=1e-4)
