"""Unit tests for the core imaging layer: Image pytree, NIfTI I/O, intensity ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from oai_analysis_2_tpu.core.image import Image, image_from_array, physical_grid
from oai_analysis_2_tpu.core.nifti import read_nifti, write_nifti
from oai_analysis_2_tpu.ops.intensity import (
    checkerboard,
    comparison_sum,
    intensity_window,
    normalize_image,
    percentile_window,
)


def _random_image(rng, shape=(5, 6, 7)):
    direction = np.array(
        [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=np.float32
    )
    return image_from_array(
        rng.standard_normal(shape).astype(np.float32),
        origin=(10.0, -4.0, 2.5),
        spacing=(0.7, 0.36, 0.36),
        direction=direction,
    )


class TestImage:
    def test_physical_roundtrip(self):
        rng = np.random.default_rng(0)
        img = _random_image(rng)
        idx = jnp.asarray(rng.uniform(0, 4, size=(11, 3)), dtype=jnp.float32)
        pts = img.indices_to_physical(idx)
        back = img.physical_to_indices(pts)
        np.testing.assert_allclose(np.asarray(back), np.asarray(idx), atol=1e-4)

    def test_physical_grid_matches_pointwise(self):
        rng = np.random.default_rng(1)
        img = _random_image(rng, shape=(3, 4, 5))
        grid = physical_grid(img.data.shape, img.origin, img.spacing, img.direction)
        # voxel (z=2, y=1, x=3) -> index xyz (3, 1, 2)
        expect = img.indices_to_physical(jnp.array([3.0, 1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(grid[2, 1, 3]), np.asarray(expect), atol=1e-5)

    def test_pytree(self):
        import jax

        rng = np.random.default_rng(2)
        img = _random_image(rng)
        doubled = jax.jit(lambda im: im.with_data(im.data * 2))(img)
        np.testing.assert_allclose(np.asarray(doubled.data), 2 * np.asarray(img.data), rtol=1e-6)


class TestNifti:
    @pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
    def test_roundtrip(self, tmp_path, suffix):
        rng = np.random.default_rng(3)
        img = _random_image(rng, shape=(4, 5, 6))
        path = tmp_path / f"vol{suffix}"
        write_nifti(img, path)
        back = read_nifti(path)
        np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.origin), np.asarray(img.origin), atol=1e-5)
        np.testing.assert_allclose(np.asarray(back.spacing), np.asarray(img.spacing), atol=1e-5)
        np.testing.assert_allclose(np.asarray(back.direction), np.asarray(img.direction), atol=1e-5)

    def test_int16_with_scaling(self, tmp_path):
        # Hand-build an int16 file and verify scl_slope/inter handling.
        img = image_from_array(np.arange(24).reshape(2, 3, 4).astype(np.int16))
        path = tmp_path / "int.nii"
        write_nifti(img, path)
        back = read_nifti(path)
        np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data))

    def test_identity_affine_when_no_codes(self, tmp_path):
        img = image_from_array(np.zeros((2, 2, 2), np.float32), spacing=(2.0, 3.0, 4.0))
        path = tmp_path / "sp.nii.gz"
        write_nifti(img, path)
        back = read_nifti(path)
        np.testing.assert_allclose(np.asarray(back.spacing), [2.0, 3.0, 4.0], atol=1e-5)


class TestIntensity:
    def test_percentile_window_matches_reference_semantics(self):
        # Oracle: the reference's image_normalize (dask_processing.py:10-26)
        rng = np.random.default_rng(4)
        arr = rng.uniform(-50, 3000, size=(8, 9, 10)).astype(np.float32)
        img = image_from_array(arr)
        out = percentile_window(img, 0.1, 99.9, 0.0, 1.0)
        lo, hi = np.percentile(arr, 0.1), np.percentile(arr, 99.9)
        expect = np.clip((arr - lo) / (hi - lo), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(out.data), expect, atol=1e-4)

    def test_intensity_window_clamps(self):
        img = image_from_array(np.array([[[-1.0, 0.0, 5.0, 10.0, 20.0]]], np.float32))
        out = intensity_window(img, 0.0, 10.0, 0.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(out.data), [[[0.0, 0.0, 0.5, 1.0, 1.0]]], atol=1e-6
        )

    def test_normalize(self):
        rng = np.random.default_rng(5)
        img = image_from_array(rng.uniform(0, 100, (6, 6, 6)).astype(np.float32))
        out = np.asarray(normalize_image(img).data)
        assert abs(out.mean()) < 1e-4
        assert abs(out.std() - 1.0) < 1e-3

    def test_comparison_sum(self):
        a = image_from_array(np.ones((3, 3, 3), np.float32))
        b = image_from_array(np.zeros((3, 3, 3), np.float32))
        assert float(comparison_sum(a, b)) == 27.0

    def test_checkerboard_mixes_both(self):
        a = image_from_array(np.zeros((8, 8, 8), np.float32))
        b = image_from_array(np.ones((8, 8, 8), np.float32))
        out = np.asarray(checkerboard(a, b).data)
        assert 0.0 < out.mean() < 1.0


class TestZarr:
    def test_roundtrip(self, tmp_path):
        from oai_analysis_2_tpu.utils.zarr_io import read_zarr_volume, write_zarr_volume

        rng = np.random.default_rng(7)
        img = _random_image(rng, shape=(9, 17, 33))
        write_zarr_volume(img, tmp_path / "vol.zarr", chunk=(4, 8, 16))
        back = read_zarr_volume(tmp_path / "vol.zarr")
        np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.spacing), np.asarray(img.spacing), atol=1e-5)
        np.testing.assert_allclose(np.asarray(back.direction), np.asarray(img.direction), atol=1e-5)
