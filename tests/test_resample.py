"""Physical-space resampler tests: identity, affine exactness, scipy oracle,
and displacement-field semantics."""

import numpy as np
from scipy import ndimage

import jax.numpy as jnp

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.ops.resample import (
    DisplacementField,
    resample_image,
    sample_at_physical_points,
)


def _image(rng, shape=(10, 12, 14), **kw):
    return image_from_array(rng.standard_normal(shape).astype(np.float32), **kw)


class TestResample:
    def test_identity(self):
        rng = np.random.default_rng(0)
        img = _image(rng, origin=(3.0, -2.0, 1.0), spacing=(0.5, 0.7, 1.1))
        out = resample_image(img, img)
        np.testing.assert_allclose(np.asarray(out.data), np.asarray(img.data), atol=1e-5)

    def test_trilinear_exact_on_affine_function(self):
        """Trilinear interpolation reproduces affine functions of physical
        position exactly, for any direction matrix."""
        direction = np.array(
            [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], dtype=np.float32
        )
        shape = (8, 9, 10)
        origin, spacing = (5.0, -3.0, 2.0), (0.7, 0.36, 1.3)
        img0 = image_from_array(np.zeros(shape, np.float32), origin, spacing, direction)
        from oai_analysis_2_tpu.core.image import physical_grid

        grid = np.asarray(physical_grid(shape, img0.origin, img0.spacing, img0.direction))
        f = 2.0 * grid[..., 0] - 0.5 * grid[..., 1] + 3.0 * grid[..., 2] + 1.0
        img = img0.with_data(jnp.asarray(f, dtype=jnp.float32))

        rng = np.random.default_rng(1)
        idx = rng.uniform([0, 0, 0], [9, 8, 7], size=(200, 3)).astype(np.float32)  # xyz
        pts = img.indices_to_physical(jnp.asarray(idx))
        got = np.asarray(sample_at_physical_points(img, pts))
        expect = (
            2.0 * np.asarray(pts)[:, 0]
            - 0.5 * np.asarray(pts)[:, 1]
            + 3.0 * np.asarray(pts)[:, 2]
            + 1.0
        )
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-3)

    def test_matches_scipy_map_coordinates(self):
        rng = np.random.default_rng(2)
        img = _image(rng, shape=(12, 13, 14))
        idx_xyz = rng.uniform(0, 11, size=(300, 3)).astype(np.float32)
        pts = img.indices_to_physical(jnp.asarray(idx_xyz))
        got = np.asarray(sample_at_physical_points(img, pts))
        coords = np.stack([idx_xyz[:, 2], idx_xyz[:, 1], idx_xyz[:, 0]])  # zyx
        expect = ndimage.map_coordinates(np.asarray(img.data), coords, order=1, mode="grid-constant")
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_outside_returns_outside_value(self):
        rng = np.random.default_rng(3)
        img = _image(rng, shape=(4, 4, 4))
        pts = jnp.asarray([[100.0, 100.0, 100.0]])
        got = sample_at_physical_points(img, pts, outside_value=0.0)
        assert float(got[0]) == 0.0

    def test_constant_displacement_shifts(self):
        """Warping with a constant displacement d equals sampling the moving
        image at x + d (pullback)."""
        rng = np.random.default_rng(4)
        img = _image(rng, shape=(10, 11, 12), spacing=(1.0, 1.0, 1.0))
        shift = np.array([2.0, 0.0, 0.0], np.float32)  # +2 in physical x
        field = jnp.broadcast_to(jnp.asarray(shift), img.data.shape + (3,))
        disp = DisplacementField(
            field=field, origin=img.origin, spacing=img.spacing, direction=img.direction
        )
        out = np.asarray(resample_image(img, img, displacement=disp).data)
        # pullback: out[z,y,x] = img[z,y,x+2]
        np.testing.assert_allclose(out[:, :, :-2], np.asarray(img.data)[:, :, 2:], atol=1e-4)

    def test_resample_to_coarser_grid(self):
        rng = np.random.default_rng(5)
        img = _image(rng, shape=(8, 8, 8), spacing=(1.0, 1.0, 1.0))
        ref = image_from_array(np.zeros((4, 4, 4), np.float32), spacing=(2.0, 2.0, 2.0))
        out = np.asarray(resample_image(img, ref).data)
        np.testing.assert_allclose(out, np.asarray(img.data)[::2, ::2, ::2], atol=1e-5)


class TestSeparableFieldUpsample:
    """The fused warp's MXU path: when the output grid and the displacement
    grid are axis-aligned, the field upsample runs as three separable interp
    matmuls — it must agree exactly with the general gather path."""

    def _smooth_field(self, rng, shape, grid_img, amp=1.5):
        z, y, x = np.meshgrid(*[np.linspace(0, 3, s) for s in shape], indexing="ij")
        f = np.stack(
            [amp * np.sin(z + 0.3), amp * np.cos(y), amp * np.sin(x + 1.0)], axis=-1
        ).astype(np.float32)
        return DisplacementField(
            field=jnp.asarray(f), origin=grid_img.origin,
            spacing=grid_img.spacing, direction=grid_img.direction,
        )

    def test_separable_matches_general(self):
        from oai_analysis_2_tpu.ops.resample import (
            _separable_resize_weights,
            _warp_jit_general,
            _warp_jit_separable,
        )

        rng = np.random.default_rng(7)
        mov = _image(rng, shape=(14, 18, 16), spacing=(1.0, 1.0, 1.0))
        ref = image_from_array(
            np.zeros((12, 20, 16), np.float32), spacing=(1.1, 0.9, 1.2),
            origin=(0.5, -0.3, 0.2),
        )
        # coarse field grid spanning roughly the reference extent
        fgrid = image_from_array(
            np.zeros((5, 7, 6), np.float32), spacing=(3.2, 2.7, 3.1),
            origin=(0.5, -0.3, 0.2),
        )
        disp = self._smooth_field(rng, (5, 7, 6), fgrid)

        weights = _separable_resize_weights(disp, ref)
        assert weights is not None
        stacked = mov.data[..., None]
        got = np.asarray(
            _warp_jit_separable(stacked, mov, ref, disp.field, *weights, jnp.float32(0.0))
        )
        expect = np.asarray(_warp_jit_general(stacked, mov, ref, disp, jnp.float32(0.0)))
        np.testing.assert_allclose(got, expect, atol=2e-4)

    def test_non_axis_aligned_falls_back(self):
        from oai_analysis_2_tpu.ops.resample import _separable_resize_weights

        rng = np.random.default_rng(8)
        ref = image_from_array(np.zeros((6, 6, 6), np.float32))
        theta = 0.2
        rot = np.array(
            [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
            np.float32,
        )
        fgrid = image_from_array(np.zeros((6, 6, 6), np.float32), direction=rot)
        disp = self._smooth_field(rng, (6, 6, 6), fgrid)
        assert _separable_resize_weights(disp, ref) is None

    def test_resample_image_with_coarse_field_roundtrip(self):
        """End-to-end: resample_image through a coarse-grid field (the
        production shape: net-grid field, full-res output) stays close to
        the dense-field result."""
        rng = np.random.default_rng(9)
        mov = _image(rng, shape=(12, 12, 12), spacing=(1.0, 1.0, 1.0))
        ref = mov
        fgrid = image_from_array(np.zeros((6, 6, 6), np.float32), spacing=(2.2, 2.2, 2.2))
        disp = self._smooth_field(rng, (6, 6, 6), fgrid, amp=0.8)
        out = np.asarray(resample_image(mov, ref, displacement=disp).data)
        assert np.isfinite(out).all()
        # interior differs from un-warped (the field did something)...
        assert np.abs(out - np.asarray(mov.data)).max() > 0.05

    def test_bf16_gather_accuracy_on_probmaps(self):
        """bfloat16-gather warp (the production probmap setting) stays within
        4e-3 of the f32 warp on smooth [0,1] probability maps."""
        import jax.numpy as jnp

        from oai_analysis_2_tpu.ops.resample import resample_images

        rng = np.random.default_rng(11)
        z, y, x = np.meshgrid(*[np.linspace(0, 3, 14)] * 3, indexing="ij")
        prob = (0.5 + 0.5 * np.sin(z) * np.cos(y) * np.sin(x + 0.3)).astype(np.float32)
        mov = image_from_array(prob, spacing=(1.0, 1.0, 1.0))
        ref = image_from_array(np.zeros((14, 14, 14), np.float32), origin=(0.3, 0.2, 0.1))
        fgrid = image_from_array(np.zeros((6, 6, 6), np.float32), spacing=(2.6, 2.6, 2.6))
        disp = self._smooth_field(rng, (6, 6, 6), fgrid, amp=1.0)
        exact = np.asarray(resample_images([mov], ref, displacement=disp)[0].data)
        fast = np.asarray(
            resample_images([mov], ref, displacement=disp, compute_dtype=jnp.bfloat16)[0].data
        )
        assert fast.dtype == np.float32  # cast back to the input dtype
        np.testing.assert_allclose(fast, exact, atol=4e-3)
