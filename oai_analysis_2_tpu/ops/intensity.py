"""Intensity ops — jnp equivalents of the ITK filters the reference leans on.

Replaces (reference call sites):
  * itk.IntensityWindowingImageFilter — dask_processing.py:10-26
  * itk.NormalizeImageFilter / CastImageFilter — dask_processing.py:38-43,63-73
  * itk.comparison_image_filter — test/test_all.py:32-33
  * itk.CheckerBoardImageFilter — notebooks/FullDemo.ipynb cell 6
"""

from __future__ import annotations

import jax.numpy as jnp

from oai_analysis_2_tpu.core.image import Image


def intensity_window(image: Image, window_min, window_max, out_min=0.0, out_max=1.0) -> Image:
    """Linear window/level rescale with clamping (ITK IntensityWindowingImageFilter)."""
    x = image.data.astype(jnp.float32)
    scale = (out_max - out_min) / jnp.maximum(window_max - window_min, 1e-20)
    y = (x - window_min) * scale + out_min
    y = jnp.clip(y, min(out_min, out_max), max(out_min, out_max))
    return image.with_data(y)


def percentile_window(
    image: Image,
    window_min_perc: float = 0.1,
    window_max_perc: float = 99.9,
    out_min: float = 0.0,
    out_max: float = 1.0,
) -> Image:
    """The reference's `image_normalize` (dask_processing.py:10-26): percentile
    window -> [out_min, out_max]."""
    x = image.data.astype(jnp.float32)
    lo = jnp.percentile(x, window_min_perc)
    hi = jnp.percentile(x, window_max_perc)
    return intensity_window(image, lo, hi, out_min, out_max)


def normalize_image(image: Image) -> Image:
    """Zero-mean unit-variance (ITK NormalizeImageFilter)."""
    x = image.data.astype(jnp.float32)
    return image.with_data((x - jnp.mean(x)) / jnp.maximum(jnp.std(x), 1e-20))


def comparison_sum(a: Image, b: Image) -> jnp.ndarray:
    """Summed absolute voxel difference — the reference's regression metric
    `np.sum(itk.comparison_image_filter(pred, golden))` (test_all.py:32-33)."""
    return jnp.sum(jnp.abs(a.data.astype(jnp.float32) - b.data.astype(jnp.float32)))


def checkerboard(a: Image, b: Image, pattern=(4, 4, 4)) -> Image:
    """Alternate blocks of two images (ITK CheckerBoardImageFilter) for
    qualitative registration review (FullDemo cell 6)."""
    d, h, w = a.data.shape
    pz, py, px = pattern[2], pattern[1], pattern[0]
    zi = (jnp.arange(d) * pz // max(d, 1)) % 2
    yi = (jnp.arange(h) * py // max(h, 1)) % 2
    xi = (jnp.arange(w) * px // max(w, 1)) % 2
    mask = (zi[:, None, None] + yi[None, :, None] + xi[None, None, :]) % 2
    return a.with_data(jnp.where(mask == 0, a.data, b.data.astype(a.data.dtype)))
