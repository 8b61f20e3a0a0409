"""Physical-space image container — the pytree every pipeline stage touches.

The reference delegates image semantics to ITK (`itk.Image`): a voxel array
plus origin / spacing / direction defining the index→physical map
(used e.g. at oai_analysis/analysis_object.py:41, dask_processing.py:95-111).
Here the same semantics live in a small JAX pytree so whole pipelines —
resampling, warping, windowing — stay inside one `jit`.

Conventions (matching ITK so reference data round-trips exactly):
  * `data` is indexed [z, y, x] (the numpy view order of an ITK image).
  * `origin`, `spacing` are length-3 arrays in **x, y, z** order.
  * `direction` is a 3x3 matrix in x, y, z order (LPS physical space).
  * physical(x_index) = origin + direction @ (spacing * index_xyz)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _apply_3x3(m: jax.Array, v: jax.Array) -> jax.Array:
    """Apply a 3x3 matrix to (..., 3) vectors as explicit f32 elementwise math.

    Coordinate transforms must not be lowered onto the MXU (whose default
    bf16 inputs cost ~1e-2 absolute error on millimetre coordinates), so this
    deliberately avoids a matmul: three fused multiply-adds on the VPU.
    """
    v = v.astype(jnp.float32)
    m = m.astype(jnp.float32)
    return (
        v[..., 0:1] * m[:, 0]
        + v[..., 1:2] * m[:, 1]
        + v[..., 2:3] * m[:, 2]
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Image:
    """A 3D volume with ITK-style physical-space metadata."""

    data: jax.Array  # (D, H, W) indexed z, y, x
    origin: jax.Array  # (3,) xyz
    spacing: jax.Array  # (3,) xyz
    direction: jax.Array  # (3, 3) xyz

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    # -- coordinate transforms -------------------------------------------------

    def index_to_physical_matrix(self) -> jax.Array:
        """3x3 matrix M with physical = origin + M @ index_xyz."""
        return self.direction * self.spacing[None, :]

    def physical_to_index_matrix(self) -> jax.Array:
        return jnp.linalg.inv(self.index_to_physical_matrix())

    def indices_to_physical(self, idx_xyz: jax.Array) -> jax.Array:
        """Map continuous indices (..., 3) in xyz order to physical points."""
        m = self.index_to_physical_matrix()
        return _apply_3x3(m, idx_xyz) + self.origin

    def physical_to_indices(self, pts: jax.Array) -> jax.Array:
        """Map physical points (..., 3) to continuous xyz indices."""
        minv = self.physical_to_index_matrix()
        return _apply_3x3(minv, pts - self.origin)

    # -- convenience -----------------------------------------------------------

    def astype(self, dtype) -> "Image":
        return dataclasses.replace(self, data=self.data.astype(dtype))

    def with_data(self, data: jax.Array) -> "Image":
        """Same grid/metadata, new voxels (ITK CopyInformation equivalent,
        reference: image_transforms.py:515-517)."""
        return dataclasses.replace(self, data=data)

    def numpy(self) -> np.ndarray:
        return np.asarray(self.data)


def image_from_array(
    data,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    direction=None,
    dtype=None,
) -> Image:
    """Build an Image from a [z, y, x] array with xyz-ordered metadata."""
    arr = jnp.asarray(data, dtype=dtype)
    if direction is None:
        direction = jnp.eye(3, dtype=jnp.float32)
    return Image(
        data=arr,
        origin=jnp.asarray(origin, dtype=jnp.float32),
        spacing=jnp.asarray(spacing, dtype=jnp.float32),
        direction=jnp.asarray(direction, dtype=jnp.float32),
    )


def physical_grid(shape_zyx: Tuple[int, int, int], origin, spacing, direction) -> jax.Array:
    """Physical coordinates of every voxel of a grid, shape (D, H, W, 3) xyz.

    This is the output-grid generator for pullback resampling
    (reference semantics: itk.resample_image_filter at dask_processing.py:100-109).
    """
    d, h, w = shape_zyx
    zi = jnp.arange(d, dtype=jnp.float32)
    yi = jnp.arange(h, dtype=jnp.float32)
    xi = jnp.arange(w, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(zi, yi, xi, indexing="ij")
    idx_xyz = jnp.stack([xx, yy, zz], axis=-1)  # (D,H,W,3) xyz order
    m = jnp.asarray(direction, jnp.float32) * jnp.asarray(spacing, jnp.float32)[None, :]
    return _apply_3x3(m, idx_xyz) + jnp.asarray(origin, jnp.float32)
