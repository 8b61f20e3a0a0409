"""Physical-space trilinear resampling and displacement-field warping.

Replaces ITK's C++ ResampleImageFilter + DisplacementFieldTransform +
LinearInterpolateImageFunction (reference call sites:
dask_processing.py:95-111, test/test_all.py:43-51, FullDemo cells 6-7)
with fused XLA gathers that run on TPU and differentiate cleanly — the
same primitive is the inner loop of GradICON registration.

Semantics:
  * all interpolation happens in ITK physical space: an output voxel's
    physical point is pulled back through the transform, then converted to
    a continuous index of the moving image via its origin/spacing/direction;
  * points outside the moving image's buffered region produce
    `outside_value` (ITK resample default 0);
  * a displacement field maps T(x) = x + d(x), with d(x) trilinearly
    interpolated on the field's own grid and zero outside it (ITK
    DisplacementFieldTransform semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from oai_analysis_2_tpu.core.image import Image, physical_grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DisplacementField:
    """A dense displacement field on its own grid.

    `field` has shape (D, H, W, 3): an xyz-ordered physical-space
    displacement vector per voxel (z,y,x indexed grid, like Image.data).
    This is the TPU equivalent of the `phi_AB` ITK transform returned by
    icon_registration.itk_wrapper.register_pair (reference registration.py:25).
    """

    field: jax.Array  # (D, H, W, 3) xyz vectors
    origin: jax.Array  # (3,) xyz
    spacing: jax.Array  # (3,) xyz
    direction: jax.Array  # (3, 3)

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.field.shape[:3]

    def as_image_grid(self) -> Image:
        return Image(
            data=self.field[..., 0],
            origin=self.origin,
            spacing=self.spacing,
            direction=self.direction,
        )


def _shift_clamped(v: jnp.ndarray, axis: int) -> jnp.ndarray:
    """v advanced one step along `axis` with edge clamp: out[i] = v[min(i+1, n-1)]
    — the same semantics as the per-tap `min(i0+1, n-1)` index clamp."""
    n = v.shape[axis]
    head = lax.slice_in_dim(v, 1, n, axis=axis)
    tail = lax.slice_in_dim(v, n - 1, n, axis=axis)
    return jnp.concatenate([head, tail], axis=axis)


def _pack_neighborhood(volume: jnp.ndarray) -> jnp.ndarray:
    """(D,H,W,C) -> (D,H,W,8C): the 2x2x2 trilinear neighborhood packed into
    the channel dim, lane order [dz, dy, dx, c], built from clamped +1 shifts
    (a streaming concat — ~2 ms at production warp size)."""
    p = volume
    for ax in (2, 1, 0):
        p = jnp.concatenate([p, _shift_clamped(p, ax)], axis=-1)
    return p


def _trilinear_gather(
    volume: jnp.ndarray, idx_zyx: jnp.ndarray, outside_value: float,
    pack: bool = False,
):
    """Trilinear sample of a (D,H,W) or (D,H,W,C) volume at continuous
    (..., 3) z,y,x indices. Returns (..., [C]) samples; out-of-buffer -> outside.

    The 8 taps are FLAT 1-D gathers on the linearized volume: XLA-TPU's 1-D
    gather path is ~1.7x faster than the equivalent 3-D gather at production
    warp sizes (tools/profile_warp.py: 1875 -> 1099 ms for the 2-channel
    160x384x384 probmap warp), and windowed (2,2,2,C) block gathers are a
    non-starter (TPU tiled layouts pad the tiny trailing dims ~1000x, and the
    batch-last layouts that would fix that crash the TPU compiler at
    production size — tools/profile_warp_gather.py).

    pack=True additionally pre-packs the 2x2x2 neighborhood into the channel
    dim (`_pack_neighborhood`) so each output point needs ONE gather row of
    8C lanes instead of 8 rows of C: for the C=2 bf16 probmap warp each row
    is 32 B — exactly one HBM granule — measured 2.7x faster than the 8-tap
    form (tools/profile_warp_gather.py: 1102 -> 408 ms). Costs 8x the source
    volume's HBM (transient) and one streaming pack pass; used by the fused
    inference warp programs, not the differentiated registration path."""
    d, h, w = volume.shape[:3]
    z, y, x = idx_zyx[..., 0], idx_zyx[..., 1], idx_zyx[..., 2]

    # small tolerance so points that land exactly on the buffer edge (up to
    # float rounding, e.g. composed normalized coordinates) stay inside —
    # matching ITK's inclusive IsInsideBuffer boundary semantics
    eps = 1e-3
    inside = (
        (z >= -eps) & (z <= d - 1.0 + eps)
        & (y >= -eps) & (y <= h - 1.0 + eps)
        & (x >= -eps) & (x <= w - 1.0 + eps)
    )

    z0 = jnp.clip(jnp.floor(z), 0, d - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    fz = jnp.clip(z - z0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    fx = jnp.clip(x - x0, 0.0, 1.0)

    if pack and volume.ndim == 4 and 8 * volume.shape[3] <= 128:
        c = volume.shape[3]
        packed = _pack_neighborhood(volume).reshape(d * h * w, 8 * c)
        win = jnp.take(packed, (z0 * h + y0) * w + x0, axis=0)  # [dz,dy,dx,c]
        fzp, fyp, fxp = fz[..., None], fy[..., None], fx[..., None]
        cz = win[..., : 4 * c] * (1 - fzp) + win[..., 4 * c :] * fzp
        cy = cz[..., : 2 * c] * (1 - fyp) + cz[..., 2 * c :] * fyp
        out = cy[..., :c] * (1 - fxp) + cy[..., c:] * fxp
        return jnp.where(inside[..., None], out, outside_value)

    flat = volume.reshape((d * h * w,) + volume.shape[3:])

    def gather(zi, yi, xi):
        # indices are in-bounds by construction (clipped above)
        return jnp.take(flat, (zi * h + yi) * w + xi, axis=0)

    c000 = gather(z0, y0, x0)
    c001 = gather(z0, y0, x1)
    c010 = gather(z0, y1, x0)
    c011 = gather(z0, y1, x1)
    c100 = gather(z1, y0, x0)
    c101 = gather(z1, y0, x1)
    c110 = gather(z1, y1, x0)
    c111 = gather(z1, y1, x1)

    if volume.ndim == 4:
        fz, fy, fx = fz[..., None], fy[..., None], fx[..., None]
        inside_b = inside[..., None]
    else:
        inside_b = inside

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fz) + c1 * fz
    return jnp.where(inside_b, out, outside_value)


def sample_at_physical_points(
    image: Image, points_xyz: jnp.ndarray, outside_value: float = 0.0
) -> jnp.ndarray:
    """Trilinearly sample an Image at physical points (..., 3)."""
    idx_xyz = image.physical_to_indices(points_xyz)
    idx_zyx = idx_xyz[..., ::-1]
    return _trilinear_gather(image.data, idx_zyx, outside_value)


def sample_displacement(disp: DisplacementField, points_xyz: jnp.ndarray) -> jnp.ndarray:
    """Interpolate the displacement field at physical points; zero outside."""
    grid = disp.as_image_grid()
    idx_xyz = grid.physical_to_indices(points_xyz)
    idx_zyx = idx_xyz[..., ::-1]
    return _trilinear_gather(disp.field, idx_zyx, 0.0)


# -- fused warp programs ------------------------------------------------------
#
# The production warp (two 160x384x384 probmaps through phi_AB onto the atlas
# grid) was round 1's #3 stage cost (5.0 s) — almost entirely eager-dispatch
# overhead plus a second full trilinear gather to upsample the displacement
# field. Here the whole warp is ONE jitted program, and when the output grid
# and the field grid are axis-aligned (every real OAI case: both grids come
# from the same LPS-oriented scan geometry) the field upsample is three
# separable 1-D interpolation MATMULS riding the MXU instead of a 23.6M-point
# gather. The general (non-aligned) path stays as a fused gather.


def _interp_matrix(n_out: int, a: float, b: float, n_in: int, eps: float = 1e-3) -> np.ndarray:
    """(n_out, n_in) 1-D linear-interpolation weights for input index
    idx(i) = a*i + b; rows whose idx falls outside [-eps, n_in-1+eps] are
    all-zero (matching `_trilinear_gather`'s outside->0 for displacement
    sampling)."""
    idx = a * np.arange(n_out, dtype=np.float64) + b
    inside = (idx >= -eps) & (idx <= n_in - 1 + eps)
    i0 = np.clip(np.floor(idx), 0, n_in - 1).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = np.clip(idx - i0, 0.0, 1.0)
    w = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(w, (rows, i0), (1.0 - f) * inside)
    np.add.at(w, (rows, i1), f * inside)
    return w


def _separable_resize_weights(disp: DisplacementField, reference: Image):
    """Host-side: per-array-axis (z, y, x) interpolation matrices mapping the
    field grid onto `reference`'s grid, or None when the index map between
    the two grids is not axis-aligned (off-diagonal terms)."""
    m_ref = np.asarray(reference.direction, np.float64) * np.asarray(
        reference.spacing, np.float64
    )[None, :]
    m_fld = np.asarray(disp.direction, np.float64) * np.asarray(disp.spacing, np.float64)[
        None, :
    ]
    try:
        m_fld_inv = np.linalg.inv(m_fld)
    except np.linalg.LinAlgError:
        return None
    a = m_fld_inv @ m_ref  # xyz index map: idx_fld = a @ idx_ref + b
    b = m_fld_inv @ (
        np.asarray(reference.origin, np.float64) - np.asarray(disp.origin, np.float64)
    )
    diag = np.diag(a)
    if not np.allclose(a, np.diag(diag), atol=1e-9 + 1e-6 * np.abs(diag).max()):
        return None
    shp_ref, shp_fld = reference.data.shape, disp.field.shape[:3]
    # array axis 0 = z (xyz component 2), 1 = y, 2 = x
    return tuple(
        jnp.asarray(_interp_matrix(shp_ref[ax], diag[c], b[c], shp_fld[ax]))
        for ax, c in ((0, 2), (1, 1), (2, 0))
    )


def _upsample_field_separable(field: jax.Array, wz, wy, wx) -> jax.Array:
    """(Df,Hf,Wf,3) -> (Dr,Hr,Wr,3) trilinear resize as three einsum matmuls
    (f32 accumulation — displacement vectors are millimetre quantities)."""
    prec = jax.lax.Precision.HIGHEST
    out = jnp.einsum("zj,jklc->zklc", wz, field, precision=prec)
    out = jnp.einsum("yk,zklc->zylc", wy, out, precision=prec)
    return jnp.einsum("xl,zylc->zyxc", wx, out, precision=prec)


@jax.jit
def _warp_jit_separable(stacked, moving: Image, reference: Image, field, wz, wy, wx,
                        outside_value):
    pts = physical_grid(
        reference.data.shape, reference.origin, reference.spacing, reference.direction
    )
    pts = pts + _upsample_field_separable(field, wz, wy, wx)
    idx_zyx = moving.physical_to_indices(pts)[..., ::-1]
    return _trilinear_gather(stacked, idx_zyx, outside_value, pack=True)


@jax.jit
def _warp_jit_general(stacked, moving: Image, reference: Image,
                      displacement: Optional[DisplacementField], outside_value):
    pts = physical_grid(
        reference.data.shape, reference.origin, reference.spacing, reference.direction
    )
    if displacement is not None:
        pts = pts + sample_displacement(displacement, pts)
    idx_zyx = moving.physical_to_indices(pts)[..., ::-1]
    return _trilinear_gather(stacked, idx_zyx, outside_value, pack=True)


def _warp_stacked(stacked, moving: Image, reference: Image,
                  displacement: Optional[DisplacementField], outside_value: float):
    """Route one (D,H,W,C) stack through the best fused warp program."""
    if displacement is not None:
        weights = _separable_resize_weights(displacement, reference)
        if weights is not None:
            return _warp_jit_separable(
                stacked, moving, reference, displacement.field, *weights,
                jnp.float32(outside_value),
            )
    return _warp_jit_general(
        stacked, moving, reference, displacement, jnp.float32(outside_value)
    )


def resample_image(
    moving: Image,
    reference: Image,
    displacement: Optional[DisplacementField] = None,
    outside_value: float = 0.0,
) -> Image:
    """Pull back `moving` onto `reference`'s grid, optionally through a
    displacement transform — the TPU-native `itk.resample_image_filter(
    prob, transform=phi_AB, ...)` of dask_processing.py:100-109."""
    warped = _warp_stacked(
        moving.data[..., None], moving, reference, displacement, outside_value
    )[..., 0]
    return Image(
        data=warped.astype(moving.data.dtype),
        origin=reference.origin,
        spacing=reference.spacing,
        direction=reference.direction,
    )


def resample_with_displacement(
    moving: Image, displacement: DisplacementField, reference: Image
) -> Image:
    """Alias matching the reference's deform_probmap call shape
    (dask_processing.py:95-111)."""
    return resample_image(moving, reference, displacement)


def resample_images(
    movings,
    reference: Image,
    displacement: Optional[DisplacementField] = None,
    outside_value: float = 0.0,
    compute_dtype=None,
):
    """Warp several same-grid volumes in one fused pass: the output grid,
    displacement sampling, and gather indices are computed once and the
    sources gathered as channels (FC+TC probmaps share a knee grid — two
    separate resamples do all that work twice).

    compute_dtype=jnp.bfloat16 gathers the source voxels at half the HBM
    bandwidth (indices, interpolation weights and blending stay f32; only
    the 8 corner reads are bf16). For [0,1] probability maps the error is
    <~4e-3 absolute — far below the 0.5-level iso-surface sensitivity —
    making it the right production setting for probmap warps; outputs are
    cast back to each input's dtype."""
    first = movings[0]
    stacked = jnp.stack([m.data for m in movings], axis=-1)
    if compute_dtype is not None:
        stacked = stacked.astype(compute_dtype)
    warped = _warp_stacked(stacked, first, reference, displacement, outside_value)
    return [
        Image(
            data=warped[..., c].astype(movings[c].data.dtype),
            origin=reference.origin,
            spacing=reference.spacing,
            direction=reference.direction,
        )
        for c in range(len(movings))
    ]
