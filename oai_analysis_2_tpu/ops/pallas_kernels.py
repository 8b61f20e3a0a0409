"""Hand-written Pallas TPU kernels for the geometry hot paths.

`point_triangle_distance_pallas` — exact point-to-triangle-mesh distance
(the cartilage-thickness kernel, replacing vtkDistancePolyDataFilter,
reference mesh_processing.py:310-321). Layout is chosen for the VPU:

  * a (TP, 1) tile of point coordinates broadcast along lanes,
  * a (1, TT) tile of triangle data broadcast along sublanes,
  * all arithmetic on (TP, TT) f32 tiles (pure element-wise VPU work,
    no gathers), with a running min over the triangle-tile grid axis.

Grid: (num_point_tiles, num_tri_tiles); the output block depends only on
the point tile, so the min accumulates in VMEM across the inner grid axis
(the canonical Pallas reduction pattern).

Falls back transparently (mesh/ops.py dispatches) when Pallas/TPU is
unavailable; parity with the XLA implementation is pinned by
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TP = 128  # points per tile (sublanes)
TT = 512  # triangles per tile (lanes)
_TINY = 1e-30


def _dist_kernel(pts_ref, tri_ref, out_ref):
    j = pl.program_id(1)

    px = pts_ref[:, 0:1]
    py = pts_ref[:, 1:2]
    pz = pts_ref[:, 2:3]

    def row(r):
        return tri_ref[r : r + 1, :]

    ax, ay, az = row(0), row(1), row(2)
    bx, by, bz = row(3), row(4), row(5)
    cx, cy, cz = row(6), row(7), row(8)

    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az
    # triangle normal (1, TT)
    nx = aby * acz - abz * acy
    ny = abz * acx - abx * acz
    nz = abx * acy - aby * acx
    nn = nx * nx + ny * ny + nz * nz

    apx, apy, apz = px - ax, py - ay, pz - az  # (TP, TT)
    t = apx * nx + apy * ny + apz * nz
    plane_d2 = (t * t) / jnp.maximum(nn, _TINY)

    # inside-projection test via triple products with n
    bpx, bpy, bpz = bx - px, by - py, bz - pz
    cpx, cpy, cpz = cx - px, cy - py, cz - pz
    apx2, apy2, apz2 = -apx, -apy, -apz  # a - p
    d1 = (bpy * cpz - bpz * cpy) * nx + (bpz * cpx - bpx * cpz) * ny + (bpx * cpy - bpy * cpx) * nz
    d2 = (cpy * apz2 - cpz * apy2) * nx + (cpz * apx2 - cpx * apz2) * ny + (cpx * apy2 - cpy * apx2) * nz
    d3 = (apy2 * bpz - apz2 * bpy) * nx + (apz2 * bpx - apx2 * bpz) * ny + (apx2 * bpy - apy2 * bpx) * nz
    inside = (d1 >= 0) & (d2 >= 0) & (d3 >= 0) & (nn > _TINY)

    def seg_d2(ux, uy, uz, vx, vy, vz):
        wx, wy, wz = vx - ux, vy - uy, vz - uz
        ww = jnp.maximum(wx * wx + wy * wy + wz * wz, _TINY)
        tt = jnp.clip(((px - ux) * wx + (py - uy) * wy + (pz - uz) * wz) / ww, 0.0, 1.0)
        dx = px - (ux + tt * wx)
        dy = py - (uy + tt * wy)
        dz = pz - (uz + tt * wz)
        return dx * dx + dy * dy + dz * dz

    edge = jnp.minimum(
        seg_d2(ax, ay, az, bx, by, bz),
        jnp.minimum(seg_d2(bx, by, bz, cx, cy, cz), seg_d2(cx, cy, cz, ax, ay, az)),
    )
    d2_all = jnp.where(inside, plane_d2, edge)  # (TP, TT)
    tile_min = jnp.min(d2_all, axis=1, keepdims=True)  # (TP, 1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = tile_min

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.minimum(out_ref[:], tile_min)


try:  # Pallas import is deferred-safe: CPU test envs still import this module
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # noqa: BLE001
    _HAVE_PALLAS = False


@functools.partial(jax.jit, static_argnames=())
def _distance_pallas(points: jax.Array, tris: jax.Array) -> jax.Array:
    """points (Np, 3) f32, Np % TP == 0; tris (9, Nt) f32, Nt % TT == 0.
    Returns (Np, 1) min squared distances."""
    n_p, n_t = points.shape[0], tris.shape[1]
    grid = (n_p // TP, n_t // TT)
    return pl.pallas_call(
        _dist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TP, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, 1), jnp.float32),
    )(points, tris)


def pallas_available() -> bool:
    if not _HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def point_triangle_distance_pallas_async(
    points: np.ndarray, triangles: np.ndarray, device=None
):
    """Dispatch the distance kernel WITHOUT a host sync: returns
    (device (P_padded,) distances, n). Callers batching many meshes pull
    all results after dispatching everything — each early np.asarray is a
    full tunnel round trip that serializes device compute behind host
    transfers.

    `device`: a jax.Device to run on (committed-input placement). A B-knee
    batch dispatches knee i's distance kernels to device i, so on a
    multi-chip mesh the distance substage runs knee-parallel like the
    grouped smoothing."""
    import jax

    from oai_analysis_2_tpu.ops.bucketing import bucket_size, pad_rows

    p = np.asarray(points, np.float32)
    n = len(p)
    pp = pad_rows(p, bucket_size(max(n, TP)))
    tri = np.asarray(triangles, np.float32).reshape(-1, 9)
    tt = pad_rows(tri, bucket_size(max(len(tri), TT)), fill=1e8).T.copy()
    if device is not None:
        pp, tt = jax.device_put((pp, tt), device)
    d2 = _distance_pallas(jnp.asarray(pp), jnp.asarray(tt))
    return jnp.sqrt(d2[:, 0]), n


def point_triangle_distance_pallas(points: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """points (P, 3); triangles (F, 3, 3). Returns (P,) unsigned distances.
    Inputs are padded to tile multiples here (padding triangles far away,
    padding points arbitrary — sliced off)."""
    d, n = point_triangle_distance_pallas_async(points, triangles)
    return np.asarray(d)[:n]
