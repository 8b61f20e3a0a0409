"""Iso-surface extraction: vectorized marching tetrahedra.

Replaces skimage.measure.marching_cubes (reference mesh_processing.py:332)
and itk-cuberille (mesh_processing.py:343-349). Design choice: marching
TETRAHEDRA on the Kuhn 6-tet cube decomposition instead of classic marching
cubes — the case table is generated programmatically at import (16 tet
configurations, orientation resolved numerically), eliminating the
hand-typed 256-entry tables and their topological ambiguities; the output
is always a watertight, consistently-oriented surface. Vertices lie on tet
edges with linear interpolation, giving the same O(h^2) geometric accuracy
as marching cubes. Correctness is pinned by phantom tests (watertightness,
Euler characteristic, analytic sphere area/volume — tests/test_marching.py).

Conventions matching the reference pipeline:
  * the input array is indexed [x, y, z] (the reference swaps axes before
    extraction, mesh_processing.py:329) and vertex coordinates come out as
    index * spacing (xyz), exactly like skimage with `spacing=`;
  * `gradient_direction="ascent"` orientation: triangle normals
    (right-hand rule) point toward HIGHER field values, i.e. into the
    segmented object — the reference's setting (mesh_processing.py:333).

The per-cube corner gather + interpolation is plain vectorized array math —
it runs in numpy on host by default (active cubes are ~1% of the volume;
compaction is host-side), with the active-mask reduction jittable on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from oai_analysis_2_tpu.mesh.types import Mesh

# -- Kuhn decomposition: 6 tetrahedra per cube, all sharing diagonal (0, 7).
# Corner index = x + 2y + 4z over the unit cube.
_CORNER_OFFSETS = np.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)]
)[:, :]  # index = x + 2y + 4z -> offsets via bit tricks below
_CORNER_OFFSETS = np.array([[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)])

_TETS = np.array(
    [
        [0, 1, 3, 7],  # path x, y, z
        [0, 1, 5, 7],  # x, z, y
        [0, 2, 3, 7],  # y, x, z
        [0, 2, 6, 7],  # y, z, x
        [0, 4, 5, 7],  # z, x, y
        [0, 4, 6, 7],  # z, y, x
    ],
    np.int64,
)

# The 6 edges of a tetrahedron as (local vertex, local vertex).
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int64
)


def _build_case_table() -> Tuple[np.ndarray, np.ndarray]:
    """For each of 16 inside-masks over tet vertices, up to 2 triangles, each
    triangle = 3 tet-edge indices. Orientation: normal toward the inside
    (higher-value) vertices, fixed numerically on a canonical tet."""
    # canonical positively-oriented tet
    pos = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])

    def edge_index(a, b):
        for ei, (u, v) in enumerate(_TET_EDGES):
            if {a, b} == {u, v}:
                return ei
        raise AssertionError

    tris_table = -np.ones((16, 2, 3), np.int64)
    for case in range(1, 15):
        inside = [v for v in range(4) if case >> v & 1]
        outside = [v for v in range(4) if not case >> v & 1]
        tris = []
        if len(inside) == 1:
            a = inside[0]
            tris.append([edge_index(a, b) for b in outside])
        elif len(inside) == 3:
            a = outside[0]
            tris.append([edge_index(a, b) for b in inside])
        else:  # 2 in / 2 out -> quad across 4 cut edges
            a, b = inside
            c, d = outside
            quad = [edge_index(a, c), edge_index(a, d), edge_index(b, d), edge_index(b, c)]
            tris.append([quad[0], quad[1], quad[2]])
            tris.append([quad[0], quad[2], quad[3]])
        # numeric orientation fix: midpoints of cut edges, normal toward inside
        inside_center = pos[inside].mean(axis=0)
        for t in tris:
            mids = np.array([(pos[_TET_EDGES[e][0]] + pos[_TET_EDGES[e][1]]) / 2 for e in t])
            n = np.cross(mids[1] - mids[0], mids[2] - mids[0])
            if np.dot(n, inside_center - mids.mean(axis=0)) < 0:
                t[1], t[2] = t[2], t[1]
        for ti, t in enumerate(tris):
            tris_table[case, ti] = t

    counts = np.zeros(16, np.int64)
    for case in range(16):
        counts[case] = int((tris_table[case, :, 0] >= 0).sum())
    return tris_table, counts


_TRIS_TABLE, _TRI_COUNTS = _build_case_table()


def _build_code_tri_count() -> np.ndarray:
    """Exact number of emitted triangles for each of the 256 cube occupancy
    codes — lets the host size the device emission buffers without any
    data-dependent device->host round trip."""
    counts = np.zeros(256, np.int64)
    for code in range(256):
        total = 0
        for t in range(6):
            case = 0
            for v in range(4):
                if code >> _TETS[t, v] & 1:
                    case |= 1 << v
            total += int(_TRI_COUNTS[case])
        counts[code] = total
    return counts


_CODE_TRI_COUNT = _build_code_tri_count()

# chirality of each Kuhn tet (winding flip for negatively-oriented tets)
_TET_PARITY = np.array(
    [
        int(np.sign(np.linalg.det(
            (_CORNER_OFFSETS[_TETS[t, 1:]] - _CORNER_OFFSETS[_TETS[t, 0]]).astype(float)
        )))
        for t in range(6)
    ],
    np.int64,
)


def _cube_codes_device(volume, level: float) -> np.ndarray:
    """Per-cube 8-bit occupancy code computed on the accelerator: bit ci set
    iff corner ci is above the level. Only the (small) uint8 code array
    crosses back to host — the host then merely compacts active cubes."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def codes(v):
        inside = (v > level).astype(jnp.uint8)
        nx, ny, nz = v.shape
        c = jnp.zeros((nx - 1, ny - 1, nz - 1), jnp.uint8)
        for ci in range(8):
            ox, oy, oz = (int(o) for o in _CORNER_OFFSETS[ci])
            c = c + (
                inside[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz] << ci
            )
        return c

    return np.asarray(codes(volume))


def _emit_device(corner_vals, corner_ids, level, ny: int, nz: int, t_bucket: int):
    """Device-side triangle emission + vertex dedup for padded active cubes.

    corner_vals (M, 8) f32 / corner_ids (M, 8) int32, padded with zeros
    (code 0 emits nothing). Returns (verts_idx (V,3) xyz index coords,
    faces (t_bucket, 3) int32, n_verts scalar) — V = 2 * t_bucket slots.
    Vertex dedup happens on device via a lexicographic sort of the
    (lo, hi) corner-id edge keys (int64 is unavailable without x64) with a
    carried original-position operand; ranks come from a cumsum over
    first-occurrence flags.
    """
    import jax.numpy as jnp

    return _emit_jit(corner_vals, corner_ids, jnp.float32(level), t_bucket, ny, nz)


def _get_emit_jit():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("tb", "ny", "nz"))
    def emit(vals, ids, lvl, tb: int, ny: int, nz: int):
        tets_j = jnp.asarray(_TETS.astype(np.int32))
        tris_table_j = jnp.asarray(_TRIS_TABLE.astype(np.int32))
        tet_edges_j = jnp.asarray(_TET_EDGES.astype(np.int32))
        tet_parity_j = jnp.asarray(_TET_PARITY.astype(np.int32))
        m = vals.shape[0]
        vals_t = vals[:, tets_j]  # (m, 6, 4)
        ids_t = ids[:, tets_j]  # (m, 6, 4)
        case = jnp.sum(
            (vals_t > lvl).astype(jnp.int32) << jnp.arange(4, dtype=jnp.int32),
            axis=-1,
        )  # (m, 6)
        tri_edges = tris_table_j[case]  # (m, 6, 2, 3)
        valid = tri_edges[..., 0] >= 0  # (m, 6, 2)

        # winding flip for mirrored Kuhn tets
        flip = (tet_parity_j < 0)[None, :, None]  # (1, 6, 1)
        e1, e2 = tri_edges[..., 1], tri_edges[..., 2]
        tri_edges = jnp.stack(
            [tri_edges[..., 0], jnp.where(flip, e2, e1), jnp.where(flip, e1, e2)],
            axis=-1,
        )

        # flatten triangle slots and compact the valid ones
        t_dense = m * 12
        edges_flat = tri_edges.reshape(t_dense, 3)
        valid_flat = valid.reshape(t_dense)
        slot2tet = (
            jnp.arange(t_dense, dtype=jnp.int32) // 2
        )  # slot -> (m*6) tet index
        (tri_idx,) = jnp.nonzero(valid_flat, size=tb, fill_value=t_dense - 1)
        tri_valid = valid_flat[tri_idx]  # mask off fill rows

        edges = jnp.clip(edges_flat[tri_idx], 0, 5)  # (tb, 3)
        tet_of = slot2tet[tri_idx]  # (tb,)
        ids_flat = ids_t.reshape(m * 6, 4)
        vals_flat = vals_t.reshape(m * 6, 4)
        tids = ids_flat[tet_of]  # (tb, 4)
        tvals = vals_flat[tet_of]

        ev = tet_edges_j[edges]  # (tb, 3, 2)
        tids3 = jnp.broadcast_to(tids[:, None, :], (tids.shape[0], 3, 4))
        tvals3 = jnp.broadcast_to(tvals[:, None, :], (tvals.shape[0], 3, 4))
        ga = jnp.take_along_axis(tids3, ev[..., 0:1], axis=2)[..., 0]
        gb = jnp.take_along_axis(tids3, ev[..., 1:2], axis=2)[..., 0]
        va = jnp.take_along_axis(tvals3, ev[..., 0:1], axis=2)[..., 0]
        vb = jnp.take_along_axis(tvals3, ev[..., 1:2], axis=2)[..., 0]

        lo = jnp.minimum(ga, gb)
        hi = jnp.maximum(ga, gb)
        big = jnp.int32(2**31 - 1)
        vmask3 = jnp.broadcast_to(tri_valid[:, None], lo.shape)
        lo = jnp.where(vmask3, lo, big)  # invalid slots sort to the end
        hi = jnp.where(vmask3, hi, big)

        n3 = tb * 3
        orig = jnp.arange(n3, dtype=jnp.int32)
        lo_f, hi_f = lo.reshape(n3), hi.reshape(n3)
        va_f, vb_f = va.reshape(n3), vb.reshape(n3)
        ga_f, gb_f = ga.reshape(n3), gb.reshape(n3)
        vmask_f = vmask3.reshape(n3).astype(jnp.int32)

        lo_s, hi_s, orig_s, va_s, vb_s, ga_s, gb_s, vm_s = jax.lax.sort(
            (lo_f, hi_f, orig, va_f, vb_f, ga_f, gb_f, vmask_f), num_keys=2
        )
        prev_lo = jnp.concatenate([jnp.full((1,), -1, jnp.int32), lo_s[:-1]])
        prev_hi = jnp.concatenate([jnp.full((1,), -1, jnp.int32), hi_s[:-1]])
        is_new = (lo_s != prev_lo) | (hi_s != prev_hi)
        rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # (n3,)
        n_verts = jnp.sum(is_new & (vm_s > 0))

        faces_flat = jnp.zeros((n3,), jnp.int32).at[orig_s].set(rank)

        v_bucket = 2 * tb
        rank_c = jnp.minimum(rank, v_bucket - 1)
        va_u = jnp.zeros((v_bucket,), jnp.float32).at[rank_c].set(va_s)
        vb_u = jnp.zeros((v_bucket,), jnp.float32).at[rank_c].set(vb_s)
        ga_u = jnp.zeros((v_bucket,), jnp.int32).at[rank_c].set(ga_s)
        gb_u = jnp.zeros((v_bucket,), jnp.int32).at[rank_c].set(gb_s)

        denom = vb_u - va_u
        t = jnp.where(jnp.abs(denom) > 1e-20, (lvl - va_u) / jnp.where(denom == 0, 1.0, denom), 0.5)
        t = jnp.clip(t, 0.0, 1.0)

        def decode(g):
            x = g // (ny * nz)
            rem = g % (ny * nz)
            return jnp.stack([x, rem // nz, rem % nz], axis=-1).astype(jnp.float32)

        pa, pb = decode(ga_u), decode(gb_u)
        verts_idx = pa + t[:, None] * (pb - pa)  # (v_bucket, 3) xyz index coords
        return verts_idx, faces_flat.reshape(tb, 3), n_verts

    return emit


class _LazyEmit:
    _fn = None

    def __call__(self, *args, **kw):
        if _LazyEmit._fn is None:
            _LazyEmit._fn = _get_emit_jit()
        return _LazyEmit._fn(*args, **kw)


_emit_jit = _LazyEmit()


def marching_tetrahedra(
    volume,
    level: float = 0.5,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    device_emission: bool = False,
) -> Mesh:
    """Extract the `level` iso-surface of a 3D array indexed [x, y, z].

    Returns a Mesh with vertices in spacing-scaled index coordinates (xyz),
    normals (implied by winding) pointing toward higher values ("ascent").
    Accepts a numpy array (host path) or a jax.Array (occupancy codes are
    then computed on device).
    """
    import jax

    device_input = isinstance(volume, jax.Array) and not isinstance(volume, np.ndarray)
    nx, ny, nz = volume.shape
    if min(nx, ny, nz) < 2:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))

    if device_input:
        # occupancy codes on device; only the uint8 code array crosses to host
        codes = _cube_codes_device(volume, level)
        active = (codes > 0) & (codes < 255)
    else:
        vol = np.ascontiguousarray(np.asarray(volume, np.float32))
        inside = vol > level
        # active cubes: any corner differs from corner 0
        occ = inside[:-1, :-1, :-1]
        active = np.zeros((nx - 1, ny - 1, nz - 1), bool)
        for ci in range(1, 8):
            ox, oy, oz = _CORNER_OFFSETS[ci]
            corner = inside[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz]
            active |= corner != occ
    cx, cy, cz = np.nonzero(active)
    if len(cx) == 0:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))

    # gather 8 corner values and global corner ids per active cube
    corner_ids = np.empty((len(cx), 8), np.int64)
    for ci in range(8):
        ox, oy, oz = _CORNER_OFFSETS[ci]
        corner_ids[:, ci] = ((cx + ox) * ny + (cy + oy)) * nz + (cz + oz)

    if device_input and device_emission:
        # fully device-side emission: corner values are gathered on device,
        # triangles emitted and vertices deduplicated there, and only the
        # final (verts, faces) arrays come back to host. The exact triangle
        # count comes from a 256-entry code LUT so buffers are host-sized
        # with no extra round trip. N.B. measured SLOWER than host emission
        # over the single-chip TPU tunnel (the device sort for vertex dedup
        # dominates); default off — kept for multi-host/pod deployments
        # where host CPUs are the bottleneck.
        import jax.numpy as jnp

        from oai_analysis_2_tpu.ops.bucketing import bucket_size, pad_rows

        m = corner_ids.shape[0]
        t_count = int(_CODE_TRI_COUNT[codes[cx, cy, cz]].sum())
        if t_count == 0:
            return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
        m_bucket = bucket_size(m)
        t_bucket = bucket_size(max(t_count, 1024))
        ids_p = pad_rows(corner_ids.astype(np.int32), m_bucket)
        ids_dev = jnp.asarray(ids_p)
        flat = volume.astype(jnp.float32).reshape(-1)
        vals_dev = jnp.take(flat, ids_dev.reshape(-1)).reshape(m_bucket, 8)
        # padded rows must emit nothing: zero ids give corner values of the
        # first voxel (all equal -> case 0 or 15 -> no triangles)
        verts_idx, faces_dev, n_verts_dev = _emit_device(
            vals_dev, ids_dev, level, ny, nz, t_bucket
        )
        n_verts = int(n_verts_dev)
        verts = np.asarray(verts_idx[:n_verts]) * np.asarray(spacing, np.float32)[None, :]
        faces = np.asarray(faces_dev[:t_count])
        good = (
            (faces[:, 0] != faces[:, 1])
            & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2])
        )
        return Mesh(verts, faces[good])

    if device_input:
        # device corner gather: only (M, 8) floats cross to host, not the
        # (transposed) full volume
        import jax.numpy as jnp

        from oai_analysis_2_tpu.ops.bucketing import bucket_size, pad_rows

        m = corner_ids.shape[0]
        flat = volume.astype(jnp.float32).reshape(-1)
        ids = pad_rows(corner_ids.reshape(-1, 1).astype(np.int32), bucket_size(8 * m))
        corner_vals = np.asarray(jnp.take(flat, jnp.asarray(ids[:, 0])))[: 8 * m].reshape(m, 8)
    else:
        corner_vals = np.empty((len(cx), 8), np.float32)
        for ci in range(8):
            ox, oy, oz = _CORNER_OFFSETS[ci]
            corner_vals[:, ci] = vol[cx + ox, cy + oy, cz + oz]

    # per-tet processing, fully vectorized over (cube, tet)
    tet_vert_local = _TETS  # (6, 4) cube-corner index per tet vertex
    vals = corner_vals[:, tet_vert_local]  # (M, 6, 4)
    ids = corner_ids[:, tet_vert_local]  # (M, 6, 4)
    case = ((vals > level) << np.arange(4)).sum(axis=-1)  # (M, 6)

    tri_edges = _TRIS_TABLE[case]  # (M, 6, 2, 3) tet-edge index or -1
    valid = tri_edges[..., 0] >= 0  # (M, 6, 2)

    m, t, k = np.nonzero(valid)
    edges = tri_edges[m, t, k]  # (T, 3) tet-edge indices
    flip = _TET_PARITY[t] < 0
    # winding flip for mirrored tets
    e1 = edges[:, 1].copy()
    e2 = edges[:, 2].copy()
    edges[flip, 1] = e2[flip]
    edges[flip, 2] = e1[flip]

    ev = _TET_EDGES[edges]  # (T, 3, 2) local tet-vertex pairs
    tet_ids = ids[m, t]  # (T, 4) global corner ids of the tet
    tet_vals = vals[m, t]  # (T, 4)

    ga = np.take_along_axis(tet_ids, ev[:, :, 0], axis=1)  # (T, 3)
    gb = np.take_along_axis(tet_ids, ev[:, :, 1], axis=1)
    va = np.take_along_axis(tet_vals, ev[:, :, 0], axis=1)
    vb = np.take_along_axis(tet_vals, ev[:, :, 1], axis=1)

    # dedup edge-vertices by global (min, max) corner-id key
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    keys = (lo.astype(np.int64) * (nx * ny * nz) + hi).reshape(-1)
    uniq_keys, faces_flat = np.unique(keys, return_inverse=True)
    faces_flat = faces_flat.reshape(-1)
    faces = faces_flat.reshape(-1, 3).astype(np.int32)

    # interpolate each unique edge-vertex
    first = np.zeros(len(uniq_keys), np.int64)
    first[faces_flat] = np.arange(keys.size)  # any representative occurrence
    ga_f, gb_f = ga.reshape(-1)[first], gb.reshape(-1)[first]
    va_f, vb_f = va.reshape(-1)[first], vb.reshape(-1)[first]
    denom = vb_f - va_f
    tvals = np.where(np.abs(denom) > 1e-20, (level - va_f) / np.where(denom == 0, 1, denom), 0.5)
    tvals = np.clip(tvals, 0.0, 1.0)

    def id_to_xyz(gid):
        x = gid // (ny * nz)
        rem = gid % (ny * nz)
        return np.stack([x, rem // nz, rem % nz], axis=-1).astype(np.float32)

    pa = id_to_xyz(ga_f)
    pb = id_to_xyz(gb_f)
    verts = pa + tvals[:, None] * (pb - pa)
    verts *= np.asarray(spacing, np.float32)[None, :]

    # drop degenerate faces (two identical vertex ids)
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return Mesh(verts, faces[good])
