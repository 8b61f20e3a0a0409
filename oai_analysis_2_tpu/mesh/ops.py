"""Mesh geometry kernels: normals, centroids, Laplacian smoothing,
point-to-surface distance, nearest-neighbor attribute transfer.

TPU replacements for (reference call sites):
  * trimesh.face_normals / per-face centroid loops — mesh_processing.py:26-46
    (the reference's Python per-face loop at 33-39 is a known hot spot);
  * vtkSmoothPolyDataFilter — mesh_processing.py:298-306;
  * vtkDistancePolyDataFilter (unsigned, both directions) —
    mesh_processing.py:310-321: distance is point-to-TRIANGLE (exact closest
    point on the other surface), not point-to-point;
  * vtkPointInterpolator with closest-point null strategy —
    mesh_processing.py:400-407;
  * vtkPolyDataNormals (cross-oracle in test/test_mesh_processing.py:42-54).

The distance kernel is brute-force pairwise (points x triangles) evaluated
in fixed-size tiles under jit — at OAI mesh sizes (~20-65k points) this is
a few hundred GFLOP, ideal VPU work, far faster than a host BVH.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from oai_analysis_2_tpu.mesh.types import Mesh
from oai_analysis_2_tpu.ops.bucketing import bucket_size, pad_rows

# -- normals / centroids ------------------------------------------------------------


def face_centroids(mesh: Mesh) -> np.ndarray:
    """(F, 3) per-face centroid (reference get_cell_centroid)."""
    tri = mesh.triangles()
    return tri.mean(axis=1)


def face_normals(mesh: Mesh, normalized: bool = True) -> np.ndarray:
    """(F, 3) per-face normals by right-hand winding (reference
    get_cell_normals via trimesh)."""
    tri = mesh.triangles()
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    if normalized:
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.maximum(norm, 1e-20)
    return n


# -- Laplacian smoothing ------------------------------------------------------------


def _adjacency(mesh: Mesh):
    """Symmetric edge list (src, dst) and per-vertex degree; boundary vertices
    restricted to boundary neighbors (vtkSmoothPolyDataFilter's boundary
    smoothing behavior)."""
    from oai_analysis_2_tpu import native

    ne = native.mesh_edges(mesh.faces)
    if ne is not None:
        uniq, is_b = ne
        uniq = uniq.astype(np.int64)
        boundary_edges = uniq[is_b]
    else:
        f = mesh.faces.astype(np.int64)
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
        und = np.sort(edges, axis=1)
        uniq, counts = np.unique(und, axis=0, return_counts=True)
        boundary_edges = uniq[counts == 1]
    boundary_pts = np.unique(boundary_edges)
    is_boundary = np.zeros(mesh.n_points, bool)
    is_boundary[boundary_pts] = True

    src = np.concatenate([uniq[:, 0], uniq[:, 1]])
    dst = np.concatenate([uniq[:, 1], uniq[:, 0]])
    # boundary vertices average only over boundary neighbors
    b_src = np.concatenate([boundary_edges[:, 0], boundary_edges[:, 1]])
    b_dst = np.concatenate([boundary_edges[:, 1], boundary_edges[:, 0]])
    interior = ~is_boundary[src]
    src = np.concatenate([src[interior], b_src])
    dst = np.concatenate([dst[interior], b_dst])
    deg = np.bincount(src, minlength=mesh.n_points).astype(np.float32)
    return src.astype(np.int32), dst.astype(np.int32), deg


@partial(jax.jit, static_argnames=("num_iterations",))
def _smooth_loop(verts, nbr_table, num_iterations: int, relaxation):
    """Neighbor-TABLE Laplacian iteration: one (N, K) row gather + sum per
    step, no scatter. Measured 3.6x faster on TPU than the round-2 edge-list
    segment-sum form at production mesh sizes (29k points, K=10: 0.18 s vs
    0.65 s for 150 iterations) — TPU scatter-adds serialize, row gathers ride
    DMA. Padding table entries point at the LAST vertex row, which is an
    all-zero immovable dummy (degree 0), so they contribute nothing. Degrees
    are derived ON DEVICE from the table (entries != dummy row): the host
    float vector was pure extra tunnel payload.

    The table may be SHORTER than the vertex array: rows [len(table), N)
    are frozen (they are bucket padding + the dummy, all immovable anyway),
    so the per-iteration gather only pays for rows that can move — the
    gather cost is purely row-count-linear on TPU (measured 22.5 -> 16.8
    ms/iter updating 384k of a 524k bucket; /tmp gather shootout r04)."""
    dummy = verts.shape[0] - 1
    n_upd = nbr_table.shape[0]
    deg = jnp.sum(nbr_table != dummy, axis=1).astype(verts.dtype)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)[:, None]
    movable = (deg > 0)[:, None]

    def body(_, v):
        nb_sum = jnp.sum(v[nbr_table], axis=1)  # (n_upd, K, 3) -> (n_upd, 3)
        avg = nb_sum * inv_deg
        head = v[:n_upd]
        upd = jnp.where(movable, head + relaxation * (avg - head), head)
        return jnp.concatenate([upd, v[n_upd:]])

    return jax.lax.fori_loop(0, num_iterations, body, verts)


@partial(jax.jit, static_argnames=("num_iterations", "n8p"))
def _smooth_loop_tiered(verts, tbl8, tbl16, n8p: int, num_iterations: int,
                        relaxation):
    """`_smooth_loop` with a DEGREE-TIERED neighbor table: vertices are
    pre-permuted so rows [0, n8p) hold degree<=8 vertices (K=8 table) and the
    tail holds the rare high-degree ones (K=16). MC triangulations are 97.8%
    degree<=8 (max 11), so the uniform K=16 table gathers ~2x more rows than
    the mesh has neighbors — and the gather rows are exactly what the
    iteration's cost is proportional to (measured 8.8 s -> 4.5 s per 150
    iterations at the B=8 union bucket of 524288; tools/
    profile_smooth_variants.py). Degrees derive on device as in
    `_smooth_loop`; as there, each tier's table may be truncated below its
    zone size — tbl8 updates rows [0, len(tbl8)), tbl16 updates rows
    [n8p, n8p + len(tbl16)), everything else is frozen padding."""
    dummy = verts.shape[0] - 1
    n8u = tbl8.shape[0]
    n16u = tbl16.shape[0]
    deg = jnp.concatenate(
        [jnp.sum(tbl8 != dummy, axis=1), jnp.sum(tbl16 != dummy, axis=1)]
    ).astype(verts.dtype)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)[:, None]
    movable = (deg > 0)[:, None]

    def body(_, v):
        s8 = jnp.sum(v[tbl8], axis=1)
        s16 = jnp.sum(v[tbl16], axis=1)
        avg = jnp.concatenate([s8, s16]) * inv_deg
        head = jnp.concatenate([v[:n8u], v[n8p : n8p + n16u]])
        upd = jnp.where(movable, head + relaxation * (avg - head), head)
        return jnp.concatenate(
            [upd[:n8u], v[n8u:n8p], upd[n8u:], v[n8p + n16u :]]
        )

    return jax.lax.fori_loop(0, num_iterations, body, verts)


def _neighbor_table(src: np.ndarray, dst: np.ndarray, nv: int, dummy: int):
    """(nv, K) padded neighbor table from a directed edge list (vectorized:
    stable-sort by source, then column = rank within the source's group)."""
    deg = np.bincount(src, minlength=nv)
    # K floors at 8, not the vertex-bucket minimum of 256 — MC-mesh degrees
    # are ~6-11, and K multiplies the per-iteration gather volume directly
    k = int(bucket_size(max(int(deg.max()), 1), minimum=8)) if len(src) else 8
    order = np.argsort(src, kind="stable")
    ssrc, sdst = src[order], dst[order]
    starts = np.zeros(nv, np.int64)
    np.cumsum(deg[:-1], out=starts[1:])
    col = np.arange(len(ssrc)) - starts[ssrc]
    tbl = np.full((nv, k), dummy, np.int32)
    tbl[ssrc, col] = sdst
    return tbl, deg.astype(np.float32)


def _csr_adjacency(mesh: Mesh):
    """Smoothing adjacency as CSR (deg (N,) int64, nbr (total,) int32) with
    the boundary rule applied — one C++ pass (native.smooth_adjacency_csr;
    the numpy unique/argsort path costs ~7 s at the B=8 cohort-batch union
    of ~700k points), numpy fallback via `_adjacency`."""
    from oai_analysis_2_tpu import native

    res = native.smooth_adjacency(mesh.n_points, mesh.faces)
    if res is not None:
        deg, nbr = res
        return deg.astype(np.int64), nbr
    src, dst, _ = _adjacency(mesh)
    order = np.argsort(src, kind="stable")
    deg = np.bincount(src, minlength=mesh.n_points).astype(np.int64)
    return deg, dst[order].astype(np.int32)


def _table_from_csr(deg, nbr, nv: int, k: int, dummy: int, slots=None):
    """(nv, k) neighbor table from CSR, optionally remapped through a slot
    permutation (tiered layout): row-sequential C++ fill (native.fill_table),
    vectorized-numpy fallback."""
    from oai_analysis_2_tpu import native

    tbl = np.full((nv, k), dummy, np.int32)
    if len(nbr) == 0:
        return tbl
    if native.fill_table(deg, nbr, tbl, slots):
        return tbl
    offsets = np.zeros(len(deg), np.int64)
    np.cumsum(deg[:-1], out=offsets[1:])
    rows = np.arange(len(deg), dtype=np.int64) if slots is None else slots
    tbl[np.repeat(rows, deg),
        np.arange(len(nbr), dtype=np.int64) - np.repeat(offsets, deg)] = (
        nbr if slots is None else slots[nbr].astype(np.int32)
    )
    return tbl


_K_LOW = 8  # low-tier table width; MC meshes are 97.8% degree<=8


def _upd_rows(n_real: int, cap: int, nv: int) -> int:
    """Update-table length for `n_real` occupied rows in a zone of size
    `cap`: rounded up to a bucket-relative granule (nv/16, floor 1024) so
    the compile-key count stays bounded while the gather skips most of the
    zone's padding rows (which are immovable and need no update)."""
    gran = max(nv // 16, 1024)
    return min(cap, -(-max(n_real, 1) // gran) * gran)


def _tiered_slots(deg_pts: np.ndarray, nv: int):
    """Per-vertex row slots for the tiered layout, or None when it doesn't
    pay: low-degree vertices pack into [0, n8p) (K=8 rows), high-degree ones
    into [n8p, nv) with the padding dummies; row nv-1 stays the immovable
    all-zero gather target. Returns (slots, n8p)."""
    high = deg_pts > _K_LOW
    n_high = int(high.sum())
    if n_high == 0 and len(deg_pts) == 0:
        return None
    cap = bucket_size(n_high + 1, minimum=8)
    n8p = nv - cap
    n_low = len(deg_pts) - n_high
    if n8p <= 0 or n_low > n8p:
        return None  # bucket too tight for the zone split — uniform table
    slots = np.empty(len(deg_pts), np.int64)
    slots[~high] = np.arange(n_low)
    slots[high] = n8p + np.arange(n_high)
    return slots, n8p


def smooth_mesh(mesh: Mesh, num_iterations: int = 150, relaxation: float = 0.01) -> Mesh:
    """Laplacian smoothing, vtkSmoothPolyDataFilter defaults (iterations from
    caller, relaxation 0.01) — reference mesh_processing.py:298-306.

    Vertices are padded to power-of-2 buckets (and the neighbor-table width
    to a power-of-2 K) so the jitted loop compiles once per bucket, not per
    mesh; the iteration runs the degree-tiered gather (`_smooth_loop_tiered`)
    whenever the bucket can host the two zones."""
    if mesh.n_points == 0:
        return mesh

    import os
    import time as _time

    _prof = os.environ.get("OAI_TPU_THICKNESS_PROFILE") == "1"
    _t = _time.time()

    def _mark(name):
        nonlocal _t
        if _prof:
            import sys as _sys

            now = _time.time()
            print(f"  smooth[{name}]: {now - _t:.2f}s", file=_sys.stderr, flush=True)
            _t = now

    deg_pts, nbr = _csr_adjacency(mesh)
    _mark("adjacency")
    nv = bucket_size(mesh.n_points + 1)
    dummy = nv - 1
    k = int(bucket_size(max(int(deg_pts.max()) if len(deg_pts) else 1, 1),
                        minimum=_K_LOW))
    tiered = _tiered_slots(deg_pts, nv)
    if tiered is not None:
        slots, n8p = tiered
        tbl = _table_from_csr(deg_pts, nbr, nv, k, dummy, slots)
        vp = np.zeros((nv, 3), np.float32)
        vp[slots] = mesh.vertices
        n_high = int((deg_pts > _K_LOW).sum())
        n8u = _upd_rows(mesh.n_points - n_high, n8p, nv)
        n16u = _upd_rows(n_high, nv - n8p, nv)
        _mark("table")
        out = _smooth_loop_tiered(
            jnp.asarray(vp),
            jnp.asarray(tbl[:n8u, :_K_LOW]),
            jnp.asarray(tbl[n8p : n8p + n16u]),
            int(n8p),
            int(num_iterations),
            jnp.float32(relaxation),
        )
        out_np = np.asarray(out)
        _mark("device+pull")
        res = mesh.copy()
        res.vertices = out_np[slots]
        return res

    tbl = _table_from_csr(deg_pts, nbr, nv, k, dummy)
    n_upd = _upd_rows(mesh.n_points, nv, nv)
    out = _smooth_loop(
        jnp.asarray(pad_rows(mesh.vertices, nv)),
        jnp.asarray(tbl[:n_upd]),
        int(num_iterations),
        jnp.float32(relaxation),
    )
    res = mesh.copy()
    res.vertices = np.asarray(out)[: mesh.n_points]
    return res


@partial(jax.jit, static_argnames=("num_iterations", "n8p"))
def _smooth_loop_tiered_batched(verts, tbl8, tbl16, n8p: int,
                                num_iterations: int, relaxation):
    """vmap of `_smooth_loop_tiered` over a leading group axis. The gather
    stays within each group's slice, so sharding the leading axis over a
    device mesh runs each group's smoothing on its own chip with NO
    collectives — the SPMD form of the batched-thickness stage (one knee's
    FC+TC union per group). Returns only the two occupied zones
    (G, n8u + n16u, 3): the inter-zone padding rows are immovable and
    pulling them is pure tunnel payload."""
    out = jax.vmap(
        lambda v, t8, t16: _smooth_loop_tiered(
            v, t8, t16, n8p, num_iterations, relaxation
        )
    )(verts, tbl8, tbl16)
    n8u = tbl8.shape[1]
    n16u = tbl16.shape[1]
    return jnp.concatenate(
        [out[:, :n8u], out[:, n8p : n8p + n16u]], axis=1
    )


def smooth_mesh_groups(
    groups,
    num_iterations: int = 150,
    relaxation: float = 0.01,
    sharding=None,
):
    """Smooth groups of meshes (one group = one knee's tissue set) as a
    STACKED batch: each group becomes a disjoint union padded to shared
    zone geometry, and one vmapped tiered loop smooths all groups. With
    `sharding` (a jax NamedSharding over the leading axis) each group's
    smoothing runs on its own device — the multi-chip form of the cohort
    batch's thickness stage. Falls back to the union path when the shared
    tiered layout doesn't fit. Returns a list of lists mirroring `groups`."""
    groups = [list(g) for g in groups]
    flat = [m for g in groups for m in g]
    if not flat:
        return [[] for _ in groups]

    unions, csrs = [], []
    for g in groups:
        offsets = np.cumsum([0] + [m.n_points for m in g])
        union = Mesh(
            np.concatenate([m.vertices for m in g]),
            np.concatenate(
                [m.faces + offsets[i] for i, m in enumerate(g)]
            ).astype(np.int32),
        )
        unions.append((union, offsets))
        csrs.append(_csr_adjacency(union))

    nv = max(bucket_size(u.n_points + 1) for u, _ in unions)
    dummy = nv - 1
    k = max(
        int(bucket_size(max(int(deg.max()) if len(deg) else 1, 1), minimum=_K_LOW))
        for deg, _ in csrs
    )
    n_highs = [int((deg > _K_LOW).sum()) for deg, _ in csrs]
    cap = max(bucket_size(nh + 1, minimum=8) for nh in n_highs)
    n8p = nv - cap
    n_lows = [len(deg) - nh for (deg, _), nh in zip(csrs, n_highs)]
    if n8p <= 0 or max(n_lows) > n8p or k < _K_LOW:
        # shared tiered layout doesn't fit — smooth everything as one union
        smoothed = smooth_meshes(flat, num_iterations, relaxation)
        out, i = [], 0
        for g in groups:
            out.append(smoothed[i : i + len(g)])
            i += len(g)
        return out
    n8u = _upd_rows(max(n_lows), n8p, nv)
    n16u = _upd_rows(max(n_highs), cap, nv)

    vps, t8s, t16s, slot_list = [], [], [], []
    for (union, _), (deg, nbr), nh in zip(unions, csrs, n_highs):
        high = deg > _K_LOW
        slots = np.empty(union.n_points, np.int64)
        slots[~high] = np.arange(union.n_points - nh)
        slots[high] = n8p + np.arange(nh)
        tbl = _table_from_csr(deg, nbr, nv, k, dummy, slots)
        vp = np.zeros((nv, 3), np.float32)
        vp[slots] = union.vertices
        vps.append(vp)
        t8s.append(tbl[:n8u, :_K_LOW])
        t16s.append(tbl[n8p : n8p + n16u])
        slot_list.append(slots)

    verts = jnp.asarray(np.stack(vps))
    tbl8 = jnp.asarray(np.stack(t8s))
    tbl16 = jnp.asarray(np.stack(t16s))
    if sharding is not None:
        verts = jax.device_put(verts, sharding)
        tbl8 = jax.device_put(tbl8, sharding)
        tbl16 = jax.device_put(tbl16, sharding)
    pulled = np.asarray(
        _smooth_loop_tiered_batched(
            verts, tbl8, tbl16, int(n8p), int(num_iterations),
            jnp.float32(relaxation),
        )
    )
    out = []
    for gi, (g, (union, offsets), slots) in enumerate(
        zip(groups, unions, slot_list)
    ):
        pull_rows = np.where(slots < n8p, slots, n8u + slots - n8p)
        uverts = pulled[gi][pull_rows]
        meshes = []
        for i, m in enumerate(g):
            r = m.copy()
            r.vertices = uverts[offsets[i] : offsets[i + 1]]
            meshes.append(r)
        out.append(meshes)
    return out


def smooth_meshes(meshes, num_iterations: int = 150, relaxation: float = 0.01):
    """Smooth several meshes in ONE jitted loop via their disjoint union —
    Laplacian smoothing never crosses components, so the union is exact and
    the sequential-iteration cost is paid once for all meshes."""
    meshes = [m for m in meshes]
    if not meshes:
        return []
    offsets = np.cumsum([0] + [m.n_points for m in meshes])
    union = Mesh(
        np.concatenate([m.vertices for m in meshes]),
        np.concatenate(
            [m.faces + offsets[i] for i, m in enumerate(meshes)]
        ).astype(np.int32),
    )
    smoothed = smooth_mesh(union, num_iterations, relaxation)
    out = []
    for i, m in enumerate(meshes):
        r = m.copy()
        r.vertices = smoothed.vertices[offsets[i] : offsets[i + 1]]
        out.append(r)
    return out


# -- exact point-to-triangle distance ------------------------------------------------


def _point_triangle_dist2(p, a, b, c):
    """Squared distance from point p to triangle (a, b, c). Branchless:
    min(plane distance if the projection is inside, 3 edge distances)."""
    ab = b - a
    ac = c - a
    ap = p - a
    n = jnp.cross(ab, ac)
    nn = jnp.sum(n * n)

    # barycentric coordinates of the plane projection
    d1 = jnp.sum(jnp.cross(b - p, c - p) * n)
    d2 = jnp.sum(jnp.cross(c - p, a - p) * n)
    d3 = jnp.sum(jnp.cross(a - p, b - p) * n)
    inside = (d1 >= 0) & (d2 >= 0) & (d3 >= 0) & (nn > 1e-30)
    t = jnp.sum(ap * n)
    plane_d2 = t * t / jnp.maximum(nn, 1e-30)

    def seg_d2(p, u, v):
        uv = v - u
        tt = jnp.clip(jnp.sum((p - u) * uv) / jnp.maximum(jnp.sum(uv * uv), 1e-30), 0.0, 1.0)
        d = p - (u + tt * uv)
        return jnp.sum(d * d)

    edge_d2 = jnp.minimum(seg_d2(p, a, b), jnp.minimum(seg_d2(p, b, c), seg_d2(p, c, a)))
    return jnp.where(inside, plane_d2, edge_d2)


def _min_dist2_points_to_tris(points, tri_a, tri_b, tri_c):
    """(P,3) x (F,3)x3 -> (P,) min squared distance, vmapped both ways."""
    def one_point(p):
        d2 = jax.vmap(lambda a, b, c: _point_triangle_dist2(p, a, b, c))(tri_a, tri_b, tri_c)
        return jnp.min(d2)

    return jax.vmap(one_point)(points)


@partial(jax.jit, static_argnames=("point_chunk", "tri_chunk"))
def _surface_distance_impl(points, tri_a, tri_b, tri_c, point_chunk: int, tri_chunk: int):
    """Two-level scan (point tiles x triangle tiles) with a running min, so
    the live intermediate stays (point_chunk, tri_chunk) regardless of mesh
    size — bounded memory, fully fused tiles."""
    p_tiles = points.reshape(-1, point_chunk, 3)
    ta = tri_a.reshape(-1, tri_chunk, 3)
    tb = tri_b.reshape(-1, tri_chunk, 3)
    tc = tri_c.reshape(-1, tri_chunk, 3)

    def point_step(_, pc):
        def tri_step(best, abc):
            a, b, c = abc
            d2 = _min_dist2_points_to_tris(pc, a, b, c)
            return jnp.minimum(best, d2), None

        init = jnp.full((point_chunk,), jnp.inf, jnp.float32)
        best, _ = jax.lax.scan(tri_step, init, (ta, tb, tc))
        return None, best

    _, d2 = jax.lax.scan(point_step, None, p_tiles)
    return jnp.sqrt(d2.reshape(-1))


def distance_to_surface_async(
    points: np.ndarray, target: Mesh, point_chunk: int = 2048,
    force_xla: bool = False, device=None,
):
    """Dispatch the surface-distance kernel and return (device array, n)
    WITHOUT a host sync — callers processing many meshes dispatch all
    kernels first and pull results afterwards, so device compute overlaps
    the per-array tunnel transfers. n == 0 means a trivially-empty result
    (no target cells or no points); the device handle is then None.

    `device` places the kernel on a specific jax.Device: a B-knee batch
    runs knee i's distances on chip i (committed-input dispatch), the
    knee-parallel form of the thickness distance substage."""
    if target.n_cells == 0 or len(points) == 0:
        return None, 0
    from oai_analysis_2_tpu.ops.bucketing import bucket_size, pad_rows
    from oai_analysis_2_tpu.ops.pallas_kernels import (
        pallas_available,
        point_triangle_distance_pallas_async,
    )

    if pallas_available() and not force_xla:
        return point_triangle_distance_pallas_async(
            points, target.triangles(), device=device
        )

    tri_chunk = 8192
    tri_np = pad_rows(target.triangles().astype(np.float32),
                      bucket_size(max(target.n_cells, tri_chunk)), fill=1e8)
    pts = pad_rows(np.asarray(points, np.float32),
                   bucket_size(max(len(points), point_chunk)))
    if device is not None:
        pts, tri_np = jax.device_put((pts, tri_np), device)
    tri = jnp.asarray(tri_np)
    d = _surface_distance_impl(
        jnp.asarray(pts), tri[:, 0], tri[:, 1], tri[:, 2], point_chunk, tri_chunk,
    )
    return d, len(points)


def _sync_distance(pending, n_points: int) -> np.ndarray:
    dev, n = pending
    if n == 0:
        return np.zeros(n_points, np.float32)
    return np.asarray(dev)[:n]


def _sync_distances(pendings, n_points_list):
    """Pull MANY pending distance results in ONE transfer per device: the
    per-array pull costs a tunnel round-trip each (32 pulls for an 8-knee
    batch's 16 tissues x 2 directions); device-concatenating first makes it
    one. Results dispatched to different devices (knee-parallel distance,
    distance_to_surface_async(device=...)) are grouped — concatenation
    never crosses a device boundary."""
    live = [(i, dev[:n]) for i, (dev, n) in enumerate(pendings) if n > 0]
    out = [np.zeros(n, np.float32) for n in n_points_list]
    by_device: dict = {}
    for i, d in live:
        by_device.setdefault(next(iter(d.devices()), None), []).append((i, d))
    for group in by_device.values():
        packed = np.asarray(jnp.concatenate([d for _, d in group]))
        off = 0
        for i, d in group:
            out[i] = packed[off : off + d.shape[0]]
            off += d.shape[0]
    return out


def distance_to_surface(
    points: np.ndarray, target: Mesh, point_chunk: int = 2048, force_xla: bool = False
) -> np.ndarray:
    """Unsigned distance from each point to the closest point on `target`'s
    surface (exact point-to-triangle). Triangles are padded to a power-of-2
    bucket with far-away degenerate triangles so the kernel compiles once per
    (bucket, chunk), not once per mesh. `force_xla` skips the Pallas kernel
    (cross-oracle for the chip-gated regression test)."""
    return _sync_distance(
        distance_to_surface_async(points, target, point_chunk, force_xla),
        len(points),
    )


def get_distance(inner_mesh: Mesh, outer_mesh: Mesh):
    """Bidirectional unsigned surface distance — the thickness kernel
    (reference get_distance, mesh_processing.py:310-321). Returns the two
    meshes with per-point `point_data` distances, like
    vtkDistancePolyDataFilter with SignedDistanceOff + ComputeSecondDistance."""
    inner = inner_mesh.copy()
    outer = outer_mesh.copy()
    inner.point_data = distance_to_surface(inner.vertices, outer_mesh)
    outer.point_data = distance_to_surface(outer.vertices, inner_mesh)
    return inner, outer


# -- nearest-neighbor attribute transfer ----------------------------------------------


@partial(jax.jit, static_argnames=("chunk", "src_chunk"))
def _nn_indices(query, source, chunk: int, src_chunk: int = 8192):
    """Nearest source index per query point: two-level scan with running
    (best distance, best index) — bounded memory for any mesh size."""
    q_tiles = query.reshape(-1, chunk, 3)
    s_tiles = source.reshape(-1, src_chunk, 3)
    n_src_tiles = s_tiles.shape[0]

    def q_step(_, qc):
        def s_step(carry, inp):
            best_d2, best_idx = carry
            tile_idx, sc = inp
            d2 = jnp.sum((qc[:, None, :] - sc[None, :, :]) ** 2, axis=-1)
            local = jnp.argmin(d2, axis=1)
            local_d2 = jnp.take_along_axis(d2, local[:, None], axis=1)[:, 0]
            improve = local_d2 < best_d2
            return (
                jnp.where(improve, local_d2, best_d2),
                jnp.where(improve, tile_idx * src_chunk + local, best_idx),
            ), None

        init = (jnp.full((chunk,), jnp.inf, jnp.float32), jnp.zeros((chunk,), jnp.int32))
        (d2, idx), _ = jax.lax.scan(
            s_step, init, (jnp.arange(n_src_tiles, dtype=jnp.int32), s_tiles)
        )
        return None, idx

    _, idx = jax.lax.scan(q_step, None, q_tiles)
    return idx.reshape(-1)


def map_attributes(source_mesh: Mesh, target_mesh: Mesh) -> Mesh:
    """Transfer per-point scalars from source to target by closest point
    (reference map_attributes, mesh_processing.py:400-407)."""
    if source_mesh.point_data is None:
        raise ValueError("source mesh has no point_data to transfer")
    from oai_analysis_2_tpu.ops.bucketing import bucket_size, pad_rows

    src = pad_rows(source_mesh.vertices.astype(np.float32),
                   bucket_size(max(source_mesh.n_points, 8192)), fill=1e8)
    query = pad_rows(target_mesh.vertices.astype(np.float32),
                     bucket_size(max(target_mesh.n_points, 2048)))
    idx = np.asarray(
        _nn_indices(jnp.asarray(query), jnp.asarray(src), 2048)
    )[: target_mesh.n_points]
    out = target_mesh.copy()
    out.point_data = np.asarray(source_mesh.point_data)[idx]
    return out
