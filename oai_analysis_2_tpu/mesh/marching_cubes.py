"""True marching-cubes iso-surface extraction (256-case, cube-edge vertices).

The drop-in replacement for skimage.measure.marching_cubes on the reference's
live path (mesh_processing.py:325-340): vertices lie on cube edges with
linear interpolation and spacing-scaled [x,y,z] coordinates, normals point
toward higher values ("ascent"). Produces reference-sized meshes
(FC ~65k / TC ~20.5k points, test_all.py:69-70) — marching tetrahedra
(mesh/marching.py, kept as the validated cross-oracle) emits ~2x the
triangles for the same surface.

Two execution paths:
  * host (numpy) — mirrors mesh/marching.py's vectorized host emission;
  * device (default for jax-array inputs) — the WHOLE extraction runs as two
    jitted programs on the TPU. Vertex dedup is direct-addressed instead of
    sorted: an MC vertex exists iff a grid edge changes sign, so vertex ids
    are exclusive-cumsum ranks over the flattened crossing-edge masks and
    face indices are pure gathers of those ranks. Only the final compact
    (verts, faces) arrays cross the tunnel (~2 MB) instead of the ~60 MB
    per-cube code volume the host path ships — this removes the round-1
    "~4 s/tissue host tail" from the thickness stage.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

from oai_analysis_2_tpu.mesh.mc_table import (
    EDGE_CORNERS,
    MC_MAX_TRIS,
    MC_TRI_TABLE,
)
from oai_analysis_2_tpu.mesh.marching import _CORNER_OFFSETS
from oai_analysis_2_tpu.mesh.types import Mesh

# Per cube-edge id: the in-cube offset of the edge's base lattice point.
# x-edges: (0, k&1, k>>1); y-edges: (k&1, 0, k>>1); z-edges: (k&1, k>>1, 0).
_EDGE_BASE_OFFSET = np.zeros((12, 3), np.int64)
for _e in range(12):
    _axis, _k = _e // 4, _e % 4
    _off = [0, 0, 0]
    _others = [a for a in range(3) if a != _axis]
    _off[_others[0]] = _k & 1
    _off[_others[1]] = _k >> 1
    _EDGE_BASE_OFFSET[_e] = _off


def _host_codes(inside: np.ndarray) -> np.ndarray:
    nx, ny, nz = inside.shape
    codes = np.zeros((nx - 1, ny - 1, nz - 1), np.uint8)
    for ci in range(8):
        ox, oy, oz = _CORNER_OFFSETS[ci]
        codes |= inside[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz].astype(np.uint8) << ci
    return codes


def _marching_cubes_host(vol: np.ndarray, level: float, spacing) -> Mesh:
    nx, ny, nz = vol.shape
    inside = vol > level
    codes = _host_codes(inside)
    cx, cy, cz = np.nonzero((codes > 0) & (codes < 255))
    if len(cx) == 0:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    codes_a = codes[cx, cy, cz]

    tri_edges = MC_TRI_TABLE[codes_a].astype(np.int64)  # (M, MAXT, 3)
    m, t = np.nonzero(tri_edges[..., 0] >= 0)
    edges = tri_edges[m, t]  # (T, 3) cube-edge ids

    # global corner ids of each triangle vertex's edge endpoints
    base = np.stack([cx, cy, cz], axis=-1)  # (M, 3)
    pair = EDGE_CORNERS[edges]  # (T, 3, 2)
    ca = _CORNER_OFFSETS[pair[..., 0]] + base[m][:, None, :]  # (T, 3, 3)
    cb = _CORNER_OFFSETS[pair[..., 1]] + base[m][:, None, :]
    ga = (ca[..., 0] * ny + ca[..., 1]) * nz + ca[..., 2]
    gb = (cb[..., 0] * ny + cb[..., 1]) * nz + cb[..., 2]
    flat = vol.reshape(-1)
    va, vb = flat[ga], flat[gb]

    # dedup edge-vertices by (min, max) global corner ids — identical tail to
    # marching.py's tet path
    lo, hi = np.minimum(ga, gb), np.maximum(ga, gb)
    keys = (lo.astype(np.int64) * (nx * ny * nz) + hi).reshape(-1)
    uniq_keys, faces_flat = np.unique(keys, return_inverse=True)
    faces = faces_flat.reshape(-1, 3).astype(np.int32)

    first = np.zeros(len(uniq_keys), np.int64)
    first[faces_flat] = np.arange(keys.size)
    ga_f, gb_f = ga.reshape(-1)[first], gb.reshape(-1)[first]
    va_f, vb_f = va.reshape(-1)[first], vb.reshape(-1)[first]
    denom = vb_f - va_f
    tvals = np.clip(
        np.where(np.abs(denom) > 1e-20, (level - va_f) / np.where(denom == 0, 1, denom), 0.5),
        0.0,
        1.0,
    )

    def id_to_xyz(gid):
        x = gid // (ny * nz)
        rem = gid % (ny * nz)
        return np.stack([x, rem // nz, rem % nz], axis=-1).astype(np.float32)

    verts = id_to_xyz(ga_f) + tvals[:, None] * (id_to_xyz(gb_f) - id_to_xyz(ga_f))
    verts *= np.asarray(spacing, np.float32)[None, :]
    return Mesh(verts, faces)


# -- device path -------------------------------------------------------------


@functools.cache
def _device_fns():
    import jax
    import jax.numpy as jnp

    tri_table = jnp.asarray(MC_TRI_TABLE.astype(np.int32))  # (256, MAXT, 3)
    edge_base = jnp.asarray(_EDGE_BASE_OFFSET.astype(np.int32))  # (12, 3)

    def _codes(inside):
        nx, ny, nz = inside.shape
        c = jnp.zeros((nx - 1, ny - 1, nz - 1), jnp.uint8)
        for ci in range(8):
            ox, oy, oz = (int(o) for o in _CORNER_OFFSETS[ci])
            c = c + (inside[ox : nx - 1 + ox, oy : ny - 1 + oy, oz : nz - 1 + oz] << ci)
        return c

    def _count_one(vol, level):
        inside = (vol > level).astype(jnp.uint8)
        n_vx = jnp.sum(inside[:-1, :, :] != inside[1:, :, :])
        n_vy = jnp.sum(inside[:, :-1, :] != inside[:, 1:, :])
        n_vz = jnp.sum(inside[:, :, :-1] != inside[:, :, 1:])
        codes = _codes(inside)
        active = (codes > 0) & (codes < 255)
        # NO tri-count LUT here: a 256-entry gather over every cube costs
        # ~200 ms/volume at 160x384x384 (vs 28 ms for everything else in
        # this pass — measured r04); the EXACT triangle count is instead
        # produced by the extract pass over the compacted active cubes
        # (~65k gathers) and pulled with the results. This pass only sizes
        # buckets (5 triangles/cube is the MC table maximum) and the bbox.
        # active-cube bounding box (inclusive cube-index ranges) so the
        # heavy extract pass can run on a slice instead of the full volume
        bbox = []
        for axis in range(3):
            other = tuple(a for a in range(3) if a != axis)
            line = jnp.any(active, axis=other)
            lo = jnp.argmax(line)
            hi = line.shape[0] - 1 - jnp.argmax(line[::-1])
            bbox += [lo, hi]
        # ONE packed array -> one host sync (separate scalars cost a tunnel
        # round-trip at ~0.1-0.2 s each)
        return jnp.stack([n_vx + n_vy + n_vz, jnp.sum(active), *bbox])

    count = jax.jit(_count_one)

    @functools.partial(jax.jit, static_argnames=("vb", "mb", "tb"))
    def extract(vol, level, spacing, vb: int, mb: int, tb: int):
        nx, ny, nz = vol.shape
        inside = (vol > level).astype(jnp.uint8)
        cross = [
            (inside[:-1, :, :] != inside[1:, :, :]).reshape(-1),
            (inside[:, :-1, :] != inside[:, 1:, :]).reshape(-1),
            (inside[:, :, :-1] != inside[:, :, 1:]).reshape(-1),
        ]
        sizes = [c.size for c in cross]
        offs = [0, sizes[0], sizes[0] + sizes[1]]
        mask_all = jnp.concatenate(cross)
        # vertex id of every crossing grid edge = its exclusive-cumsum rank
        rank_all = jnp.cumsum(mask_all.astype(jnp.int32)) - mask_all.astype(jnp.int32)

        # ---- vertices: compact the crossing edges, interpolate ----
        (vidx,) = jnp.nonzero(mask_all, size=vb, fill_value=0)
        axis = jnp.where(vidx >= offs[2], 2, jnp.where(vidx >= offs[1], 1, 0))
        local = vidx - jnp.take(jnp.asarray(offs), axis)
        shapes = jnp.asarray(
            [[nx - 1, ny, nz], [nx, ny - 1, nz], [nx, ny, nz - 1]], jnp.int32
        )
        sh = shapes[axis]  # (vb, 3)
        i0 = local // (sh[:, 1] * sh[:, 2])
        rem = local % (sh[:, 1] * sh[:, 2])
        p0 = jnp.stack([i0, rem // sh[:, 2], rem % sh[:, 2]], axis=-1)  # (vb, 3)
        p1 = p0 + (jnp.arange(3)[None, :] == axis[:, None]).astype(p0.dtype)
        flat = vol.reshape(-1)
        g0 = (p0[:, 0] * ny + p0[:, 1]) * nz + p0[:, 2]
        g1 = (p1[:, 0] * ny + p1[:, 1]) * nz + p1[:, 2]
        va, vbv = flat[g0], flat[g1]
        denom = vbv - va
        tv = jnp.clip(
            jnp.where(jnp.abs(denom) > 1e-20, (level - va) / jnp.where(denom == 0, 1.0, denom), 0.5),
            0.0,
            1.0,
        )
        verts = (p0.astype(jnp.float32) + tv[:, None] * (p1 - p0).astype(jnp.float32)) * spacing[None, :]

        # ---- faces: compact active cubes, then valid triangle slots ----
        codes = _codes(inside)
        active = ((codes > 0) & (codes < 255)).reshape(-1)
        (cube_idx,) = jnp.nonzero(active, size=mb, fill_value=0)
        ccode = codes.reshape(-1)[cube_idx].astype(jnp.int32)
        # padded slots may alias cube 0; mask by validity below
        cvalid = active[cube_idx]
        tris = tri_table[ccode]  # (mb, MAXT, 3)
        slot_valid = (tris[..., 0] >= 0) & cvalid[:, None]  # (mb, MAXT)
        (tslot,) = jnp.nonzero(slot_valid.reshape(-1), size=tb, fill_value=0)
        tvalid = slot_valid.reshape(-1)[tslot]
        tcube = cube_idx[tslot // MC_MAX_TRIS]
        tedges = tris.reshape(-1, 3)[tslot]  # (tb, 3) cube-edge ids

        ncy, ncz = ny - 1, nz - 1
        cpos = jnp.stack(
            [tcube // (ncy * ncz), (tcube // ncz) % ncy, tcube % ncz], axis=-1
        ).astype(jnp.int32)  # (tb, 3)
        eaxis = tedges // 4  # (tb, 3)
        ebase = cpos[:, None, :] + edge_base[tedges]  # (tb, 3, 3)
        esh = shapes[eaxis]  # (tb, 3, 3)
        elin = (ebase[..., 0] * esh[..., 1] + ebase[..., 1]) * esh[..., 2] + ebase[..., 2]
        egid = elin + jnp.take(jnp.asarray(offs), eaxis)
        faces = rank_all[egid] * jnp.where(tvalid, 1, 0)[:, None]  # (tb, 3)
        # exact triangle count, on the PRE-compaction mask (tvalid's padded
        # entries alias slot 0 via fill_value=0, so it can overcount). The
        # valid slots are compacted first by nonzero's ascending order, so
        # faces[:n_tris] are exactly the real rows.
        return verts, faces, jnp.sum(slot_valid.astype(jnp.int32))

    @functools.partial(jax.jit, static_argnames=("sx", "sy", "sz"))
    def slice_vol(vol, ax, ay, az, sx: int, sy: int, sz: int):
        return jax.lax.dynamic_slice(vol, (ax, ay, az), (sx, sy, sz))

    return count, extract, slice_vol


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _extract_dispatch(vol, level: float, spacing, counts: np.ndarray):
    """Dispatch the extract pass for one volume given its packed count/bbox
    row; returns (verts_dev (n,3), faces_dev (tb,3), n_tris_dev scalar,
    anchor_offset_xyz) with the device arrays still computing (no host
    sync), or None when empty. The EXACT triangle count comes back from the
    extract itself (the count pass only bounds it by 5/active cube — the
    per-cube LUT gather over the full volume cost ~200 ms/volume, 7x the
    rest of the count pass).

    The heavy compaction (nonzero + full cumsum ranks) runs on a SLICE
    covering the active bounding box (padded to multiples of 64 lattice
    points so slice shapes bucket into few compiled programs) — cartilage
    occupies a fraction of the scan, so this cuts the extract pass's data
    movement several-fold. The slice is real volume data (never synthetic
    padding), so it contains exactly the full volume's crossings."""
    import jax.numpy as jnp

    from oai_analysis_2_tpu.ops.bucketing import bucket_size

    _, extract, slice_vol = _device_fns()
    n_verts, n_active = (int(x) for x in counts[:2])
    if n_active == 0:
        return None
    lo = [int(counts[2]), int(counts[4]), int(counts[6])]
    hi = [int(counts[3]), int(counts[5]), int(counts[7])]
    anchors, sizes = [], []
    for axis, n in enumerate(vol.shape):
        need = hi[axis] - lo[axis] + 2  # lattice points spanning active cubes
        size = min(_round_up(need, 64), n)
        anchors.append(max(0, min(lo[axis], n - size)))
        sizes.append(size)
    sub = slice_vol(vol, *anchors, *sizes)

    vb = bucket_size(max(n_verts, 256))
    mb = bucket_size(max(n_active, 256))
    mb_val = bucket_size(max(n_active, 256))
    tb = min(bucket_size(max(MC_MAX_TRIS * n_active, 256)), MC_MAX_TRIS * mb_val)
    sp = jnp.asarray(np.asarray(spacing, np.float32))
    verts, faces, n_tris = extract(sub, jnp.float32(level), sp, vb, mb, tb)
    offset = np.asarray(anchors, np.float32) * np.asarray(spacing, np.float32)
    return verts[:n_verts], faces, n_tris, offset


def _extract_with_counts(vol, level: float, spacing, counts: np.ndarray) -> Mesh:
    """Extract pass + host pull for one volume (single-volume path)."""
    disp = _extract_dispatch(vol, level, spacing, counts)
    if disp is None:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    verts, faces, n_tris_dev, offset = disp
    n_tris = int(np.asarray(n_tris_dev))
    return Mesh(
        np.asarray(verts) + offset,
        np.asarray(faces[:n_tris], np.int32),
    )


def _marching_cubes_device(vol, level: float, spacing) -> Mesh:
    import jax.numpy as jnp

    count, _, _ = _device_fns()
    counts = np.asarray(count(vol, jnp.float32(level)))
    return _extract_with_counts(vol, level, spacing, counts)


def marching_cubes_multi(volumes, level: float = 0.5, spacing=(1.0, 1.0, 1.0),
                         devices=None):
    """Extract iso-surfaces of several same-shape [x,y,z] device volumes with
    ONE count pass + host sync for the whole set (the per-tissue sync costs a
    tunnel round trip each; get_thickness_meshes runs FC+TC together).

    `devices` (optional, one jax.Device per volume) places each volume's
    count + extract passes on that device via committed-input dispatch —
    with one device per knee the MC substage runs knee-parallel across a
    chip mesh, like the grouped smoothing and the per-knee distance
    kernels. When the device set is actually distinct the results are
    pulled per array after every dispatch is in flight (local chip pulls,
    not the batched-tunnel packing the single-device path needs)."""
    import jax
    import jax.numpy as jnp

    volumes = list(volumes)
    if not volumes:
        return []
    on_device = all(
        isinstance(v, jax.Array) and not isinstance(v, np.ndarray) for v in volumes
    )
    if not on_device or min(volumes[0].shape) < 2:
        return [marching_cubes(v, level, spacing) for v in volumes]
    count, _, _ = _device_fns()
    vols32 = [v.astype("float32") for v in volumes]
    if devices is not None:
        vols32 = [jax.device_put(v, d) for v, d in zip(vols32, devices)]
    if devices is not None and len({repr(d) for d in devices}) > 1:
        # knee-parallel: dispatch every count, pull each row; dispatch every
        # extract, pull each result — all dispatches precede any pull, so
        # the chips compute concurrently
        counts_dev = [count(v, jnp.float32(level)) for v in vols32]
        counts = [np.asarray(c) for c in counts_dev]
        dispatched = [
            _extract_dispatch(v, level, spacing, counts[i])
            for i, v in enumerate(vols32)
        ]
        out = []
        for d in dispatched:
            if d is None:
                out.append(
                    Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
                )
                continue
            verts, faces, n_tris, offset = d
            nf = int(np.asarray(n_tris))
            out.append(
                Mesh(np.asarray(verts) + offset,
                     np.asarray(faces[:nf], np.int32))
            )
        return out
    # per-volume count dispatch + ONE packed pull of the (T, 9) scalar rows:
    # stacking the volumes themselves for a batched count doubled the tissue
    # set's HBM footprint (~1.5 GB extra at B=8) right when run_batches
    # overlaps the next batch's device stages
    counts = np.asarray(jnp.stack([count(v, jnp.float32(level)) for v in vols32]))
    # dispatch every tissue's extract first, then pull ALL results in two
    # packed transfers (verts + faces) — per-tissue np.asarray pulls cost a
    # tunnel round-trip each and serialize the remaining extract compute
    # behind them (2 pulls x 16 tissues for an 8-knee batch)
    dispatched = [
        _extract_dispatch(v, level, spacing, counts[i])
        for i, v in enumerate(vols32)
    ]
    live = [d for d in dispatched if d is not None]
    # one SMALL pull for every exact triangle count (the extracts finish
    # computing behind it), then two packed pulls of the exact-size results
    ntris = (
        [int(x) for x in np.asarray(jnp.stack([n for _, _, n, _ in live]))]
        if live else []
    )
    packed_v = np.asarray(jnp.concatenate([v for v, _, _, _ in live])) if live else None
    packed_f = (
        np.asarray(jnp.concatenate([f[:n] for (_, f, _, _), n in zip(live, ntris)]))
        if live else None
    )
    out, vo, fo = [], 0, 0
    li = 0
    for d in dispatched:
        if d is None:
            out.append(Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)))
            continue
        verts, _, _, offset = d
        nv, nf = verts.shape[0], ntris[li]
        li += 1
        out.append(
            Mesh(packed_v[vo : vo + nv] + offset,
                 np.asarray(packed_f[fo : fo + nf], np.int32))
        )
        vo += nv
        fo += nf
    return out


def marching_cubes(
    volume,
    level: float = 0.5,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> Mesh:
    """Extract the `level` iso-surface of a 3D array indexed [x, y, z].

    Same contract as mesh/marching.py:marching_tetrahedra (spacing-scaled
    xyz index coordinates, ascent orientation); triangles per the 256-case
    MC table. jax-array inputs run entirely on device."""
    import jax

    if min(volume.shape) < 2:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    if isinstance(volume, jax.Array) and not isinstance(volume, np.ndarray):
        return _marching_cubes_device(volume.astype("float32"), level, spacing)
    vol = np.ascontiguousarray(np.asarray(volume, np.float32))
    return _marching_cubes_host(vol, level, spacing)
