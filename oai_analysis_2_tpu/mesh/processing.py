"""Top-level mesh/thickness API — the reference `mesh_processing.py` surface.

Function-for-function parity with the reference (file:line cited per
function); geometry containers are plain `Mesh` structs instead of the
itk/vtk/trimesh triple, and every hot kernel (smoothing, clustering,
distance, attribute transfer) runs on TPU via the ops modules.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from oai_analysis_2_tpu.core.image import Image
from oai_analysis_2_tpu.mesh.components import filter_small_components
from oai_analysis_2_tpu.mesh.marching import marching_tetrahedra
from oai_analysis_2_tpu.mesh.marching_cubes import marching_cubes
from oai_analysis_2_tpu.mesh.ops import (
    face_centroids,
    face_normals,
    get_distance,
    map_attributes,
    smooth_mesh,
)
from oai_analysis_2_tpu.mesh.projection import (
    get_cylinder,
    get_projection_from_circle_and_vertice,
    project_thickness,
    rasterize_thickness,
)
from oai_analysis_2_tpu.mesh.split import (
    split_femoral_cartilage_surface,
    split_mesh,
    split_tibial_cartilage_surface,
)
from oai_analysis_2_tpu.mesh.types import Mesh

__all__ = [
    "get_cell_centroid",
    "get_cell_normals",
    "get_distance",
    "get_mesh",
    "get_mesh_from_probability_map",
    "get_thickness_mesh",
    "get_vtk_mesh",
    "map_attributes",
    "project_thickness",
    "smooth_mesh",
    "split_mesh",
    "split_femoral_cartilage_surface",
    "split_tibial_cartilage_surface",
    "get_cylinder",
    "get_projection_from_circle_and_vertice",
]


def get_cell_centroid(mesh: Mesh) -> np.ndarray:
    """Per-face centroids (reference mesh_processing.py:26-40 — there a
    Python per-face loop; here one vectorized gather+mean)."""
    return face_centroids(mesh)


def get_cell_normals(mesh: Mesh) -> np.ndarray:
    """Per-face unit normals (reference mesh_processing.py:44-46)."""
    return face_normals(mesh)


def get_vtk_mesh(verts: np.ndarray, faces: np.ndarray, filter_threshold: int = 3000) -> Mesh:
    """Assemble a mesh from raw arrays and drop small connected components
    (reference get_vtk_mesh, mesh_processing.py:102-146, threshold at 127)."""
    return filter_small_components(Mesh(verts, faces), filter_threshold)


def _extract(vol_xyz, level, spacing, method: str) -> Mesh:
    if method == "mc":
        return marching_cubes(vol_xyz, level=level, spacing=spacing)
    if method == "tets":
        return marching_tetrahedra(vol_xyz, level=level, spacing=spacing)
    raise ValueError(f"unknown iso-surface method {method!r} (use 'mc' or 'tets')")


def get_mesh(
    image: Image,
    num_iterations: int = 150,
    level: float = 0.5,
    filter_threshold: int = 3000,
    method: str = "mc",
) -> Mesh:
    """Probability map -> smoothed surface mesh (reference get_mesh,
    mesh_processing.py:325-340): iso-surface at 0.5 on the [x,y,z]-indexed
    array with spacing-scaled coordinates and ascent orientation, small-
    component removal, then Laplacian smoothing.

    `method`: "mc" (default) = true marching cubes, reference-sized meshes
    (the reference's skimage Lewiner MC, mesh_processing.py:332); "tets" =
    marching tetrahedra (the validated cross-oracle, ~2-3x the triangles).

    N.B. the reference ignores its num_iterations argument (hardcodes 150 at
    mesh_processing.py:388) — here the argument is honored.
    """
    vol_xyz = _as_xyz(image)
    spacing = tuple(float(s) for s in np.asarray(image.spacing))
    raw = _extract(vol_xyz, level, spacing, method)
    mesh = filter_small_components(raw, filter_threshold)
    return smooth_mesh(mesh, num_iterations=num_iterations)


def _as_xyz(image: Image):
    """[z,y,x] image data -> [x,y,z] volume (reference's swapaxes at
    mesh_processing.py:329), staying on device when the data is a jax array
    so marching_tetrahedra can compute occupancy codes there."""
    import jax
    import jax.numpy as jnp

    if isinstance(image.data, jax.Array) and not isinstance(image.data, np.ndarray):
        return jnp.swapaxes(image.data.astype(jnp.float32), 0, 2)
    return np.swapaxes(np.asarray(image.data), 0, 2).astype(np.float32)


def get_mesh_from_probability_map(image: Image, level: float = 0.5, method: str = "mc") -> Mesh:
    """Alternative extraction path (reference get_mesh_from_probability_map,
    mesh_processing.py:343-349, via itk-cuberille): same iso-surface with
    vertices projected onto the iso-value, no smoothing/filtering."""
    return _extract(_as_xyz(image), level, tuple(
        float(s) for s in np.asarray(image.spacing)
    ), method)


def get_thickness_mesh(
    image: Image, mesh_type: str = "FC", num_iterations: int = 150, method: str = "mc"
) -> Tuple[Mesh, Mesh]:
    """Probability map -> (inner, outer) meshes with per-point thickness
    scalars (reference get_thickness_mesh, mesh_processing.py:381-395)."""
    mesh = get_mesh(image, num_iterations=num_iterations, method=method)
    inner_mesh, outer_mesh = split_mesh(mesh, mesh_type)
    return get_distance(inner_mesh, outer_mesh)


def get_thickness_meshes(
    images,
    mesh_types,
    num_iterations: int = 150,
    level: float = 0.5,
    filter_threshold: int = 3000,
    method: str = "mc",
    group_size: int = 0,
    smooth_sharding=None,
    distance_devices=None,
    mc_devices=None,
    timings_out: Optional[dict] = None,
):
    """Batched variant for multiple tissues (FC + TC of one or many knees):
    surfaces are extracted per map but Laplacian-smoothed together (the
    sequential 150-iteration loop is the latency floor of the thickness
    stage — paying it once amortizes it over every tissue).

    `group_size` > 0 stacks consecutive runs of that many tissues (one
    knee's FC+TC) into the vmapped per-group smoothing loop
    (`smooth_mesh_groups`), whose leading axis shards over a device mesh —
    pass `smooth_sharding` (a NamedSharding over that axis) to run each
    knee's smoothing on its own chip. group_size == 0 keeps the one-union
    loop. `distance_devices` (a list of jax.Device, one per tissue) places
    each tissue's distance kernels on that device — with one device per
    knee the distance substage runs knee-parallel across the mesh like the
    grouped smoothing. `mc_devices` (same shape) does the same for the
    marching-cubes count+extract passes. `timings_out` (a dict) receives per-substage wall
    seconds (mc/components/smooth/split/distance) — bench uses the smooth
    and distance shares to project their division across a device mesh.
    Returns [(inner, outer), ...].
    """
    import os
    import time as _time

    from oai_analysis_2_tpu.mesh.marching_cubes import marching_cubes_multi
    from oai_analysis_2_tpu.mesh.ops import smooth_mesh_groups, smooth_meshes

    # substage wall-clock prints for on-chip profiling (stderr), without
    # perturbing the production path: OAI_TPU_THICKNESS_PROFILE=1
    _prof = os.environ.get("OAI_TPU_THICKNESS_PROFILE") == "1"
    _t = _time.time()

    def _mark(name):
        nonlocal _t
        now = _time.time()
        if timings_out is not None:
            timings_out[name] = round(now - _t, 4)
        if _prof:
            import sys as _sys

            print(f"thickness[{name}]: {now - _t:.2f}s", file=_sys.stderr, flush=True)
        _t = now

    vols = [_as_xyz(image) for image in images]
    spacings = [tuple(float(s) for s in np.asarray(im.spacing)) for im in images]
    if method == "mc" and len(set(v.shape for v in vols)) == 1 and len(
        set(spacings)
    ) == 1:
        # one count pass + ONE host sync for the whole tissue set (or
        # knee-parallel dispatch when mc_devices spreads over a chip mesh)
        extracted = marching_cubes_multi(
            vols, level=level, spacing=spacings[0], devices=mc_devices)
    else:
        extracted = [
            _extract(v, level, sp, method) for v, sp in zip(vols, spacings)
        ]
    _mark("mc")
    raws = [filter_small_components(r, filter_threshold) for r in extracted]
    _mark("components")
    if group_size and len(raws) % group_size == 0:
        grouped = smooth_mesh_groups(
            [raws[i : i + group_size] for i in range(0, len(raws), group_size)],
            num_iterations=num_iterations,
            sharding=smooth_sharding,
        )
        smoothed = [m for g in grouped for m in g]
    else:
        smoothed = smooth_meshes(raws, num_iterations=num_iterations)
    _mark("smooth")
    # dispatch every distance kernel BEFORE pulling any result: each early
    # host sync is a tunnel round trip that serializes the remaining device
    # compute behind it (matters at 2 syncs/tissue x 2B tissues per batch)
    from oai_analysis_2_tpu.mesh.ops import _sync_distances, distance_to_surface_async
    from oai_analysis_2_tpu.mesh.split import split_meshes

    # ONE batched clustering program for every tissue's split (kmeans_many):
    # per-mesh splits cost 2 tunnel round-trips per k-means call
    pending = []
    splits = split_meshes(smoothed, list(mesh_types))
    _mark("split")
    for t, (inner, outer) in enumerate(splits):
        dev = distance_devices[t] if distance_devices is not None else None
        pending.append(
            (
                inner,
                outer,
                distance_to_surface_async(inner.vertices, outer, device=dev),
                distance_to_surface_async(outer.vertices, inner, device=dev),
            )
        )
    # ONE packed pull for every distance result (vs one round-trip each)
    flat_pending = [p for _, _, d_in, d_out in pending for p in (d_in, d_out)]
    flat_npts = [
        n for inner, outer, _, _ in pending for n in (inner.n_points, outer.n_points)
    ]
    distances = _sync_distances(flat_pending, flat_npts)
    _mark("distance")
    out = []
    for i, (inner, outer, _, _) in enumerate(pending):
        inner = inner.copy()
        outer = outer.copy()
        inner.point_data = distances[2 * i]
        outer.point_data = distances[2 * i + 1]
        out.append((inner, outer))
    return out
