"""Inner/outer cartilage surface splitting.

Reimplements the reference's clustering splits (mesh_processing.py:197-294):
  * tibial cartilage: one k=2 clustering of [normalized centroids x1,
    normals x10]; the cluster whose mean +y normal is positive is "inner";
  * femoral cartilage: the x-range is cut into `num_divisions` bands, each
    band clustered separately on [normalized centroids, normals,
    (center - centroid) * normal], labels stitched; same +y orientation rule.

Clustering runs on TPU (ops.clustering.kmeans); the orientation heuristic —
not RNG-stream identity — fixes which side is inner, matching the
reference's contract (mesh_processing.py:214, 236).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from oai_analysis_2_tpu.mesh.components import extract_faces
from oai_analysis_2_tpu.mesh.ops import face_centroids, face_normals
from oai_analysis_2_tpu.mesh.types import Mesh
from oai_analysis_2_tpu.ops.clustering import kmeans


def _normalize_centroids(c: np.ndarray) -> np.ndarray:
    if len(c) == 0:
        return c
    span = c.max(axis=0) - c.min(axis=0)
    return (c - c.mean(axis=0)) / np.where(span > 0, span, 1.0)


def _orient_inner(labels_pm1: np.ndarray, normals: np.ndarray) -> np.ndarray:
    """Flip labels so the -1 cluster has mean positive y-normal ("inner")."""
    if not np.any(labels_pm1 == -1):
        return -labels_pm1
    if normals[labels_pm1 == -1, 1].mean() < 0:
        labels_pm1 = -labels_pm1
    return labels_pm1


def split_tibial_cartilage_surface(
    mesh: Mesh, mesh_normals: np.ndarray, mesh_centroids: np.ndarray
) -> Tuple[Mesh, Mesh, np.ndarray, np.ndarray]:
    feats = np.concatenate(
        [_normalize_centroids(mesh_centroids) * 1.0, mesh_normals * 10.0], axis=1
    )
    labels, _ = kmeans(feats, k=2)
    labels = _orient_inner(labels * 2 - 1, mesh_normals)
    inner_faces = np.nonzero(labels == -1)[0]
    outer_faces = np.nonzero(labels == 1)[0]
    return (
        extract_faces(mesh, inner_faces),
        extract_faces(mesh, outer_faces),
        inner_faces,
        outer_faces,
    )


def split_femoral_cartilage_surface(
    mesh: Mesh,
    face_normal: np.ndarray,
    face_centroid: np.ndarray,
    num_divisions: int = 3,
) -> Tuple[Mesh, Mesh, np.ndarray, np.ndarray]:
    centroids_norm = _normalize_centroids(face_centroid)
    lo = mesh.vertices.min(axis=0)
    hi = mesh.vertices.max(axis=0)
    center = (lo + hi) / 2.0
    dot = (center - face_centroid) * face_normal  # per-axis products, as upstream

    x = centroids_norm[:, 0]
    labels = np.zeros(len(face_centroid))
    min_x, max_x = x.min(), x.max()
    step = (max_x - min_x) / num_divisions
    for i in range(num_divisions):
        lo_x = min_x + step * i
        hi_x = lo_x + step
        idx = np.nonzero((x >= lo_x) & (x < hi_x))[0]
        if len(idx) < 2:
            continue
        feats = np.concatenate(
            [centroids_norm[idx], face_normal[idx], dot[idx]], axis=1
        )
        band, _ = kmeans(feats, k=2)
        band = _orient_inner(band * 2 - 1, face_normal[idx])
        labels[idx] = band

    inner_faces = np.nonzero(labels == -1)[0]
    outer_faces = np.nonzero(labels == 1)[0]
    return (
        extract_faces(mesh, inner_faces),
        extract_faces(mesh, outer_faces),
        inner_faces,
        outer_faces,
    )


def split_mesh(mesh: Mesh, mesh_type: str = "FC") -> Tuple[Mesh, Mesh]:
    """Dispatch FC/TC split (reference split_mesh, mesh_processing.py:353-377)."""
    if mesh.n_cells < 2:
        # empty/degenerate surface (e.g. all-zero probability map): nothing to
        # split — return two empty meshes instead of crashing downstream
        empty = Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
        return empty, empty.copy()
    normals = face_normals(mesh)
    centroids = face_centroids(mesh)
    if mesh_type == "FC":
        inner, outer, _, _ = split_femoral_cartilage_surface(mesh, normals, centroids)
    else:
        inner, outer, _, _ = split_tibial_cartilage_surface(mesh, normals, centroids)
    return inner, outer
