"""Programmatic 256-case marching-cubes triangle table.

Replaces skimage.measure.marching_cubes' Lewiner tables (reference
mesh_processing.py:332) without hand-typing 256x16 integer tables: the table
is DERIVED at import from the already-validated Kuhn marching-tetrahedra
case table (mesh/marching.py) by collapsing the tetrahedra-only vertices.

Construction. Marching tetrahedra over the Kuhn 6-tet cube decomposition
emits vertices on three kinds of segments: the 12 cube edges, the face
diagonals through corners 0/7, and the body diagonal — the latter two are
what double its triangle count versus marching cubes. For each of the 256
corner-sign codes we build the tet-surface triangulation combinatorially
(vertices labeled by their corner pair) and then remove every non-cube-edge
vertex by replacing its incident triangle fan with a fan over its link
polygon (closed cycle for the interior body-diagonal vertex, open path for
on-face diagonal vertices). The surface trace on a shared cube face then
depends only on that face's 4 corner signs plus the shared Kuhn face
diagonal, so adjacent cubes triangulate their common boundary identically:
the resulting table is hole-free (watertight) by construction — including on
the "ambiguous" faces that break the naive Lorensen-Cline table, because the
shared diagonal acts as the ambiguity decider for both neighbors.

Winding matches the tet table: normals (right-hand rule) point toward
higher field values — skimage's gradient_direction="ascent" (reference
mesh_processing.py:333).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from oai_analysis_2_tpu.mesh.marching import (
    _CORNER_OFFSETS,
    _TET_EDGES,
    _TET_PARITY,
    _TETS,
    _TRIS_TABLE,
)

# Cube-edge numbering: axis-major, (corner_a, corner_b) with corner index
# c = x + 2y + 4z (marching.py convention). Edge id = 4*axis + k.
EDGE_CORNERS = np.array(
    [
        # x-edges (bit 0)
        [0, 1], [2, 3], [4, 5], [6, 7],
        # y-edges (bit 1)
        [0, 2], [1, 3], [4, 6], [5, 7],
        # z-edges (bit 2)
        [0, 4], [1, 5], [2, 6], [3, 7],
    ],
    np.int64,
)

_PAIR_TO_EDGE: Dict[frozenset, int] = {
    frozenset(map(int, pair)): ei for ei, pair in enumerate(EDGE_CORNERS)
}


def _fan_triangulate(link: List[frozenset], closed: bool) -> List[Tuple[frozenset, ...]]:
    """Re-triangulate the region around a removed vertex from its link
    polygon. Orientation is inherited: link order follows the winding of the
    removed fan."""
    pts = list(link)
    if closed:
        if len(pts) < 3:
            return []
        return [(pts[0], pts[i], pts[i + 1]) for i in range(1, len(pts) - 1)]
    if len(pts) < 3:
        return []  # the fan collapses to the closing chord
    return [(pts[0], pts[i], pts[i + 1]) for i in range(1, len(pts) - 1)]


def _remove_vertex(tris: List[tuple], v: frozenset) -> List[tuple]:
    """Remove vertex label `v` from a combinatorial triangulation by link
    re-triangulation. The link may have several components (handled
    independently)."""
    keep, fan = [], []
    for t in tris:
        (fan if v in t else keep).append(t)
    if not fan:
        return tris
    # directed link edges: rotate each triangle so v is first -> (p, q)
    succ: Dict[frozenset, frozenset] = {}
    nodes = set()
    for t in fan:
        i = t.index(v)
        p, q = t[(i + 1) % 3], t[(i + 2) % 3]
        if p == q:  # degenerate sliver around v
            continue
        succ[p] = q
        nodes.add(p)
        nodes.add(q)
    # split into components: open paths start at nodes with no predecessor
    preds = set(succ.values())
    starts = [n for n in nodes if n in succ and n not in preds]
    visited = set()
    for start in starts:  # open paths (boundary vertex on a cube face)
        path = [start]
        visited.add(start)
        cur = start
        while cur in succ and succ[cur] not in visited:
            cur = succ[cur]
            path.append(cur)
            visited.add(cur)
        keep.extend(_fan_triangulate(path, closed=False))
    for n in list(nodes):  # remaining components are closed cycles
        if n in visited or n not in succ:
            continue
        cycle = [n]
        visited.add(n)
        cur = succ[n]
        while cur != n:
            cycle.append(cur)
            visited.add(cur)
            cur = succ[cur]
        keep.extend(_fan_triangulate(cycle, closed=True))
    return keep


def _tet_surface_tris(code: int) -> List[tuple]:
    """Combinatorial marching-tet triangulation of one cube code: triangles
    as label triples, label = frozenset{corner_a, corner_b} of the cut
    segment, winding identical to marching.py's numeric path."""
    tris: List[tuple] = []
    for t in range(6):
        corners = _TETS[t]
        case = 0
        for v in range(4):
            if code >> int(corners[v]) & 1:
                case |= 1 << v
        for k in range(2):
            edges = _TRIS_TABLE[case, k]
            if edges[0] < 0:
                continue
            e0, e1, e2 = (int(e) for e in edges)
            if _TET_PARITY[t] < 0:
                e1, e2 = e2, e1
            tri = []
            for e in (e0, e1, e2):
                a, b = _TET_EDGES[e]
                tri.append(frozenset({int(corners[a]), int(corners[b])}))
            tris.append(tuple(tri))
    return tris


def _build_mc_table() -> Tuple[np.ndarray, np.ndarray]:
    max_tris = 0
    per_code: List[List[Tuple[int, int, int]]] = []
    for code in range(256):
        tris = _tet_surface_tris(code)
        # remove the body-diagonal vertex first (interior: closed link),
        # then the six 0/7 face diagonals (boundary: open links)
        diag_labels = [frozenset({0, 7})] + [
            lab
            for t in tris
            for lab in t
            if lab not in _PAIR_TO_EDGE and lab != frozenset({0, 7})
        ]
        seen = set()
        for lab in diag_labels:
            if lab in seen:
                continue
            seen.add(lab)
            tris = _remove_vertex(tris, lab)
        out = []
        for t in tris:
            assert all(lab in _PAIR_TO_EDGE for lab in t), (code, t)
            ids = tuple(_PAIR_TO_EDGE[lab] for lab in t)
            if len(set(ids)) == 3:
                out.append(ids)
        per_code.append(out)
        max_tris = max(max_tris, len(out))

    table = -np.ones((256, max_tris, 3), np.int8)
    counts = np.zeros(256, np.int32)
    for code, tris in enumerate(per_code):
        counts[code] = len(tris)
        for ti, t in enumerate(tris):
            table[code, ti] = t
    return table, counts


MC_TRI_TABLE, MC_TRI_COUNT = _build_mc_table()
MC_MAX_TRIS = MC_TRI_TABLE.shape[1]
