"""ctypes bindings for the native host-geometry kernels (native.cpp).

Builds lazily with `make` on first use if the shared library is missing;
every caller has a pure-Python/scipy fallback, so absence of a compiler is
never fatal.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libnative.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # `make` is a no-op when libnative.so is newer than native.cpp, and
        # rebuilds a stale .so (e.g. after a package update adds a symbol)
        subprocess.run(
            ["make", "-C", str(_DIR)], check=True, capture_output=True, timeout=120
        )
    except Exception:  # noqa: BLE001 — fall back to python paths
        if not _LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.uf_connected_components.restype = ctypes.c_int32
    lib.uf_connected_components.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mesh_edges.restype = ctypes.c_int64
    lib.mesh_edges.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    if hasattr(lib, "smooth_adjacency_csr"):
        lib.smooth_adjacency_csr.restype = ctypes.c_int64
        lib.smooth_adjacency_csr.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
    if hasattr(lib, "smooth_fill_table"):
        lib.smooth_fill_table.restype = None
        lib.smooth_fill_table.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
    _lib = lib
    return _lib


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def connected_components(n_points: int, faces: np.ndarray) -> Optional[np.ndarray]:
    """Per-point component labels, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    labels = np.empty(n_points, np.int32)
    lib.uf_connected_components(
        n_points, len(faces), _ptr(faces, ctypes.c_int32), _ptr(labels, ctypes.c_int32)
    )
    return labels


def smooth_adjacency(
    n_points: int, faces: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Smoothing adjacency as CSR (degree (N,), neighbors (total,)) with the
    boundary rule applied, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "smooth_adjacency_csr"):
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    deg = np.empty(n_points, np.int32)
    nbr = np.empty(max(6 * len(faces), 1), np.int32)
    total = lib.smooth_adjacency_csr(
        n_points,
        len(faces),
        _ptr(faces, ctypes.c_int32),
        _ptr(deg, ctypes.c_int32),
        _ptr(nbr, ctypes.c_int32),
    )
    return deg, nbr[:total]


def fill_table(
    deg: np.ndarray, nbr: np.ndarray, tbl: np.ndarray, slots=None
) -> bool:
    """Fill a dummy-initialized (nv, k) neighbor table from CSR in C++
    (optionally through a slot permutation). Returns False if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "smooth_fill_table"):
        return False
    deg = np.ascontiguousarray(deg, np.int32)
    nbr = np.ascontiguousarray(nbr, np.int32)
    assert tbl.dtype == np.int32 and tbl.flags.c_contiguous
    if slots is not None:
        slots = np.ascontiguousarray(slots, np.int64)
        sptr = _ptr(slots, ctypes.c_int64)
        has = 1
    else:
        sptr = ctypes.POINTER(ctypes.c_int64)()
        has = 0
    lib.smooth_fill_table(
        len(deg),
        _ptr(deg, ctypes.c_int32),
        _ptr(nbr, ctypes.c_int32),
        sptr,
        has,
        tbl.shape[1],
        _ptr(tbl, ctypes.c_int32),
    )
    return True


def mesh_edges(faces: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(unique undirected edges (E,2), boundary flags (E,)) or None."""
    lib = _load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    max_edges = 3 * len(faces)
    edges = np.empty((max_edges, 2), np.int32)
    boundary = np.empty(max_edges, np.uint8)
    n = lib.mesh_edges(
        len(faces),
        _ptr(faces, ctypes.c_int32),
        _ptr(edges, ctypes.c_int32),
        _ptr(boundary, ctypes.c_uint8),
    )
    return edges[:n], boundary[:n].astype(bool)
