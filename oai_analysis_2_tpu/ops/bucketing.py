"""Shape bucketing for geometry kernels.

Meshes differ in size on every knee; naively jitting size-dependent kernels
recompiles per input (catastrophic on hosts where XLA compiles are slow and
wasteful everywhere). All geometry kernels pad their inputs to power-of-2
buckets so each bucket compiles once and the persistent cache carries it
across runs — the static-shapes doctrine applied to mesh data.
"""

from __future__ import annotations

import numpy as np


def bucket_size(n: int, minimum: int = 256) -> int:
    """Smallest power of two >= n (at least `minimum`)."""
    if n <= minimum:
        return minimum
    return 1 << int(np.ceil(np.log2(n)))


def pad_rows(arr: np.ndarray, n_padded: int, fill: float = 0.0) -> np.ndarray:
    """Pad dim0 of `arr` to n_padded with `fill`."""
    if arr.shape[0] == n_padded:
        return arr
    pad = [(0, n_padded - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)
