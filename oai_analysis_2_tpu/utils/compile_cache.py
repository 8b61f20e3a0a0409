"""Persistent XLA compilation cache.

The pipeline's cold start is dominated by XLA compiles (segmenter program,
registration forward passes, scale runners, warp variants, marching-cubes
extraction, smoothing/distance buckets) — tens of minutes on first contact,
while the reference's *entire* pipeline is 148 s cold (BASELINE.md,
DaskComputation.ipynb cell 7). A persistent on-disk cache makes every
process after the first pay only trace + deserialize time.

Enabled automatically at package import (oai_analysis_2_tpu/__init__.py);
opt out with OAI_TPU_NO_COMPILE_CACHE=1, redirect with OAI_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os
import sys
from typing import Optional


def default_cache_dir() -> str:
    # JAX's own env var is honored too: when jax is pre-imported (e.g. by a
    # platform sitecustomize) the config-update path below runs instead of
    # the env setdefault path, and without this it would silently override a
    # user-set JAX_COMPILATION_CACHE_DIR with the package default.
    return (
        os.environ.get("OAI_TPU_CACHE_DIR")
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "oai_analysis_2_tpu", "xla")
    )


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `path` (created if
    missing). Works before OR after jax import; returns the active path, or
    None when disabled via OAI_TPU_NO_COMPILE_CACHE=1.

    Thresholds are zeroed so every executable is cached — the pipeline's
    program count is modest (tens) but individual compiles are expensive.
    """
    if os.environ.get("OAI_TPU_NO_COMPILE_CACHE") == "1":
        return None
    path = path or default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None

    if "jax" in sys.modules:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    else:
        # cheap path: plain env vars, honored when jax initializes later;
        # setdefault so an explicit user/conftest setting wins
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    return path


def cache_entry_count(path: Optional[str] = None) -> int:
    """Number of cached executables currently on disk (for bench reporting)."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or default_cache_dir()
    try:
        return sum(1 for _ in os.scandir(path))
    except OSError:
        return 0
