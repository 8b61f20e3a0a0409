"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment so sharding tests
exercise real collectives without TPU hardware (SURVEY.md §4).

Escape hatch: OAI_TPU_TESTS=1 keeps the ambient platform (the real TPU via
the axon plugin) for the chip-gated tests (tests/test_tpu_chip.py) —
everything else should be run separately, on CPU.
"""

import os

_ON_CHIP = os.environ.get("OAI_TPU_TESTS") == "1"

if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This sandbox has a single CPU core; XLA compiles dominate test time.
# The persistent cache makes reruns cheap.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache" if _ON_CHIP else "/tmp/jax_test_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# A pytest plugin may import jax before this conftest runs, freezing the
# platform choice from the ambient environment (e.g. the TPU tunnel). Force
# the config directly — effective as long as no backend is initialized yet.
import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
