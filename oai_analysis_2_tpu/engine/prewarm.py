"""Prewarm: pay the pipeline's compile/warmup cost before real data arrives.

The reference has no analog (its torch graphs build lazily per call); on
TPU the first knee through a fresh process pays XLA trace + compile (or
persistent-cache deserialize) for every program in the pipeline — minutes
on a single-core host (BENCH_r04: 131.8 s warm-cache). A long-lived
cohort worker should pay that at deploy time, not on its first claimed
knee, so `python -m oai_analysis_2_tpu prewarm` (or this function) runs
one synthetic knee at the production shape through the full pipeline:

  * populates the persistent XLA compile cache (utils.compile_cache) so
    EVERY later process on the host skips compilation, and
  * leaves the calling process hot (all executables loaded) so a
    subsequent `KneePipeline.run` on a real knee is steady-state.

The synthetic knee exercises exactly the production program set: compile
keys depend on shapes/dtypes, not values, so a phantom at the target grid
warms the same executables real data uses.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np


def prewarm(
    analysis_object=None,
    shape_zyx: Tuple[int, int, int] = (160, 384, 384),
    spacing_zyx: Tuple[float, float, float] = (0.7, 0.36, 0.36),
    registration_mode: str = "auto",
    finetune_steps: int = 20,
    instance_steps=(80, 60, 40),
    thickness: bool = True,
    seed: int = 0,
) -> dict:
    """Run one phantom knee through the full pipeline at ``shape_zyx``.

    Returns a timing breakdown dict: import/build/first-knee seconds and
    compile-cache entry counts before/after (how many programs this warm
    added to the host-persistent cache).
    """
    t0 = time.time()
    from oai_analysis_2_tpu.analysis_object import AnalysisObject
    from oai_analysis_2_tpu.core.image import image_from_array
    from oai_analysis_2_tpu.engine.pipeline import KneePipeline
    from oai_analysis_2_tpu.models.synthetic import random_phantom
    from oai_analysis_2_tpu.utils.compile_cache import cache_entry_count

    t_import = time.time() - t0

    cache_before = cache_entry_count()

    t0 = time.time()
    if analysis_object is None:
        analysis_object = AnalysisObject.offline(
            "phantom:%d,%d,%d" % tuple(shape_zyx)
        )
    rng = np.random.default_rng(seed)
    knee = image_from_array(
        random_phantom(rng, tuple(shape_zyx)).astype(np.float32),
        spacing=tuple(spacing_zyx)[::-1],
    )
    pipe = KneePipeline(
        analysis_object.segmenter,
        analysis_object.atlas_image,
        registration_config=None,  # adopt the shipped checkpoint's architecture
        instance_steps=tuple(instance_steps),
        registration_mode=registration_mode,
        finetune_steps=finetune_steps,
        warp_dtype="bfloat16",
    )
    t_build = time.time() - t0

    t0 = time.time()
    result = pipe.run(knee)
    t_first = time.time() - t0

    report = {
        "import_seconds": round(t_import, 1),
        "build_seconds": round(t_build, 1),
        "first_knee_seconds": round(t_first, 1),
        "prewarm_seconds": round(t_import + t_build + t_first, 1),
        "stage_seconds": {k: v["seconds"] for k, v in result.timings.items()},
        "compile_cache_entries_before": cache_before,
        "compile_cache_entries_after": cache_entry_count(),
        "shape_zyx": list(shape_zyx),
        "registration_mode": pipe.registerer.mode,
    }
    return report


def main(argv: Optional[list] = None) -> dict:
    """CLI entry: ``python -m oai_analysis_2_tpu prewarm [...]``."""
    import argparse
    import json

    parser = argparse.ArgumentParser(prog="oai_analysis_2_tpu prewarm")
    parser.add_argument(
        "--shape", default="160,384,384",
        help="z,y,x production grid to warm (default: reference OAI grid)",
    )
    parser.add_argument(
        "--registration-mode", default="auto",
        choices=("auto", "network", "instance"),
    )
    parser.add_argument("--finetune-steps", type=int, default=20)
    args = parser.parse_args(argv)

    shape = tuple(int(v) for v in args.shape.split(","))
    if len(shape) != 3:
        raise SystemExit(f"--shape wants 'D,H,W', got {args.shape!r}")
    report = prewarm(
        shape_zyx=shape,
        registration_mode=args.registration_mode,
        finetune_steps=args.finetune_steps,
    )
    print(json.dumps(report))
    return report
