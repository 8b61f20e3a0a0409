"""Profile the B=8 batched thickness substages on the real chip.

Runs the bench fixture's batch pipeline at B=8 with
OAI_TPU_THICKNESS_PROFILE=1 so get_thickness_meshes prints per-substage
wall times (mc / components / smooth / split / distance) to stderr.
"""

import os
import sys
import time

os.environ["OAI_TPU_THICKNESS_PROFILE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_pipeline  # noqa: E402


def main():
    from oai_analysis_2_tpu.parallel.batch import BatchKneePipeline

    pipe, _, inputs = build_pipeline()
    bpipe = BatchKneePipeline(
        pipe.segmenter, pipe.atlas, mesh=None,
        registration_config=pipe.reg_config,
        registration_mode=pipe.registerer.mode,
        finetune_steps=20, warp_dtype="bfloat16",
    )
    knee = inputs["knee"]
    b8 = [knee] * 8
    print("== warmup (compile) ==", file=sys.stderr, flush=True)
    bpipe.run_batch(b8)
    for i in range(2):
        print(f"== sample {i} ==", file=sys.stderr, flush=True)
        t0 = time.time()
        r = bpipe.run_batch(b8)
        dt = time.time() - t0
        t = {k: v["seconds"] for k, v in r[0].timings.items()}
        print(f"total={dt:.2f}s timings={t}", file=sys.stderr, flush=True)
        del r


if __name__ == "__main__":
    main()
