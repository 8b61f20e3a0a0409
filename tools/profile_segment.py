"""Segment-stage profiling on the real chip: where do the ~2.5 s go?

Times the FUSED production segment program (`volume_fn`: pad -> scan(slice
-> UNet -> scatter) -> crop) at several scan batch sizes, plus an
encoder-only variant to split encoder/decoder cost. Everything measured is
a single jitted program per config — per-call timing of bare `model.apply`
over the TPU tunnel is dominated by per-dispatch latency (measured ~6x the
in-scan cost) and tells you nothing.
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import json
import numpy as np

import jax
import jax.numpy as jnp

from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D, make_threshold_params
from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint


def t(fn, *args, n=3, warmup=1):
    # N.B. force sync with a VALUE PULL: the axon backend's
    # block_until_ready can return before execution completes (measured
    # 0.000s "block" followed by a 15s value read), so timing must close
    # over a scalar readback.
    def sync(out):
        return float(jnp.asarray(out).ravel()[0])

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n


import tempfile
from pathlib import Path

tmp = Path(tempfile.mkdtemp(prefix="oai_profseg_"))
(tmp / "cfg.json").write_text(json.dumps({
    "patch_size": [128, 128, 32], "model": "UNet",
    "model_setting": {"in_channels": 1, "n_classes": 2, "bias": True, "BN": False},
}))
model = UNet3D(NETWORK_SPECS["UNet"].replace(bias=True))
params = make_threshold_params(model, gain=24.0, threshold=0.5)
save_checkpoint({"params": params, "epoch": 600}, False, tmp, name="seg.npz")

shape = (160, 384, 384)
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))

for bs in (4, 8, 10, 16, 20):
    seg = Segmenter3DInPatchClassWise(mode="pred", config={
        "ckpoint_path": str(tmp / "seg.npz"),
        "training_config_file": str(tmp / "cfg.json"),
        "batch_size": bs, "overlap_size": (16, 16, 8),
        "compute_dtype": "bfloat16",
    })
    seg.pred_setup()
    run = seg._segment_fn(shape, bs, threshold=False)
    dev_params = jax.device_put(seg.params)
    dt = t(run, dev_params, vol)
    n_tiles = seg.partition.num_tiles(shape)
    vps = n_tiles * int(np.prod(seg.partition.tile_size)) / dt
    print(f"fused segment bs={bs}: {dt:.2f} s/knee ({vps/1e6:.1f}M voxels/s)",
          flush=True)
print("PROFILE_SEGMENT_DONE")
