"""Inference-tile-size sweep for the fused segment program on the real chip.

The reference contract tiles at the training patch (128,128,32) with
(16,16,8) overlap — only 28% of each tile's voxels are kept, i.e. 3.56x
redundant conv work per volume. The UNet is fully convolutional, so larger
inference tiles are valid; this sweep measures the production segment
program across tile shapes to calibrate the `inference_patch_size` dial.

Padded-work ratios on the 160x384x384 volume (tile z,y,x / effective):
  (32,128,128)/(16, 96, 96): 160 tiles, 83.9M padded voxels  (3.56x)
  (48,224,224)/(32,192,192):  20 tiles, 48.2M                (2.04x)
  (48,416,416)/(32,384,384):   5 tiles, 41.5M                (1.76x)
  (96,416,416)/(80,384,384):   2 tiles, 33.2M                (1.41x)
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
    # sync via value pull — axon's block_until_ready can return early
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

tmp = Path(tempfile.mkdtemp(prefix="oai_proftile_"))
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

# (inference_patch_size x,y,z or None for the training default, scan batch)
import os
_cases = os.environ.get("TILE_CASES", "416x416x48:1,224x224x48:4,416x416x96:1")
cases = []
for tok in _cases.split(","):
    tile, bs = tok.split(":")
    tile = None if tile == "none" else tuple(int(v) for v in tile.split("x"))
    cases.append((tile, int(bs)))
for tile, bs in cases:
    seg = Segmenter3DInPatchClassWise(mode="pred", config={
        "ckpoint_path": str(tmp / "seg.npz"),
        "training_config_file": str(tmp / "cfg.json"),
        "batch_size": bs, "overlap_size": (16, 16, 8),
        "compute_dtype": "bfloat16",
        "inference_patch_size": tile,
    })
    seg.pred_setup()
    run = seg._segment_fn(shape, bs, threshold=False)
    dev_params = jax.device_put(seg.params)
    try:
        dt = t(run, dev_params, vol)
    except Exception as e:  # noqa: BLE001 — report OOM/compile failure, keep sweeping
        print(f"tile={tile} bs={bs}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        continue
    n_tiles = seg.partition.num_tiles(shape)
    padded = n_tiles * int(np.prod(seg.partition.tile_size))
    print(f"tile={tile} bs={bs}: {dt:.2f} s/knee "
          f"({n_tiles} tiles, {padded/1e6:.1f}M padded voxels)", flush=True)
print("PROFILE_SEGMENT_TILES_DONE")
