"""Segment-stage profiling on the real chip: where do the 2.6s go?

Times (a) the raw UNet forward on one tile batch, (b) the full fused
segment program, (c) tile-batch sweep, (d) per-level conv costs.
"""
import sys, time, json
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp

from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D, make_threshold_params

def t(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n

model = UNet3D(NETWORK_SPECS["UNet"].replace(bias=True), compute_dtype=jnp.bfloat16)
params = make_threshold_params(model, gain=24.0, threshold=0.5)
rng = np.random.default_rng(0)

N_TILES = 160  # production tiling of 160x384x384 at (32,128,128)/(16,96,96)

for bs in (4, 8, 16, 32):
    x = jnp.asarray(rng.uniform(0, 1, (bs, 32, 128, 128, 1)).astype(np.float32))
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    dt = t(fwd, params, x, n=max(2, 32 // bs))
    steps = -(-N_TILES // bs)
    print(f"UNet fwd bs={bs}: {dt*1000:.1f} ms/batch -> {dt*steps:.2f} s/knee ({steps} steps)")

# per-level cost: run partial networks by truncating the spec
from oai_analysis_2_tpu.models.unet3d import conv3d, maxpool2x
x = jnp.asarray(rng.uniform(0, 1, (8, 32, 128, 128, 1)).astype(np.float32)).astype(jnp.bfloat16)
lvl_in = x
enc = NETWORK_SPECS["UNet"].replace(bias=True).enc
total = 0.0
for li, (ca, cb) in enumerate(enc):
    pa = params[f"enc{li}a"]; pb = params[f"enc{li}b"]
    f = jax.jit(lambda a_, pa=pa, pb=pb: conv3d(conv3d(a_, pa).astype(jnp.bfloat16), pb))
    dt = t(f, lvl_in, n=4)
    total += dt
    print(f"enc level {li} ({lvl_in.shape} -> {cb}ch): {dt*1000:.1f} ms/batch -> {dt*20:.2f} s/knee")
    out = f(lvl_in).astype(jnp.bfloat16)
    if li < len(enc) - 1:
        lvl_in = maxpool2x(out)
print(f"encoder total: {total*20:.2f} s/knee at bs=8")
print(json.dumps({"done": True}))
