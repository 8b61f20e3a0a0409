"""3D-conv lowering experiments on the real chip.

XLA-TPU runs our 3x3x3 NDHWC convs at ~15-20% MXU (tools/
profile_unet_levels.py). Variants tried here at the two heaviest shapes
(enc0b full-res 32->64 and the top decoder conv 96->64):

  conv3d    — production lax.conv_general_dilated 3D
  zdec      — kz-decomposed: 3 batched 2D convs over (y,x), z-shifted adds
  zdec-dot  — kz,ky-decomposed: 9 batched 1D convs
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from oai_analysis_2_tpu.models.unet3d import conv3d

REPEATS = 10


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def time_op(fn, x):
    @jax.jit
    def loop(x0):
        def body(_, acc):
            y = fn(x0 + acc)
            return 1e-12 * jnp.mean(y).astype(x0.dtype)

        return lax.fori_loop(0, REPEATS, body, jnp.zeros((), x0.dtype))

    sync(loop(x))
    t0 = time.time()
    out = loop(x)
    sync(out)
    return (time.time() - t0) / REPEATS


def conv3d_zdec(x, p):
    k = p["kernel"].astype(x.dtype)  # (3,3,3,Cin,Cout)
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = None
    for dz in range(3):
        xs = lax.dynamic_slice_in_dim(xp, dz, d, axis=1).reshape(b * d, h, w, c)
        y2 = lax.conv_general_dilated(
            xs, k[dz], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y2 if y is None else y + y2
    return y.reshape(b, d, h, w, -1).astype(jnp.float32)


def make_params(cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    return {"kernel": jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, cin, cout)).astype(np.float32))}


cases = [
    # the production UNet's conv shapes at tile-batch 8 (32x128x128 tiles)
    ("enc0a   1->32  @ full", (8, 32, 128, 128, 1), 32),
    ("enc0b  32->64  @ full", (8, 32, 128, 128, 32), 64),
    ("enc1a  64->64  @ 1/2", (8, 16, 64, 64, 64), 64),
    ("enc1b  64->128 @ 1/2", (8, 16, 64, 64, 64), 128),
    ("enc2b 128->256 @ 1/4", (8, 8, 32, 32, 128), 256),
    ("enc3b 256->512 @ 1/8", (8, 4, 16, 16, 256), 512),
    ("dec0c1 768->256 @ 1/4", (8, 8, 32, 32, 768), 256),
    ("dec0c2 256->256 @ 1/4", (8, 8, 32, 32, 256), 256),
    ("dec1c1 384->128 @ 1/2", (8, 16, 64, 64, 384), 128),
    ("dec1c2 128->128 @ 1/2", (8, 16, 64, 64, 128), 128),
    ("dec2c1 192->64  @ full", (8, 32, 128, 128, 192), 64),
    ("dec2c2  64->64  @ full", (8, 32, 128, 128, 64), 64),
]
rng = np.random.default_rng(1)
for name, shape, cout in cases:
    x = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32)).astype(jnp.bfloat16)
    p = make_params(shape[-1], cout)
    dt3 = time_op(lambda v, p=p: conv3d(v, p).astype(jnp.bfloat16), x)
    dtz = time_op(lambda v, p=p: conv3d_zdec(v, p).astype(jnp.bfloat16), x)
    # numerics check
    ref = conv3d(x, p)
    alt = conv3d_zdec(x, p)
    err = float(jnp.max(jnp.abs(ref - alt)))
    print(f"{name}: conv3d {dt3*1000:.1f}ms  zdec {dtz*1000:.1f}ms "
          f"(x{dt3/dtz:.2f})  max|diff| {err:.2e}", flush=True)
print("PROFILE_CONV_VARIANTS_DONE")
