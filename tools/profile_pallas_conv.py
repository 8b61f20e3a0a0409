"""conv3d_zstack (Pallas shift-GEMM) vs XLA conv3d at production shapes.

Shapes: the full-resolution convs of the default auto z-slab inference
tiling (1x48x416x416 slabs) and the train-tile batch (8x32x128x128) —
the segment stage's dominant costs. Data is generated on device (host
pushes over the axon tunnel can stall for minutes).

Usage: python tools/profile_pallas_conv.py [substring-filter]
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from oai_analysis_2_tpu.models.unet3d import conv3d
from oai_analysis_2_tpu.ops.pallas_conv import conv3d_zstack

REPEATS = 10


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(_, acc):
            # keep the perturbed input in the ORIGINAL dtype — bf16 + f32
            # scalar promotes to f32, silently doubling every buffer
            y = fn((a[0] + acc).astype(a[0].dtype), *a[1:])
            return 1e-12 * jnp.mean(y).astype(jnp.float32)

        return lax.fori_loop(0, REPEATS, body, jnp.zeros((), jnp.float32))

    try:
        sync(loop(*args))
        t0 = time.time()
        sync(loop(*args))
        dt = (time.time() - t0) / REPEATS
        print(f"{name}: {dt*1000:.1f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — VMEM-overflow probes expected
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:160]})", flush=True)
        return None


CASES = [
    # (label, shape, cout, [pallas tile configs (tz, ty, stack_x);
    #  None = auto-picked tiles])
    ("slab enc0b  32->64",  (1, 48, 416, 416, 32), 64,
     [(None, None, False), (8, 1, False), (None, None, True)]),
    ("slab dec2a 192->64",  (1, 48, 416, 416, 192), 64,
     [(None, None, False), (4, 1, False), (2, 1, False)]),
    ("slab dec2b  64->64",  (1, 48, 416, 416, 64), 64,
     [(None, None, False), (8, 1, False), (4, 2, False)]),
    ("tile dec2a 192->64",  (8, 32, 128, 128, 192), 64,
     [(None, None, False), (8, 2, False), (4, 4, False)]),
    ("tile dec2b  64->64",  (8, 32, 128, 128, 64), 64,
     [(None, None, False), (8, 4, False), (8, 2, False)]),
]

only = sys.argv[1] if len(sys.argv) > 1 else None
key = jax.random.PRNGKey(0)
for label, shape, cout, configs in CASES:
    if only and only not in label:
        continue
    cin = shape[-1]
    kx, kk = jax.random.split(jax.random.fold_in(key, hash(label) % 2**31))
    x = jax.random.uniform(kx, shape, jnp.float32).astype(jnp.bfloat16)
    k = 0.2 * jax.random.normal(kk, (3, 3, 3, cin, cout), jnp.float32)
    jax.block_until_ready((x, k))

    dt_x = timed(f"{label} XLA conv3d", lambda v, p: conv3d(v, {"kernel": p}).astype(jnp.bfloat16), x, k)
    # on-chip parity vs the XLA conv (bf16 operands both ways)
    try:
        tz0, ty0, sx0 = configs[0]
        got = conv3d_zstack(x, k, out_dtype=jnp.float32,
                            tz=tz0, ty=ty0, stack_x=sx0)
        want = conv3d(x, {"kernel": k})
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want)))
        print(f"{label}: max|diff| {err:.3e} (scale {scale:.2f})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: parity check FAILED ({str(e)[:160]})", flush=True)
    best = None
    for tz, ty, stx in configs:
        dt = timed(
            f"{label} pallas tz{tz} ty{ty} sx{int(stx)}",
            lambda v, p, tz=tz, ty=ty, stx=stx: conv3d_zstack(
                v, p, relu=False, out_dtype=jnp.bfloat16,
                tz=tz, ty=ty, stack_x=stx),
            x, k)
        if dt is not None and (best is None or dt < best):
            best = dt
    if dt_x and best:
        print(f"{label}: SPEEDUP x{dt_x/best:.2f}", flush=True)
    del x, k
    import gc; gc.collect()
print("PROFILE_PALLAS_CONV_DONE")
