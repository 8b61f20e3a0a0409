"""Per-level UNet conv cost on the real chip, dispatch-free.

Each encoder/decoder level runs REPEATS times inside one jitted fori_loop
(carrying the activation through a dummy add so XLA can't elide iterations),
at the production tile-batch shapes (bs=8 tiles of 32x128x128). Prints
ms/level and the implied s/knee contribution (20 scan steps per knee).
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp

from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D, conv3d, make_threshold_params, maxpool2x

REPEATS = 10
BS = 8
STEPS_PER_KNEE = 20  # 160 tiles / bs 8

spec = NETWORK_SPECS["UNet"].replace(bias=True)
model = UNet3D(spec, compute_dtype=jnp.bfloat16)
params = make_threshold_params(model, gain=24.0, threshold=0.5)
rng = np.random.default_rng(0)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def time_op(fn, x):
    @jax.jit
    def loop(x0):
        def body(_, acc):
            # acc (scalar) feeds the input so iterations serialize and XLA
            # cannot elide the repeated op; the mean readback is negligible
            y = fn(x0 + acc)
            return 1e-12 * jnp.mean(y).astype(x0.dtype)

        return jax.lax.fori_loop(0, REPEATS, body, jnp.zeros((), x0.dtype))

    sync(loop(x))
    t0 = time.time()
    out = loop(x)
    sync(out)
    return (time.time() - t0) / REPEATS


# encoder chain shapes
x = jnp.asarray(rng.uniform(0, 1, (BS, 32, 128, 128, 1)).astype(np.float32)).astype(jnp.bfloat16)
total = 0.0
act = x
for li, (ca, cb) in enumerate(spec.enc):
    pa, pb = params[f"enc{li}a"], params[f"enc{li}b"]
    dt_a = time_op(lambda v, p=pa: conv3d(v, p).astype(jnp.bfloat16), act)
    mid = conv3d(act, pa).astype(jnp.bfloat16)
    dt_b = time_op(lambda v, p=pb: conv3d(v, p).astype(jnp.bfloat16), mid)
    out = conv3d(mid, pb).astype(jnp.bfloat16)
    print(f"enc{li} {tuple(act.shape)}->{cb}ch: a {dt_a*1000:.1f}ms b {dt_b*1000:.1f}ms "
          f"-> {(dt_a+dt_b)*STEPS_PER_KNEE:.2f} s/knee", flush=True)
    total += dt_a + dt_b
    act = maxpool2x(out) if li < len(spec.enc) - 1 else out

print(f"encoder total: {total*STEPS_PER_KNEE:.2f} s/knee", flush=True)

# full network for comparison
fwd = lambda v: model.apply(params, v)
dt = time_op(fwd, x)
print(f"full UNet fwd: {dt*1000:.1f} ms/batch -> {dt*STEPS_PER_KNEE:.2f} s/knee", flush=True)
print("PROFILE_UNET_LEVELS_DONE")
