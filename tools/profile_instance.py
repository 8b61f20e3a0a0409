"""Instance-optimization step cost breakdown on the real chip.

time_register.py showed ~0.32 s/step at the full 48x96x96 registration grid
(scale 1) — anomalously slow for ~1.3M field points. Hypothesis: the
gather-VJP of `gradicon_penalty`'s compose (the gathered ARRAY phi_ab
depends on the optimized field, so its cotangent is a full-grid scatter-add,
which TPUs serialize). Each variant runs N Adam steps inside ONE jitted
fori_loop (like production `_scale_run_fn`) so per-call tunnel dispatch
latency doesn't confound the per-step numbers.
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
import numpy as np

import jax
import jax.numpy as jnp
import optax

from oai_analysis_2_tpu.models.gradicon import (
    _identity_map_np, compose, diffusion_penalty, gradicon_penalty,
    make_similarity, warp,
)

shape_s = (48, 96, 96)
N_STEPS = 20
rng = np.random.default_rng(0)
a_s = jnp.asarray(rng.uniform(0, 1, shape_s).astype(np.float32))
b_s = jnp.asarray(rng.uniform(0, 1, shape_s).astype(np.float32))
ident = _identity_map_np(shape_s)
base = jnp.asarray(ident)
sim_fn = make_similarity("lncc+mse", 5)
optimizer = optax.adam(1.2 / 96.0)


def make_runner(sim=True, gicon="exact", diff=True, warp_bf16=True):
    def loss(p):
        pab = compose(base, ident + p["u_ab"])
        pba = compose(base, ident + p["u_ba"])
        total = 0.0
        if sim:
            bb = b_s.astype(jnp.bfloat16) if warp_bf16 else b_s
            aa = a_s.astype(jnp.bfloat16) if warp_bf16 else a_s
            wb = warp(bb, pab).astype(jnp.float32)
            wa = warp(aa, pba).astype(jnp.float32)
            total += sim_fn(a_s, wb) + sim_fn(b_s, wa)
        if gicon == "exact":
            total += 0.5 * gradicon_penalty(pab, pba)
        elif gicon == "stopgrad-outer":
            total += 0.5 * gradicon_penalty(jax.lax.stop_gradient(pab), pba)
        elif gicon == "sym-stopgrad":
            total += 0.25 * (
                gradicon_penalty(jax.lax.stop_gradient(pab), pba)
                + gradicon_penalty(pab, jax.lax.stop_gradient(pba))
            )
        if diff:
            total += 0.3 * (diffusion_penalty(pab) + diffusion_penalty(pba))
        return total

    @jax.jit
    def run(u0):
        params = {"u_ab": u0, "u_ba": u0}
        opt_state = optimizer.init(params)

        def body(_, carry):
            p, o = carry
            l, g = jax.value_and_grad(loss)(p)
            updates, o = optimizer.update(g, o, p)
            return (optax.apply_updates(p, updates), o)

        params, _ = jax.lax.fori_loop(0, N_STEPS, body, (params, opt_state))
        return params["u_ab"]

    return run


def t(fn, *args, n=4, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


u0 = jnp.zeros(shape_s + (3,), jnp.float32)

variants = [
    ("full (production)", make_runner()),
    ("no gradicon", make_runner(gicon=None)),
    ("gradicon stopgrad-outer", make_runner(gicon="stopgrad-outer")),
    ("gradicon sym-stopgrad", make_runner(gicon="sym-stopgrad")),
    ("no sim (penalties only)", make_runner(sim=False)),
    ("no diffusion", make_runner(diff=False)),
    ("sim only f32 warps", make_runner(gicon=None, diff=False, warp_bf16=False)),
]
for name, fn in variants:
    dt = t(fn, u0)
    print(f"{name}: {dt/N_STEPS*1000:.1f} ms/step ({dt:.2f}s / {N_STEPS} steps)",
          flush=True)
print("PROFILE_INSTANCE_DONE")
