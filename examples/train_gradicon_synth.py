"""Train GradICON registration weights on synthetic knee phantoms — on-TPU.

The reference ships ~1.2 GB of pretrained icon_registration weights
(oai_analysis/registration.py:20); no OAI volumes exist in this sandbox, so
this script trains the network self-supervised on procedurally generated
pairs: cartilage-like shell phantoms with randomized geometry (cross-subject
variation) warped by random smooth displacement fields (deformation), with
matched intensity statistics to the production inputs (percentile-windowed
DESS volumes in [0, 1]).

TPU-first: phantom pairs are synthesized ON DEVICE inside the jitted train
step from PRNG keys (no host->device input pipeline at all), and the loop is
chunked with `lax.scan` so one dispatch covers many steps over the tunnel.

Usage:
    python examples/train_gradicon_synth.py [--steps N] [--out PATH] [--smoke]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=25, help="steps per jit dispatch")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", type=str, default="oai_analysis_2_tpu/weights/gradicon.npz")
    ap.add_argument("--resume", type=str, default=None, help="npz checkpoint to start from")
    ap.add_argument("--smoke", action="store_true", help="tiny CPU smoke test")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    from oai_analysis_2_tpu.models.gradicon import (
        GradICON,
        GradICONConfig,
        identity_map,
        load_gradicon_params,
        warp,
    )
    from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

    grid = (16, 32, 32) if args.smoke else (48, 96, 96)
    cfg = GradICONConfig(grid_shape=grid, similarity="lncc+mse", mse_weight=10.0)
    model = GradICON(cfg, compute_dtype=jnp.bfloat16)
    d, h, w = grid
    ident = identity_map(grid)
    scale_vox = jnp.asarray([d - 1.0, h - 1.0, w - 1.0], jnp.float32)

    # -- on-device phantom pair generator -------------------------------------
    # Geometry mirrors the production inputs: an FC-like polar-cap shell plus a
    # smaller TC-like shell, normalized intensities, uniform background noise
    # (bench.py:_shell_probmap / examples/validate_registration.py phantom).
    zz, yy, xx = jnp.meshgrid(
        jnp.linspace(0.0, 1.0, d), jnp.linspace(0.0, 1.0, h), jnp.linspace(0.0, 1.0, w),
        indexing="ij",
    )

    def render(theta):
        """theta: (n_shells, 8) rows [cz, cy, cx, r0, width, ecc, cap, gain]."""

        def one_shell(row):
            cz, cy, cx, r0, wid, ecc, cap, gain = (row[i] for i in range(8))
            rr = jnp.sqrt(((zz - cz) * ecc) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
            shell = jnp.clip(1.0 - jnp.abs(rr - r0) / wid, 0.0, 1.0)
            capmask = jnp.where(cap > 0.5, (yy < cy).astype(jnp.float32), 1.0)
            return shell * capmask * gain

        return jnp.max(jax.vmap(one_shell)(theta), axis=0)

    def sample_theta(key):
        ks = jax.random.split(key, 8)
        u = lambda k, lo, hi, shape=(): jax.random.uniform(k, shape, minval=lo, maxval=hi)
        # FC-like cap shell + TC-like small shell; positions/radii normalized
        fc = jnp.stack(
            [
                u(ks[0], 0.40, 0.60),  # cz
                u(ks[1], 0.45, 0.65),  # cy
                u(ks[2], 0.40, 0.60),  # cx
                u(ks[3], 0.12, 0.20),  # r0
                u(ks[4], 0.012, 0.035),  # width
                u(ks[5], 0.8, 1.6),  # z-eccentricity
                jnp.float32(1.0),  # cap on
                u(ks[6], 0.6, 0.9),  # gain
            ]
        )
        kt = jax.random.split(ks[7], 8)
        tc = jnp.stack(
            [
                fc[0] + u(kt[0], -0.05, 0.05),
                fc[1] + u(kt[1], 0.02, 0.12),  # below the FC cap
                fc[2] + u(kt[2], -0.05, 0.05),
                u(kt[3], 0.07, 0.13),
                u(kt[4], 0.010, 0.030),
                u(kt[5], 0.8, 1.6),
                jnp.float32(0.0),
                u(kt[6], 0.6, 0.9),
            ]
        )
        return jnp.stack([fc, tc])

    def smooth_field(key, amp):
        """Random smooth displacement, (D,H,W,3) normalized units."""
        low = jax.random.normal(key, (5, 10, 10, 3), jnp.float32)
        u = jax.image.resize(low, grid + (3,), method="trilinear")
        return u * amp

    def gen_pair(key):
        ks = jax.random.split(key, 8)
        theta = sample_theta(ks[0])
        # cross-subject jitter: perturb geometry for the second volume
        jit_pos = jax.random.uniform(ks[1], (2, 8), minval=-1.0, maxval=1.0)
        jitter_scale = jnp.asarray([0.05, 0.05, 0.05, 0.015, 0.004, 0.1, 0.0, 0.08])
        theta_b = theta + jit_pos * jitter_scale
        amp = jax.random.uniform(ks[2], (), minval=0.005, maxval=0.045)
        u = smooth_field(ks[3], amp)
        noise_a = jax.random.uniform(ks[4], grid, minval=0.0, maxval=1.0)
        noise_b = jax.random.uniform(ks[5], grid, minval=0.0, maxval=1.0)
        na = jax.random.uniform(ks[6], (), minval=0.10, maxval=0.30)
        nb = jax.random.uniform(ks[7], (), minval=0.10, maxval=0.30)
        a = render(theta) + noise_a * na
        b = warp(render(theta_b), ident + u) + noise_b * nb
        return a, b

    opt = optax.adam(args.lr)

    def chunk_runner(chunk_steps):
        @jax.jit
        def run_chunk(params, opt_state, key):
            def body(carry, k):
                params, opt_state = carry
                a, b = jax.vmap(gen_pair)(jax.random.split(k, args.batch))

                def batch_loss(p):
                    def one(a1, b1):
                        l, _ = model.loss(p, a1, b1)
                        return l

                    return jnp.mean(jax.vmap(one)(a, b))

                loss_val, grads = jax.value_and_grad(batch_loss)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss_val

            (params, opt_state), losses = lax.scan(body, (params, opt_state), jax.random.split(key, chunk_steps))
            return params, opt_state, losses

        return run_chunk

    # -- held-out eval: known-deformation recovery (network forward only) -----
    @jax.jit
    def eval_err_vox(params):
        k = jax.random.PRNGKey(12345)
        ks = jax.random.split(k, 4)
        theta = sample_theta(ks[0])
        fixed_anat = render(theta)
        u_gt = smooth_field(ks[1], 0.03)
        fixed = fixed_anat + jax.random.uniform(ks[2], grid, maxval=1.0) * 0.2
        moving = warp(fixed, ident + u_gt)
        # forward_map(a=moving, b=fixed) should recover ident + u_gt
        phi = model.forward_map(params, moving, fixed)
        err = jnp.linalg.norm((phi - (ident + u_gt)) * scale_vox, axis=-1)
        mask = warp(fixed_anat, ident + u_gt) > 0.3
        return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    if args.resume:
        params = load_gradicon_params(args.resume)
        print(f"resumed from {args.resume}")
    else:
        params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    run_chunk = chunk_runner(args.chunk)

    out = Path(args.out)
    best = float("inf")
    key = jax.random.PRNGKey(42)
    n_chunks = max(args.steps // args.chunk, 1)
    t0 = time.time()
    for ci in range(n_chunks):
        key, sub = jax.random.split(key)
        params, opt_state, losses = run_chunk(params, opt_state, sub)
        err = float(eval_err_vox(params))
        loss_last = float(losses[-1])
        step = (ci + 1) * args.chunk
        dt = time.time() - t0
        print(
            f"step {step:5d}  loss {loss_last:.4f}  eval_err {err:.3f} vox  "
            f"({dt / step:.2f} s/step)",
            flush=True,
        )
        if err < best:
            best = err
            save_checkpoint(
                {
                    "params": {f"stage{i}": p for i, p in enumerate(params)},
                    "epoch": step,
                    "best_score": err,
                },
                is_best=False,
                path=out.parent,
                name=out.name,
            )
    print(f"done in {time.time() - t0:.0f}s; best eval_err {best:.3f} vox; weights at {out}")


if __name__ == "__main__":
    main()
