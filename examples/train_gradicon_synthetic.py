"""Train the shipped GradICON registration weights on synthetic phantoms.

The reference's registration is a pretrained 1.2 GB download
(oai_analysis/registration.py:18-27). This sandbox has no OAI data, so the
TPU-native weights are trained self-supervised (LNCC + gradient inverse
consistency needs no labels) on procedurally generated knee-like phantoms
(`models/synthetic.py`) — random pairs of different anatomies plus pairs of
random smooth warps of the same anatomy.

Progress is tracked by a known-deformation recovery eval: a held-out
phantom is deformed by a known smooth field and the network's recovered
field is compared in voxels. The best checkpoint lands at
`oai_analysis_2_tpu/weights/gradicon.npz`, where `ICON_Registration`
auto-loads it (mode="auto" -> "network").

Usage:
    python examples/train_gradicon_synthetic.py [steps] [batch] [out.npz]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_eval_pair(shape, seed=12345):
    """Held-out phantom + known smooth deformation (normalized units)."""
    from oai_analysis_2_tpu.models.synthetic import random_phantom

    rng = np.random.default_rng(seed)
    fixed = random_phantom(rng, shape)
    d, h, w = shape
    z, y, x = np.meshgrid(
        np.linspace(0, 1, d, dtype=np.float32),
        np.linspace(0, 1, h, dtype=np.float32),
        np.linspace(0, 1, w, dtype=np.float32),
        indexing="ij",
    )
    # ~5-voxel amplitude smooth sinusoid field, normalized units
    amp = 0.05
    g = np.stack(
        [
            amp * np.sin(3.1 * y + 0.7) * np.cos(2.3 * x),
            amp * np.cos(2.9 * z) * np.sin(3.7 * x + 1.1),
            amp * np.sin(2.1 * z + 0.4) * np.cos(3.3 * y),
        ],
        axis=-1,
    ).astype(np.float32)
    return fixed, g


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out_path = (
        Path(sys.argv[3])
        if len(sys.argv) > 3
        else Path(__file__).resolve().parent.parent
        / "oai_analysis_2_tpu"
        / "weights"
        / "gradicon.npz"
    )

    import jax
    import jax.numpy as jnp
    import optax

    from oai_analysis_2_tpu.models.gradicon import (
        GradICON,
        GradICONConfig,
        identity_map,
        warp,
    )
    from oai_analysis_2_tpu.models.synthetic import (
        make_augmented_train_step,
        make_phantom_pool,
        random_lowres_field,
    )
    from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

    width = int(os.environ.get("GRADICON_WIDTH", "16"))
    grid = tuple(
        int(v) for v in os.environ.get("GRADICON_GRID", "48,96,96").split(",")
    )
    cfg = GradICONConfig(grid_shape=grid, stage_width=width)
    shape = cfg.grid_shape
    print(f"config: grid {shape} width {width}", flush=True)
    model = GradICON(cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    resume = os.environ.get("GRADICON_RESUME")
    if resume:  # continue training from an existing checkpoint
        from oai_analysis_2_tpu.models.gradicon import load_gradicon_params

        params = load_gradicon_params(resume)
        print(f"resumed from {resume}", flush=True)

    sup_w = float(os.environ.get("GRADICON_SUP_W", "0.3"))
    sim_w = float(os.environ.get("GRADICON_SIM_W", "1.0"))
    peak_lr = float(os.environ.get("GRADICON_LR", "5e-4"))
    print(f"hyperparams: sup_w {sup_w} sim_w {sim_w} peak_lr {peak_lr}", flush=True)
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=min(100, steps // 10 + 1),
        decay_steps=steps,
        end_value=2e-5,
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)
    step = make_augmented_train_step(model, opt, sup_weight=sup_w, sim_weight=sim_w)

    print("generating phantom pool...", flush=True)
    pool = make_phantom_pool(
        int(os.environ.get("GRADICON_POOL", "96")), shape, seed=7
    )
    pool_dev = jnp.asarray(pool)

    # -- eval: known-deformation recovery ------------------------------------
    eval_fixed_np, eval_g_np = build_eval_pair(shape)
    eval_fixed = jnp.asarray(eval_fixed_np)
    eval_g = jnp.asarray(eval_g_np)
    eval_model = GradICON(cfg)  # f32 — the production inference dtype
    ident = identity_map(shape)
    eval_moving = warp(eval_fixed, ident + eval_g)
    scale_vox = jnp.asarray([s - 1.0 for s in shape], jnp.float32)

    @jax.jit
    def eval_err(p):
        # forward_map(params, a=moving, b=fixed) returns psi with
        # fixed(psi(x)) ~= moving(x) = fixed(x + g(x))  =>  psi ~= id + g
        psi = eval_model.forward_map(p, eval_moving, eval_fixed)
        err = (psi - ident - eval_g) * scale_vox  # voxel units
        mask = eval_moving > 0.5
        e = jnp.sqrt(jnp.sum(err * err, axis=-1))
        return jnp.sum(e * mask) / jnp.sum(mask), jnp.mean(e)

    rng = np.random.default_rng(int(os.environ.get("GRADICON_SEED", "42")))
    lowres = tuple(
        int(v) for v in os.environ.get("GRADICON_LOWRES", "6,12,12").split(",")
    )
    same_frac = float(os.environ.get("GRADICON_SAME", "0.7"))

    def _ramp(spec: str, frac: float) -> float:
        """'a:b' -> linear ramp a->b over training (deformation-magnitude
        curriculum); plain 'a' -> constant."""
        parts = [float(v) for v in spec.split(":")]
        return parts[0] if len(parts) == 1 else parts[0] + (parts[1] - parts[0]) * frac

    amp_spec = os.environ.get("GRADICON_AMP", "0.05")
    trans_spec = os.environ.get("GRADICON_TRANS", "0.04")

    def sample_batch(step_i):
        frac = step_i / max(steps - 1, 1)
        amp = _ramp(amp_spec, frac)
        trans = _ramp(trans_spec, frac)
        ia = rng.integers(0, len(pool), batch)
        same = rng.random(batch) < same_frac  # known-correspondence pairs
        ib = np.where(same, ia, rng.integers(0, len(pool), batch))
        ua = np.stack(
            [random_lowres_field(rng, lowres, amplitude=amp, translation=trans)
             for _ in range(batch)]
        )
        ub = np.stack(
            [random_lowres_field(rng, lowres, amplitude=amp, translation=trans)
             for _ in range(batch)]
        )
        return (
            pool_dev[jnp.asarray(ia)],
            pool_dev[jnp.asarray(ib)],
            jnp.asarray(ua),
            jnp.asarray(ub),
            jnp.asarray((same | (ia == ib)).astype(np.float32)),
        )

    # never overwrite a better checkpoint from a previous cycle (warm-restart
    # training): start the best-tracker from GRADICON_BEST if given
    best = float(os.environ.get("GRADICON_BEST", "inf"))
    out_path.parent.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    for i in range(steps):
        va, vb, ua, ub, same = sample_batch(i)
        params, opt_state, (loss, sim, reg, sup) = step(
            params, opt_state, va, vb, ua, ub, same
        )
        if i % 25 == 0:
            print(
                f"step {i}: loss {float(loss):.4f} sim {float(sim):.4f} "
                f"reg {float(reg):.4f} sup {float(sup):.3f} ({time.time() - t0:.0f}s)",
                flush=True,
            )
        if i % 125 == 124 or i == steps - 1:
            e_mask, e_all = eval_err(params)
            e_mask = float(e_mask)
            print(
                f"step {i}: eval recovery error {e_mask:.3f} vox (anatomy) "
                f"{float(e_all):.3f} vox (all)",
                flush=True,
            )
            if e_mask < best:
                best = e_mask
                save_checkpoint(
                    {
                        "params": {f"stage{k}": p for k, p in enumerate(params)},
                        "epoch": i,
                        # architecture metadata: lets ICON_Registration adapt
                        # its default config to whatever width/grid shipped
                        "stage_width": width,
                        "grid_shape": list(shape),
                        "scales": list(cfg.scales),
                    },
                    is_best=False,
                    path=out_path.parent,
                    name=out_path.name,
                )
                # sidecar best-tracker: lets warm-restart cycles resume the
                # tracker (GRADICON_BEST=$(cat out.best)) without risking a
                # worse later cycle overwriting a better checkpoint
                (out_path.parent / (out_path.name + ".best")).write_text(f"{best:.6f}")
                print(f"  saved {out_path} (best {best:.3f} vox)", flush=True)
    print(f"done in {time.time() - t0:.0f}s; best eval {best:.3f} vox")


if __name__ == "__main__":
    main()
