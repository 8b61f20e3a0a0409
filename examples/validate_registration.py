"""Quantitative registration self-validation: known-deformation recovery.

Builds a DESS-sized phantom knee, deforms it with a KNOWN smooth
displacement field to synthesize a "moving" volume, registers the pair with
the production instance-optimization settings, and reports the error of the
recovered field inside the anatomy (mm) plus the image-match improvement.
This is the no-golden-data substitute for the reference's (smoke-only)
registration tests (test_all.py:72-99).

Usage:  python examples/validate_registration.py [vol_z vol_y vol_x]
            [--network [finetune_steps | s1,s2,...]] [--net-grid Z,Y,X]
            [--ft-scales S1,S2,...] [--ft-lr LR] [--weights PATH]

--weights evaluates a CANDIDATE checkpoint (e.g. a fresh training run)
instead of the shipped weights; its recorded architecture metadata
(stage_width/scales) configures the network, so candidates at any width
validate without code changes.

--network registers with the shipped trained GradICON weights (one forward
pass + optional per-pair fine-tuning steps) instead of full instance
optimization — the production "auto" path once weights exist.

--net-grid overrides the registration grid (GradICONConfig.grid_shape) —
the stages are fully convolutional, so trained weights run at ANY grid
divisible by max_scale*4; this is the accuracy-vs-grid-size sweep knob.
"""

import sys
from pathlib import Path

# allow running from a source checkout without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from oai_analysis_2_tpu.core.image import image_from_array
    from oai_analysis_2_tpu.engine.registration import register_pair
    from oai_analysis_2_tpu.models.gradicon import GradICONConfig
    from oai_analysis_2_tpu.ops.resample import (
        DisplacementField,
        resample_image,
        sample_displacement,
    )
    from oai_analysis_2_tpu.core.image import physical_grid

    # usage: [grid_z grid_y grid_x] [--network [finetune_steps]] — the
    # finetune count is the argument FOLLOWING --network, independent of
    # whether grid dims were given
    argv = sys.argv[1:]
    use_network = "--network" in argv
    finetune = 10
    if use_network:
        i = argv.index("--network")
        if i + 1 < len(argv) and argv[i + 1].replace(",", "").isdigit():
            spec = argv.pop(i + 1)  # "20" or per-scale "10,10"
            parts = [v for v in spec.split(",") if v]
            finetune = [int(v) for v in parts] if len(parts) > 1 else int(parts[0])
        argv.remove("--network")
    ft_scales = (2,)
    if "--ft-scales" in argv:
        i = argv.index("--ft-scales")
        ft_scales = tuple(int(v) for v in argv[i + 1].split(","))
        del argv[i : i + 2]
    ft_lr = 0.15
    if "--ft-lr" in argv:
        i = argv.index("--ft-lr")
        ft_lr = float(argv[i + 1])
        del argv[i : i + 2]
    if isinstance(finetune, list) and len(finetune) != len(ft_scales):
        raise SystemExit(
            f"--network gave {len(finetune)} per-scale step counts but "
            f"--ft-scales has {len(ft_scales)} scales"
        )
    inst_steps = (80, 60, 40)
    if "--inst-steps" in argv:
        i = argv.index("--inst-steps")
        inst_steps = tuple(int(v) for v in argv[i + 1].split(","))
        del argv[i : i + 2]
    inst_scales = (4, 2, 1)
    if "--inst-scales" in argv:
        i = argv.index("--inst-scales")
        inst_scales = tuple(int(v) for v in argv[i + 1].split(","))
        del argv[i : i + 2]
    gicon_grad = None  # None = package default (INSTANCE_DEFAULT_GICON_GRAD)
    if "--gicon-grad" in argv:
        i = argv.index("--gicon-grad")
        gicon_grad = argv[i + 1]
        del argv[i : i + 2]
    early_stop = None  # plateau early-stop tolerance (None = fixed step counts)
    if "--early-stop" in argv:
        i = argv.index("--early-stop")
        early_stop = float(argv[i + 1])
        del argv[i : i + 2]
    weights_path = None
    if "--weights" in argv:
        i = argv.index("--weights")
        weights_path = argv[i + 1]
        del argv[i : i + 2]
    net_grid = None
    if "--net-grid" in argv:
        i = argv.index("--net-grid")
        net_grid = tuple(int(v) for v in argv[i + 1].split(","))
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    shape = tuple(int(a) for a in args[:3]) if len(args) >= 3 else (80, 192, 192)
    spacing = (0.36, 0.36, 0.7)
    rng = np.random.default_rng(0)

    # phantom: two shells + texture
    z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")
    c = (shape[0] * 0.5, shape[1] * 0.55, shape[2] * 0.5)
    rr = np.sqrt(((z - c[0]) * 2.4) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
    r0 = shape[1] * 0.16
    shell = np.clip(1.0 - np.abs(rr - r0) / 3.0, 0, 1) * (y < c[1])
    vol = (shell * 0.8 + rng.uniform(0, 0.2, shape)).astype(np.float32)
    fixed = image_from_array(vol, spacing=spacing)

    # known smooth displacement (mm): low-frequency sinusoids, ~2.5 mm amplitude
    pts = np.asarray(physical_grid(shape, fixed.origin, fixed.spacing, fixed.direction))
    amp = 2.5
    gt = np.stack(
        [
            amp * np.sin(pts[..., 1] / 25.0) * np.cos(pts[..., 2] / 30.0),
            amp * np.cos(pts[..., 0] / 25.0) * np.sin(pts[..., 2] / 35.0),
            amp * np.sin(pts[..., 0] / 30.0) * np.cos(pts[..., 1] / 25.0),
        ],
        axis=-1,
    ).astype(np.float32)
    gt_field = DisplacementField(
        field=jnp.asarray(gt), origin=fixed.origin, spacing=fixed.spacing,
        direction=fixed.direction,
    )
    # moving(x) = fixed(x + gt(x)) — the pullback through the known field
    moving = resample_image(fixed, fixed, displacement=gt_field)

    t0 = time.time()
    if use_network:
        import dataclasses

        from oai_analysis_2_tpu.models.gradicon import (
            GradICON,
            load_gradicon_checkpoint,
        )

        params, meta = load_gradicon_checkpoint(weights_path)
        # candidate checkpoints carry their architecture; the grid stays
        # overridable (fully convolutional stages run at any /4-divisible
        # grid — the accuracy-vs-grid sweep knob)
        fields = {f.name for f in dataclasses.fields(GradICONConfig)}
        kw = {k: v for k, v in meta.items() if k in fields}
        if net_grid:
            kw["grid_shape"] = net_grid
        cfg = GradICONConfig(**kw)
        phi_ab, _ = register_pair(
            fixed, moving, model=GradICON(cfg), params=params,
            config=cfg, finetune_steps=finetune,
            finetune_scales=ft_scales, finetune_lr=ft_lr,
            gicon_grad=gicon_grad, early_stop=early_stop,
        )
    else:
        cfg = GradICONConfig(grid_shape=net_grid) if net_grid else GradICONConfig()
        phi_ab, _ = register_pair(
            fixed, moving, config=cfg,
            instance_scales=inst_scales, instance_steps=inst_steps,
            gicon_grad=gicon_grad, early_stop=early_stop,
        )
    jax.block_until_ready(phi_ab.field)
    dt = time.time() - t0

    # phi_ab maps moving-grid points into fixed space; ground truth for that
    # direction is the inverse of gt — compare by composing: a perfect result
    # warps `fixed` onto `moving`'s grid exactly like gt did.
    recovered = resample_image(fixed, moving, displacement=phi_ab)
    before = float(np.mean((np.asarray(fixed.data) - np.asarray(moving.data)) ** 2))
    after = float(np.mean((np.asarray(recovered.data) - np.asarray(moving.data)) ** 2))

    # field error where anatomy exists (direct, since moving/fixed share grids):
    est = np.asarray(sample_displacement(phi_ab, jnp.asarray(pts)))
    mask = shell > 0.5
    err = np.linalg.norm(est[mask] - gt[mask], axis=-1)
    mode = (
        f"network+ft{finetune}@scales{ft_scales}lr{ft_lr}"
        if use_network
        else "instance"
    ) + (f"+gicon:{gicon_grad}" if gicon_grad else "") + (
        f"+es{early_stop}" if early_stop is not None else ""
    )
    print(f"vol {shape}; net grid {cfg.grid_shape}; registration ({mode}) {dt:.1f}s")
    print(f"image MSE: before {before:.5f} -> after {after:.5f} ({after / before:.2%})")
    print(f"field error in anatomy (mm, GT amplitude {amp}): "
          f"mean {err.mean():.3f}  median {np.median(err):.3f}  p95 {np.percentile(err, 95):.3f}")


if __name__ == "__main__":
    main()
