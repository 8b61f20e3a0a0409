"""Train a GradICON registration network on knee pairs.

The reference downloads 1.2 GB of pretrained icon_registration weights
(registration.py:20); this script produces equivalent weights natively:
random pairs of preprocessed knees, LNCC + gradient-inverse-consistency
loss, Adam, periodic native checkpoints.

Usage:
    python examples/train_gradicon.py <dir_with_nii_gz> <ckpt_dir> [steps]
"""

import sys
from pathlib import Path

# allow running from a source checkout without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



import numpy as np


def main():
    data_dir = Path(sys.argv[1])
    ckpt_dir = Path(sys.argv[2])
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    import jax
    import jax.numpy as jnp
    import optax

    from oai_analysis_2_tpu.core.nifti import read_nifti
    from oai_analysis_2_tpu.engine.registration import _net_grid_reference
    from oai_analysis_2_tpu.models.gradicon import (
        GradICON,
        GradICONConfig,
        make_gradicon_train_step,
    )
    from oai_analysis_2_tpu.ops.intensity import percentile_window
    from oai_analysis_2_tpu.ops.resample import resample_image
    from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

    cfg = GradICONConfig()
    model = GradICON(cfg, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(5e-5)
    opt_state = opt.init(params)
    step = make_gradicon_train_step(model, opt)

    # preload volumes onto the registration grid once
    volumes = []
    for p in sorted(data_dir.glob("*.nii.gz")):
        img = percentile_window(read_nifti(p))
        grid = _net_grid_reference(img, cfg.grid_shape)
        volumes.append(np.asarray(resample_image(img, grid).data))
    if len(volumes) < 2:
        raise SystemExit("need at least 2 volumes to sample pairs")
    volumes = np.stack(volumes)
    print(f"{len(volumes)} volumes on grid {cfg.grid_shape}")

    rng = np.random.default_rng(0)
    for i in range(steps):
        ia, ib = rng.choice(len(volumes), 2, replace=False)
        a = jnp.asarray(volumes[ia])[None]
        b = jnp.asarray(volumes[ib])[None]
        params, opt_state, loss = step(params, opt_state, a, b)
        if i % 50 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
        if i % 500 == 499 or i == steps - 1:
            save_checkpoint(
                {"params": {f"stage{k}": p for k, p in enumerate(params)}, "epoch": i},
                is_best=False,
                path=ckpt_dir,
                name="gradicon.npz",
            )
    print("done; checkpoint at", ckpt_dir / "gradicon.npz")


if __name__ == "__main__":
    main()
