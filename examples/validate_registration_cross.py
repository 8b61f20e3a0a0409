"""Cross-anatomy registration validation: two DIFFERENT phantoms.

Known-deformation recovery (validate_registration.py) checks same-subject
accuracy; real OAI registration is knee -> atlas, i.e. CROSS-subject, where
no ground-truth field exists. This validates that regime with the metrics
that ARE well-defined without GT (the ones registration papers report):

  * image-match improvement (MSE before/after, LNCC after),
  * inverse-consistency: || phi_AB o phi_BA - id || in voxels,
  * transform regularity: Jacobian-determinant stats + folded-voxel
    fraction (det J <= 0).

Usage: python examples/validate_registration_cross.py [--network [ft_steps]]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def jacobian_stats(phi, shape):
    """det(J) over the interior; phi normalized coords (D,H,W,3)."""
    scale = np.asarray(shape, np.float32) - 1.0
    pv = np.asarray(phi) * scale  # voxel units
    grads = []
    for axis in range(3):
        g = np.gradient(pv, axis=axis)  # d pv / d x_axis (voxel steps)
        grads.append(g)
    j = np.stack(grads, axis=-1)  # (D,H,W,3 comp,3 axis)
    det = np.linalg.det(j[2:-2, 2:-2, 2:-2])
    return det


def main():
    import jax
    import jax.numpy as jnp

    from oai_analysis_2_tpu.core.image import image_from_array
    from oai_analysis_2_tpu.engine.registration import register_pair
    from oai_analysis_2_tpu.models.gradicon import (
        GradICON,
        GradICONConfig,
        compose,
        identity_map,
        lncc,
        load_gradicon_params,
        warp,
    )
    from oai_analysis_2_tpu.models.synthetic import random_phantom

    use_network = "--network" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    finetune = int(args[0]) if args else 10

    cfg = GradICONConfig()
    shape = cfg.grid_shape
    rng = np.random.default_rng(2024)
    a_np = random_phantom(rng, shape)
    b_np = random_phantom(rng, shape)
    spacing = (0.36 * 4, 0.36 * 4, 0.7 * 3.33)  # production physical extent
    img_a = image_from_array(a_np, spacing=spacing)
    img_b = image_from_array(b_np, spacing=spacing)

    kwargs = {}
    mode = "instance"
    if use_network:
        kwargs = dict(model=GradICON(cfg), params=load_gradicon_params(),
                      finetune_steps=finetune)
        mode = f"network+ft{finetune}"

    t0 = time.time()
    # use the normalized-map internals directly for map-level metrics
    from oai_analysis_2_tpu.engine.registration import _net_grid_reference
    from oai_analysis_2_tpu.ops.resample import resample_image

    grid_a = _net_grid_reference(img_a, shape)
    grid_b = _net_grid_reference(img_b, shape)
    a = resample_image(img_a, grid_a).data.astype(jnp.float32)
    b = resample_image(img_b, grid_b).data.astype(jnp.float32)

    if use_network:
        model, params = kwargs["model"], kwargs["params"]
        nmap_ab, nmap_ba = jax.jit(model.both_maps)(params, a, b)
        if finetune:
            from oai_analysis_2_tpu.models.gradicon import register_pair_instance

            nmap_ab, nmap_ba = register_pair_instance(
                a, b, scales=(2,), steps_per_scale=finetune,
                init_ab=nmap_ab, init_ba=nmap_ba,
            )
    else:
        from oai_analysis_2_tpu.models.gradicon import register_pair_instance

        nmap_ab, nmap_ba = register_pair_instance(
            a, b, scales=(4, 2, 1), steps_per_scale=(80, 60, 40)
        )
    jax.block_until_ready(nmap_ab)
    dt = time.time() - t0

    warped_b = warp(b, nmap_ab)
    mse_before = float(jnp.mean((a - b) ** 2))
    mse_after = float(jnp.mean((a - warped_b) ** 2))
    lncc_after = float(lncc(a, warped_b))

    ident = identity_map(shape)
    ic = compose(nmap_ab, nmap_ba) - ident
    scale = jnp.asarray([s - 1.0 for s in shape], jnp.float32)
    ic_vox = np.asarray(jnp.sqrt(jnp.sum((ic * scale) ** 2, axis=-1)))
    interior = ic_vox[4:-4, 4:-4, 4:-4]

    det = jacobian_stats(nmap_ab, shape)
    print(f"mode {mode}; registration {dt:.1f}s on grid {shape}")
    print(f"image MSE: before {mse_before:.5f} -> after {mse_after:.5f} "
          f"({mse_after / mse_before:.1%}); LNCC-loss after {lncc_after:.4f}")
    print(f"inverse consistency |phi_AB o phi_BA - id| (vox, interior): "
          f"mean {interior.mean():.3f} median {np.median(interior):.3f} "
          f"p95 {np.percentile(interior, 95):.3f}")
    print(f"Jacobian det: median {np.median(det):.3f} "
          f"[p1 {np.percentile(det, 1):.3f}, p99 {np.percentile(det, 99):.3f}], "
          f"folded {float((det <= 0).mean()):.2%}")


if __name__ == "__main__":
    main()
