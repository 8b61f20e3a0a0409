"""End-to-end single-knee pipeline benchmark.

Measures the reference's headline workload (SURVEY.md §6, BASELINE.md):
segmentation (full `UNet` on a 160x384x384 DESS-sized volume, overlap-tiled)
+ atlas registration + probability-map warps onto the atlas grid + FC/TC
thickness meshes. The reference does this in 148 s on a Colab GPU
(DaskComputation.ipynb cell 7) => 24.3 knees/hour baseline.

Weights are random (the pretrained checkpoint is a network download); the
compute graph, shapes and batch sizes are the production configuration.
The thickness stage runs on anatomically-shaped synthetic probability maps
(a curved shell -> ~reference-sized meshes, test_all.py:69-70) because
random-weight probmaps have no surface.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_KNEES_PER_HOUR = 3600.0 / 148.0  # reference Colab GPU pipeline


def _shell_probmap(shape_zyx, r_inner=60.0, r_outer=66.0, center=None):
    """A curved cartilage-like shell (probability ~1 between two radii,
    limited to a polar cap) on the atlas grid."""
    d, h, w = shape_zyx
    c = center or (d * 0.5, h * 0.55, w * 0.5)
    z, y, x = np.meshgrid(
        np.arange(d, dtype=np.float32),
        np.arange(h, dtype=np.float32),
        np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    rr = np.sqrt(((z - c[0]) * 2.4) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
    shell = np.clip(1.0 - np.abs(rr - (r_inner + r_outer) / 2) / ((r_outer - r_inner) / 2), 0, 1)
    cap = (y < c[1]).astype(np.float32)  # upper cap only
    return (shell * cap).astype(np.float32)


def build_pipeline():
    import jax
    import jax.numpy as jnp

    from oai_analysis_2_tpu.core.image import image_from_array
    from oai_analysis_2_tpu.engine.registration import register_pair
    from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
    from oai_analysis_2_tpu.mesh.processing import get_thickness_meshes
    from oai_analysis_2_tpu.models.gradicon import GradICONConfig
    from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D
    from oai_analysis_2_tpu.ops.intensity import percentile_window
    from oai_analysis_2_tpu.ops.resample import resample_image, resample_images
    from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint
    import json as _json
    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp(prefix="oai_bench_"))
    (tmp / "train_config.json").write_text(
        _json.dumps(
            {
                "patch_size": [128, 128, 32],
                "model": "UNet",
                "model_setting": {"in_channels": 1, "n_classes": 2, "bias": False, "BN": False},
            }
        )
    )
    model = UNet3D(NETWORK_SPECS["UNet"])
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    save_checkpoint({"params": params, "epoch": 600}, False, tmp, name="seg.npz")

    segmenter = Segmenter3DInPatchClassWise(
        mode="pred",
        config={
            "ckpoint_path": str(tmp / "seg.npz"),
            "training_config_file": str(tmp / "train_config.json"),
            "batch_size": 4,
            "overlap_size": (16, 16, 8),
            "compute_dtype": "bfloat16",
        },
    )

    rng = np.random.default_rng(0)
    # DESS-like knee volume (z,y,x) and the 160x384x384 atlas grid of the
    # reference (FullDemo cell 7). The knee has shell "anatomy" so that
    # registration aligns real structure and the warped probability maps
    # produce reference-sized meshes (test_all.py:69-70).
    shape = (160, 384, 384)
    fc_shell = _shell_probmap(shape)
    tc_shell = _shell_probmap(shape, 40.0, 45.0, (80, 230, 192))
    anatomy = np.maximum(fc_shell, tc_shell)
    knee_np = (anatomy * 900.0 + rng.uniform(0.0, 250.0, shape)).astype(np.float32)
    knee = image_from_array(knee_np, spacing=(0.36, 0.36, 0.7))
    # atlas: same anatomy, slightly shifted, with matched background texture
    # (mismatched background statistics make any intensity-driven registration
    # shred the field to explain noise — like real pipelines, both volumes
    # must be comparably preprocessed)
    atlas_anatomy = np.maximum(
        _shell_probmap(shape, center=(80, 206, 184)),
        _shell_probmap(shape, 40.0, 45.0, (80, 222, 184)),
    )
    atlas_np = atlas_anatomy * 0.78 + rng.uniform(0.0, 0.22, shape)
    atlas = image_from_array(atlas_np.astype(np.float32), spacing=(0.36, 0.36, 0.7))
    fc_prob = image_from_array(fc_shell, spacing=(0.36, 0.36, 0.7))
    tc_prob = image_from_array(tc_shell, spacing=(0.36, 0.36, 0.7))
    reg_cfg = GradICONConfig()

    from oai_analysis_2_tpu.utils.profiling import StageTimer

    def one_knee():
        timer = StageTimer()
        # 1) preprocess + segment
        with timer.stage("preprocess"):
            pre = percentile_window(knee, 0.1, 99.9, 0.0, 1.0)
            pre.data.block_until_ready()
        with timer.stage("segment"):
            fc, tc = segmenter.segment(pre, if_output_prob_map=True)
            jax.block_until_ready((fc.data, tc.data))
        # 2) register knee -> atlas (instance optimization)
        with timer.stage("register"):
            phi_ab, _ = register_pair(
                pre, atlas, config=reg_cfg, instance_scales=(4, 2, 1), instance_steps=(80, 60, 40)
            )
            jax.block_until_ready(phi_ab.field)
        # 3) warp probability maps onto the atlas grid
        with timer.stage("warp"):
            fc_w, tc_w = resample_images([fc_prob, tc_prob], atlas, displacement=phi_ab)
            jax.block_until_ready((fc_w.data, tc_w.data))
        # 4) thickness meshes
        with timer.stage("thickness"):
            (fc_inner, _), (tc_inner, _) = get_thickness_meshes(
                [fc_w, tc_w], ["FC", "TC"]
            )
        return fc_inner, tc_inner, timer.report()

    return one_knee


def main():
    t_setup = time.time()
    one_knee = build_pipeline()
    # warm-up knee: pays all compilations
    one_knee()
    warm = time.time() - t_setup

    # median of 3 steady-state knees — the TPU tunnel's throughput varies
    # run-to-run, so a single sample is noisy
    samples = []
    for _ in range(3):
        t0 = time.time()
        fc_inner, tc_inner, stages = one_knee()
        samples.append(time.time() - t0)
    dt = sorted(samples)[1]

    # sanity: an empty mesh means a stage silently produced garbage and the
    # throughput number would be meaningless
    assert fc_inner.n_points > 1000 and tc_inner.n_points > 1000, (
        f"thickness stage produced degenerate meshes "
        f"({fc_inner.n_points}, {tc_inner.n_points})"
    )

    knees_per_hour = 3600.0 / dt
    result = {
        "metric": "single-knee pipeline (seg+reg+warp+thickness), steady-state",
        "value": round(knees_per_hour, 2),
        "unit": "knees/hour/chip",
        "vs_baseline": round(knees_per_hour / BASELINE_KNEES_PER_HOUR, 2),
        "seconds_per_knee": round(dt, 2),
        "knee_samples": [round(s, 1) for s in samples],
        "warmup_seconds": round(warm, 1),
        "fc_mesh_points": int(fc_inner.n_points),
        "tc_mesh_points": int(tc_inner.n_points),
        "stage_seconds": {k: v["seconds"] for k, v in stages.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
