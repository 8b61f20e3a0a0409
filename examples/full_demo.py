"""End-to-end single-knee demo — the reference's FullDemo.ipynb as a script.

Pipeline: read DESS volume -> normalize -> 3D UNet FC/TC segmentation ->
GradICON registration to the knee atlas -> warp probability maps onto the
atlas grid -> thickness meshes -> map onto atlas meshes -> 2D projection.

Usage:
    python examples/full_demo.py <image_preprocessed.nii.gz> [output_dir]
    python examples/full_demo.py phantom [output_dir]   # zero-download demo

With a NIfTI input this requires the model/atlas artifacts (downloaded on
first use, or pre-seeded via OAI_TPU_DATA_DIR — utils/data.py). `phantom`
runs the identical pipeline on a synthetic knee with the offline facade
(AnalysisObject.offline): bundled synthetic atlas + threshold-weights
production-topology segmenter — every stage, no network access.
"""

import sys
from pathlib import Path

# allow running from a source checkout without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



import numpy as np


def main():
    image_path = sys.argv[1]
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "demo_output")
    out_dir.mkdir(parents=True, exist_ok=True)

    from oai_analysis_2_tpu import AnalysisObject
    from oai_analysis_2_tpu.core.nifti import read_nifti, write_nifti
    from oai_analysis_2_tpu.mesh.processing import (
        get_thickness_mesh,
        map_attributes,
        project_thickness,
        rasterize_thickness,
    )
    from oai_analysis_2_tpu.ops.intensity import checkerboard, percentile_window
    from oai_analysis_2_tpu.ops.resample import resample_image
    from oai_analysis_2_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    if image_path == "phantom":
        obj, image = _phantom_setup()
    else:
        obj = AnalysisObject()
        image = read_nifti(image_path)

    with timer.stage("segment"):
        fc_prob, tc_prob = obj.segment(image)
    with timer.stage("register"):
        phi = obj.register(image)
    with timer.stage("warp"):
        fc_w = resample_image(fc_prob, obj.atlas_image, displacement=phi)
        tc_w = resample_image(tc_prob, obj.atlas_image, displacement=phi)
        warped_img = resample_image(percentile_window(image), obj.atlas_image, displacement=phi)
        board = checkerboard(warped_img, obj.atlas_image.astype(np.float32))
    with timer.stage("thickness"):
        fc_inner, fc_outer = get_thickness_mesh(fc_w, mesh_type="FC")
        tc_inner, tc_outer = get_thickness_mesh(tc_w, mesh_type="TC")
    with timer.stage("atlas_map"):
        # the reference FullDemo cells 9-10: atlas FC/TC probmaps -> inner
        # meshes, then closest-point transfer of THIS knee's thickness onto
        # the common atlas geometry (the cohort-comparable representation)
        fc_inner_atlas, tc_inner_atlas = _atlas_inner_meshes(obj)
        mapped_fc = map_attributes(fc_inner, fc_inner_atlas)
        mapped_tc = map_attributes(tc_inner, tc_inner_atlas)
    with timer.stage("project"):
        # cells 11-12: unroll to 2D (FC cylindrical, TC planar) + the common
        # raster the reference stops short of (it only scatter-plots)
        fc_x, fc_y, fc_t = project_thickness(mapped_fc, mesh_type="FC")
        tc_x, tc_y, tc_t = project_thickness(mapped_tc, mesh_type="TC")
        fc_map, fc_counts, fc_bounds = rasterize_thickness(fc_x, fc_y, fc_t)
        tc_map, tc_counts, tc_bounds = rasterize_thickness(tc_x, tc_y, tc_t)

    write_nifti(fc_w, out_dir / "FC_probmap_atlas.nii.gz")
    write_nifti(tc_w, out_dir / "TC_probmap_atlas.nii.gz")
    write_nifti(board, out_dir / "registration_checkerboard.nii.gz")
    fc_inner.save_vtk(out_dir / "FC_inner_thickness.vtk")
    tc_inner.save_vtk(out_dir / "TC_inner_thickness.vtk")
    np.savez(
        out_dir / "thickness_2d.npz",
        fc_x=fc_x, fc_y=fc_y, fc_thickness=fc_t,
        tc_x=tc_x, tc_y=tc_y, tc_thickness=tc_t,
        fc_map=fc_map, fc_counts=fc_counts, fc_bounds=np.asarray(fc_bounds),
        tc_map=tc_map, tc_counts=tc_counts, tc_bounds=np.asarray(tc_bounds),
    )
    _save_scatter_png(out_dir / "thickness_FC.png", fc_x, fc_y, fc_t, "FC")
    _save_scatter_png(out_dir / "thickness_TC.png", tc_x, tc_y, tc_t, "TC")
    print(f"FC mesh: {fc_inner.n_points} pts, mean thickness "
          f"{float(np.mean(fc_inner.point_data)):.3f}")
    print(f"TC mesh: {tc_inner.n_points} pts, mean thickness "
          f"{float(np.mean(tc_inner.point_data)):.3f}")
    for name, m, c in (("FC", fc_map, fc_counts), ("TC", tc_map, tc_counts)):
        cov = float((c > 0).mean())
        print(f"{name} 2D atlas raster: coverage {cov:.1%}, "
              f"mean thickness {float(m[c > 0].mean()):.3f} mm")
    timer.print_report()


def _phantom_setup():
    """Zero-download demo inputs: offline facade (bundled synthetic atlas +
    threshold-weights segmenter) and a two-shell knee phantom (cf. bench.py's
    anatomy) whose cartilage-like caps the threshold segmenter maps.
    OAI_DEMO_SHAPE=D,H,W overrides the DESS-sized default grid."""
    import os

    from oai_analysis_2_tpu import AnalysisObject
    from oai_analysis_2_tpu.core.image import image_from_array

    shape = tuple(
        int(v) for v in os.environ.get("OAI_DEMO_SHAPE", "160,384,384").split(",")
    )
    obj = AnalysisObject.offline(atlas_shape="phantom:{},{},{}".format(*shape))

    d, h, w = shape
    s = h / 384.0  # radii calibrated at the reference atlas grid
    z, y, x = np.meshgrid(*[np.arange(n, dtype=np.float32) for n in shape],
                          indexing="ij")

    def shell(r_in, r_out, center):
        rr = np.sqrt(((z - center[0]) * 2.4) ** 2 + (y - center[1]) ** 2
                     + (x - center[2]) ** 2)
        mid, half = (r_in + r_out) / 2.0, (r_out - r_in) / 2.0
        cap = (y < center[1]).astype(np.float32)
        return np.clip(1.0 - np.abs(rr - mid) / half, 0.0, 1.0) * cap

    rng = np.random.default_rng(7)
    anatomy = np.maximum(
        shell(47.5 * s, 52.5 * s, (d * 0.5, h * 0.55, w * 0.5)),
        shell(31.5 * s, 35.5 * s, (d * 0.5, h * 0.6, w * 0.5)),
    )
    knee = (anatomy * 900.0 + rng.uniform(0.0, 250.0, shape)).astype(np.float32)
    # the pipeline expects a PREPROCESSED image (reference FullDemo feeds
    # image_preprocessed.nii.gz): window the raw phantom intensities to [0,1]
    from oai_analysis_2_tpu.ops.intensity import percentile_window

    return obj, percentile_window(image_from_array(knee, spacing=(0.36, 0.36, 0.7)))


def _atlas_inner_meshes(obj):
    """Atlas FC/TC inner meshes (FullDemo cell 9). Prefers the release's
    atlas probmaps (atlas_fc/tc.nii.gz beside atlas_image.nii.gz); when
    absent (phantom/offline atlas), derives them by segmenting the atlas
    image itself with the same segmenter — self-consistent geometry."""
    from oai_analysis_2_tpu.core.nifti import read_nifti
    from oai_analysis_2_tpu.mesh.processing import get_mesh, split_mesh

    fc_p = tc_p = None
    if obj.atlas_dir is not None:
        fc_file = obj.atlas_dir / "atlas_fc.nii.gz"
        tc_file = obj.atlas_dir / "atlas_tc.nii.gz"
        if fc_file.exists() and tc_file.exists():
            fc_p, tc_p = read_nifti(fc_file), read_nifti(tc_file)
    if fc_p is None:
        fc_p, tc_p = obj.segment(obj.atlas_image)
    fc_inner_atlas, _ = split_mesh(get_mesh(fc_p), mesh_type="FC")
    tc_inner_atlas, _ = split_mesh(get_mesh(tc_p), mesh_type="TC")
    return fc_inner_atlas, tc_inner_atlas


def _save_scatter_png(path, x, y, t, mesh_type):
    """The reference's cell 11-12 scatter plot, if matplotlib is present."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, ax = plt.subplots(figsize=(8, 6))
    s = ax.scatter(x, y, c=t, s=2, vmin=0, vmax=4)
    fig.colorbar(s, ax=ax, label=f"Thickness {mesh_type}")
    ax.axis("off")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


if __name__ == "__main__":
    main()
