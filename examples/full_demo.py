"""End-to-end single-knee demo — the reference's FullDemo.ipynb as a script.

Pipeline: read DESS volume -> normalize -> 3D UNet FC/TC segmentation ->
GradICON registration to the knee atlas -> warp probability maps onto the
atlas grid -> thickness meshes -> map onto atlas meshes -> 2D projection.

Usage:
    python examples/full_demo.py <image_preprocessed.nii.gz> [output_dir]

Requires the model/atlas artifacts (downloaded on first use, or pre-seeded
via OAI_TPU_DATA_DIR — see oai_analysis_2_tpu/utils/data.py).
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
    )
    from oai_analysis_2_tpu.ops.intensity import checkerboard, percentile_window
    from oai_analysis_2_tpu.ops.resample import resample_image
    from oai_analysis_2_tpu.utils.profiling import StageTimer

    timer = StageTimer()
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
    with timer.stage("project"):
        fc_x, fc_y, fc_t = project_thickness(fc_inner, mesh_type="FC")
        tc_x, tc_y, tc_t = project_thickness(tc_inner, mesh_type="TC")

    write_nifti(fc_w, out_dir / "FC_probmap_atlas.nii.gz")
    write_nifti(tc_w, out_dir / "TC_probmap_atlas.nii.gz")
    write_nifti(board, out_dir / "registration_checkerboard.nii.gz")
    fc_inner.save_vtk(out_dir / "FC_inner_thickness.vtk")
    tc_inner.save_vtk(out_dir / "TC_inner_thickness.vtk")
    np.savez(
        out_dir / "thickness_2d.npz",
        fc_x=fc_x, fc_y=fc_y, fc_thickness=fc_t,
        tc_x=tc_x, tc_y=tc_y, tc_thickness=tc_t,
    )
    print(f"FC mesh: {fc_inner.n_points} pts, mean thickness "
          f"{float(np.mean(fc_inner.point_data)):.3f}")
    print(f"TC mesh: {tc_inner.n_points} pts, mean thickness "
          f"{float(np.mean(tc_inner.point_data)):.3f}")
    timer.print_report()


if __name__ == "__main__":
    main()
