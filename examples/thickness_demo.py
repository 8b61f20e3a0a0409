"""Thickness-only demo — the reference's ComputeThicknessDemo.ipynb as a
script: probability map in, inner/outer thickness meshes + 2D projection out.

Usage:
    python examples/thickness_demo.py <probmap.nii.gz> <FC|TC> [out_dir]
"""

import sys
from pathlib import Path

# allow running from a source checkout without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



import numpy as np


def main():
    prob_path = sys.argv[1]
    mesh_type = sys.argv[2] if len(sys.argv) > 2 else "FC"
    out_dir = Path(sys.argv[3] if len(sys.argv) > 3 else "thickness_output")
    out_dir.mkdir(parents=True, exist_ok=True)

    from oai_analysis_2_tpu.core.nifti import read_nifti
    from oai_analysis_2_tpu.mesh.processing import get_thickness_mesh, project_thickness

    prob = read_nifti(prob_path)
    inner, outer = get_thickness_mesh(prob, mesh_type=mesh_type)
    print(f"inner: {inner.n_points} pts, thickness mean "
          f"{float(np.mean(inner.point_data)):.3f} max {float(np.max(inner.point_data)):.3f}")
    print(f"outer: {outer.n_points} pts")
    inner.save_vtk(out_dir / f"{mesh_type}_inner_thickness.vtk")
    outer.save_vtk(out_dir / f"{mesh_type}_outer_thickness.vtk")

    x2d, y2d, th = project_thickness(inner, mesh_type=mesh_type)
    np.savez(out_dir / f"{mesh_type}_thickness_2d.npz", x=x2d, y=y2d, thickness=th)
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
