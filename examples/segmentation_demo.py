"""Segmentation-only demo — the reference's SegmentationDemo.ipynb as a script.

Usage:
    python examples/segmentation_demo.py <image_preprocessed.nii.gz> [out_dir]
"""

import sys
from pathlib import Path

# allow running from a source checkout without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import time
from pathlib import Path

import numpy as np


def main():
    image_path = sys.argv[1]
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "seg_output")
    out_dir.mkdir(parents=True, exist_ok=True)

    from oai_analysis_2_tpu import AnalysisObject
    from oai_analysis_2_tpu.core.nifti import read_nifti, write_nifti

    obj = AnalysisObject()
    image = read_nifti(image_path)
    t0 = time.time()
    fc_prob, tc_prob = obj.segment(image)
    fc_prob.data.block_until_ready()
    print(f"segmented {image.data.shape} in {time.time() - t0:.2f}s")
    print("FC voxels > 0.5:", int(np.sum(np.asarray(fc_prob.data) > 0.5)))
    print("TC voxels > 0.5:", int(np.sum(np.asarray(tc_prob.data) > 0.5)))
    write_nifti(fc_prob, out_dir / "FC_probmap.nii.gz")
    write_nifti(tc_prob, out_dir / "TC_probmap.nii.gz")
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
