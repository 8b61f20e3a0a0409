"""Cohort processing demo — the reference's DaskComputation(Coiled).ipynb,
TPU-native: a resumable work queue over a list of knee volumes, each running
the compiled segment+register+thickness pipeline; multi-host fan-out happens
automatically when jax.distributed is initialized (one host claims every
n-th knee).

Usage:
    python examples/cohort_demo.py <dir_with_nii_gz_volumes> [output_dir]
"""

import sys
from pathlib import Path

# allow running from a source checkout without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))




def main():
    in_dir = Path(sys.argv[1])
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "cohort_output")
    volumes = sorted(in_dir.glob("*.nii.gz"))
    if not volumes:
        raise SystemExit(f"no .nii.gz volumes in {in_dir}")

    from oai_analysis_2_tpu import AnalysisObject
    from oai_analysis_2_tpu.engine.pipeline import KneePipeline
    from oai_analysis_2_tpu.parallel.cohort import CohortRunner

    obj = AnalysisObject()
    pipe = KneePipeline(obj.segmenter, obj.atlas_image)
    runner = CohortRunner(
        lambda p: pipe.run_path(p, output_dir=out_dir),
        manifest_path=out_dir / "manifest.json",
        max_retries=1,
    )
    summary = runner.run(volumes, keys=[v.name for v in volumes])
    print("cohort summary:", summary)


if __name__ == "__main__":
    main()
