"""Command-line interface.

The reference ships no CLI (SURVEY.md §1); this provides one for the common
operations:

    python -m oai_analysis_2_tpu segment  <image.nii.gz> [-o out_dir]
    python -m oai_analysis_2_tpu pipeline <image.nii.gz> [-o out_dir]
    python -m oai_analysis_2_tpu cohort   <dir_of_volumes> [-o out_dir]
    python -m oai_analysis_2_tpu bench
    python -m oai_analysis_2_tpu prewarm [--shape D,H,W]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(prog="oai_analysis_2_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ("segment", "pipeline"):
        p = sub.add_parser(name)
        p.add_argument("image", type=Path)
        p.add_argument("-o", "--output", type=Path, default=Path(f"{name}_output"))

    p = sub.add_parser("cohort")
    p.add_argument("directory", type=Path)
    p.add_argument("-o", "--output", type=Path, default=Path("cohort_output"))

    for name in ("pipeline", "cohort"):
        sp = sub.choices[name]
        sp.add_argument(
            "--registration-mode", default="auto",
            choices=("auto", "network", "instance"),
            help="auto: shipped GradICON net when present (fast); "
            "instance: per-pair optimization (most accurate, no weights)",
        )
        sp.add_argument(
            "--finetune-steps", type=int, default=20,
            help="per-pair refinement steps on top of the network prediction",
        )

    sub.add_parser("bench")
    sub.add_parser(
        "prewarm",
        add_help=False,
        help="compile/warm the production pipeline before first real knee",
    )

    if argv is None:
        import sys as _sys

        argv = _sys.argv[1:]
    if argv and argv[0] == "prewarm":
        # own argparse (forwards --shape/--registration-mode/...)
        from oai_analysis_2_tpu.engine.prewarm import main as prewarm_main

        prewarm_main(argv[1:])
        return

    args = parser.parse_args(argv)

    if args.cmd == "bench":
        import bench  # repo-root bench when run from a checkout

        bench.main()
        return

    from oai_analysis_2_tpu import AnalysisObject
    from oai_analysis_2_tpu.core.nifti import read_nifti, write_nifti

    obj = AnalysisObject()
    args.output.mkdir(parents=True, exist_ok=True)

    if args.cmd == "segment":
        image = read_nifti(args.image)
        fc, tc = obj.segment(image)
        write_nifti(fc, args.output / "FC_probmap.nii.gz")
        write_nifti(tc, args.output / "TC_probmap.nii.gz")
        print("wrote", args.output)
    elif args.cmd == "pipeline":
        from oai_analysis_2_tpu.engine.pipeline import KneePipeline

        pipe = KneePipeline(
            obj.segmenter, obj.atlas_image,
            registration_mode=args.registration_mode,
            finetune_steps=args.finetune_steps,
        )
        meta = pipe.run_path(args.image, output_dir=args.output)
        print(meta)
    elif args.cmd == "cohort":
        from oai_analysis_2_tpu.engine.pipeline import KneePipeline
        from oai_analysis_2_tpu.parallel.cohort import CohortRunner

        volumes = sorted(args.directory.glob("*.nii.gz"))
        pipe = KneePipeline(
            obj.segmenter, obj.atlas_image,
            registration_mode=args.registration_mode,
            finetune_steps=args.finetune_steps,
        )
        runner = CohortRunner(
            # prepare= decodes the NEXT knee's NIfTI on a background thread
            # while the current knee computes (double-buffered host feed)
            lambda pv: pipe.run_path(pv[0], output_dir=args.output, image=pv[1]),
            prepare=lambda p: (p, read_nifti(p)),
            manifest_path=args.output / "manifest.json",
        )
        print(runner.run(volumes, keys=[v.name for v in volumes]))


if __name__ == "__main__":
    main()
