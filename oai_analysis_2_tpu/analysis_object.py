"""One-stop analysis facade.

API parity with the reference `AnalysisObject` (oai_analysis/analysis_object.py:9-49):
construct once, then `.segment(image) -> (FC_probmap, TC_probmap)` and
`.register(image) -> displacement transform` against the loaded knee atlas.

Differences by design (TPU-native):
  * no device selection dance (analysis_object.py:11-15) — JAX owns placement;
  * the segmentation checkpoint may be the reference's torch `.pth.tar`
    (converted on load) or this framework's native `.npz`;
  * registration defaults to "auto": the shipped trained GradICON weights
    (a few MB in-package, vs the reference's 1.2 GB download) when present,
    else per-pair instance optimization (zero downloads).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

from oai_analysis_2_tpu.core.image import Image
from oai_analysis_2_tpu.core.nifti import read_nifti
from oai_analysis_2_tpu.engine.registration import ICON_Registration
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise


class AnalysisObject:
    def __init__(
        self,
        models_path: Optional[Path] = None,
        atlas_path: Optional[Path] = None,
        batch_size: int = 4,
        overlap_size: Tuple[int, int, int] = (16, 16, 8),
        compute_dtype: str = "bfloat16",
        registration_mode: str = "auto",
        registration_steps: int = 60,
    ):
        if models_path is None:
            from oai_analysis_2_tpu.utils.data import models_dir

            models_path = models_dir()
        models_path = Path(models_path)

        ckpt = models_path / "segmentation_model.pth.tar"
        if not ckpt.exists() and (models_path / "segmentation_model.npz").exists():
            ckpt = models_path / "segmentation_model.npz"
        segmenter_config = dict(
            ckpoint_path=str(ckpt),
            training_config_file=str(models_path / "segmentation_train_config.pth.tar"),
            batch_size=batch_size,
            overlap_size=overlap_size,
            output_prob=True,
            output_itk=True,
            compute_dtype=compute_dtype,
        )
        self.segmenter = Segmenter3DInPatchClassWise(mode="pred", config=segmenter_config)

        self.registerer = ICON_Registration(
            mode=registration_mode, instance_steps=registration_steps
        )

        if atlas_path is None:
            from oai_analysis_2_tpu.utils.data import atlases_dir

            atlas_path = (
                atlases_dir() / "atlas_60_LEFT_baseline_NMI" / "atlas_image.nii.gz"
            )
        self.atlas_image: Image = read_nifti(atlas_path)

    def segment(self, preprocessed_image: Image) -> Tuple[Image, Image]:
        """(FC_probmap, TC_probmap) — reference analysis_object.py:43-45."""
        return self.segmenter.segment(
            preprocessed_image, if_output_prob_map=True, if_output_itk=True
        )

    def register(self, preprocessed_image: Image):
        """Displacement transform warping knee-grid data onto the atlas grid —
        reference analysis_object.py:47-49."""
        return self.registerer.register(preprocessed_image, self.atlas_image)
