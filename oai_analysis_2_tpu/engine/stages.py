"""Stage-level functional API — capability parity with the reference's
Dask task layer (oai_analysis/dask_processing.py). Each function mirrors one
@delayed task's contract so cohort drivers can compose pipelines at the same
granularity; here they are plain functions (composition happens in
parallel.cohort / engine.pipeline rather than a dynamic task graph).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from oai_analysis_2_tpu.core.image import Image
from oai_analysis_2_tpu.core.nifti import read_nifti
from oai_analysis_2_tpu.engine.registration import register_pair as _register_pair
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
from oai_analysis_2_tpu.models.gradicon import GradICONConfig
from oai_analysis_2_tpu.ops.intensity import percentile_window
from oai_analysis_2_tpu.ops.resample import DisplacementField, resample_image


def image_normalize(
    image: Image,
    window_min_perc: float = 0.1,
    window_max_perc: float = 99.9,
    output_min: float = 0.0,
    output_max: float = 1.0,
) -> Image:
    """reference dask_processing.py:10-26"""
    return percentile_window(image, window_min_perc, window_max_perc, output_min, output_max)


def readimage(image_path) -> Image:
    """Load a volume from zarr (local, http(s)://, or s3://) or NIfTI
    (reference readimage, dask_processing.py:29-43, reads zarr via
    xarray->ITK; the Coiled cohort passes s3:// zarr URLs directly)."""
    from oai_analysis_2_tpu.utils.stores import is_remote

    if is_remote(image_path):
        from oai_analysis_2_tpu.utils.zarr_io import read_zarr_volume

        return read_zarr_volume(image_path)
    p = Path(image_path)
    if p.suffix in (".zarr",) or (p / ".zarray").exists() or (p / "image" / ".zarray").exists():
        from oai_analysis_2_tpu.utils.zarr_io import read_zarr_volume

        return read_zarr_volume(p)
    return read_nifti(p)


def register_images(
    image_a_path,
    image_b_path,
    config: Optional[GradICONConfig] = None,
    instance_steps: int = 60,
) -> Tuple[DisplacementField, Image, Image]:
    """reference register_images_delayed (dask_processing.py:46-92): load,
    normalize A, register; returns (phi_AB, image_A, image_B)."""
    image_a = image_normalize(readimage(image_a_path))
    image_b = readimage(image_b_path)
    phi_ab, _ = _register_pair(image_a, image_b, config=config, instance_steps=instance_steps)
    return phi_ab, image_a, image_b


def deform_probmap(
    phi_ab: DisplacementField, image_a: Image, image_b: Image, prob: Image,
    image_type: str = "FC",
) -> Image:
    """reference deform_probmap_delayed (dask_processing.py:95-111): warp a
    probability map from A's grid onto B's grid through phi_AB."""
    return resample_image(prob, image_b, displacement=phi_ab)


def get_thickness(warped_image: Image, mesh_type: str):
    """reference get_thickness (dask_processing.py:114-122): inner-surface
    thickness mesh of a warped probability map."""
    from oai_analysis_2_tpu.mesh.processing import get_thickness_mesh

    distance_inner, _ = get_thickness_mesh(warped_image, mesh_type=mesh_type)
    return distance_inner


def segment_method(
    image_a_path,
    models_path,
    batch_size: int = 2,
    overlap_size: Tuple[int, int, int] = (16, 16, 8),
) -> Tuple[Image, Image]:
    """reference segment_method (dask_processing.py:126-189): build a
    segmenter from the shipped model artifacts, normalize, segment."""
    models_path = Path(models_path)
    ckpt = models_path / "segmentation_model.pth.tar"
    if not ckpt.exists():
        ckpt = models_path / "segmentation_model.npz"
    segmenter = Segmenter3DInPatchClassWise(
        mode="pred",
        config=dict(
            ckpoint_path=str(ckpt),
            training_config_file=str(models_path / "segmentation_train_config.pth.tar"),
            batch_size=batch_size,
            overlap_size=overlap_size,
            output_prob=True,
            output_itk=True,
        ),
    )
    volume = image_normalize(readimage(image_a_path))
    return segmenter.segment(volume, if_output_prob_map=True, if_output_itk=True)
