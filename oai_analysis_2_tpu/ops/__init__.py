from oai_analysis_2_tpu.ops.intensity import (
    checkerboard,
    comparison_sum,
    intensity_window,
    normalize_image,
    percentile_window,
)
from oai_analysis_2_tpu.ops.tiling import Partition
from oai_analysis_2_tpu.ops.resample import (
    resample_image,
    resample_with_displacement,
    sample_at_physical_points,
)

__all__ = [
    "checkerboard",
    "comparison_sum",
    "intensity_window",
    "normalize_image",
    "percentile_window",
    "Partition",
    "resample_image",
    "resample_with_displacement",
    "sample_at_physical_points",
]
