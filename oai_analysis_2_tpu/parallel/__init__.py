from oai_analysis_2_tpu.parallel.sharding import (
    make_device_mesh,
    make_sharded_train_step,
    shard_batch,
)
from oai_analysis_2_tpu.parallel.cohort import CohortRunner, CohortManifest
from oai_analysis_2_tpu.parallel.batch import BatchKneePipeline

__all__ = [
    "make_device_mesh",
    "make_sharded_train_step",
    "shard_batch",
    "CohortRunner",
    "CohortManifest",
    "BatchKneePipeline",
]
