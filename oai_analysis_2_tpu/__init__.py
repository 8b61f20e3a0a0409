"""OAI Analysis 2 — TPU-native rebuild.

A JAX/XLA/Pallas framework for analysis of knee-MRI (3D DESS) volumes from
the Osteoarthritis Initiative, providing the full capability surface of the
reference implementation (uncbiag/OAI_analysis_2):

  * 3D UNet cartilage segmentation with overlap-tiled patch inference
    (reference: oai_analysis/segmentation/)
  * GradICON-style deformable atlas registration
    (reference: oai_analysis/registration.py)
  * Cartilage thickness via marching-cubes mesh extraction, inner/outer
    surface splitting, and closest-point mesh distance
    (reference: oai_analysis/mesh_processing.py)
  * 2D atlas thickness mapping (cylindrical unrolling / planar projection)
  * Cohort batch processing sharded over TPU meshes
    (reference: oai_analysis/dask_processing.py)

Everything on the compute path is JAX (jit/vmap/shard_map + Pallas kernels);
host-side geometry bookkeeping uses numpy with an optional C++ fast path.
"""

from oai_analysis_2_tpu.__about__ import __version__
from oai_analysis_2_tpu.utils.compile_cache import enable_compilation_cache

# Persistent XLA compilation cache: the pipeline's cold start is compile-
# dominated; caching makes every process after the first pay only
# trace+deserialize. No-op-cheap when jax isn't imported yet (env vars only);
# opt out with OAI_TPU_NO_COMPILE_CACHE=1.
enable_compilation_cache()

__all__ = ["__version__", "AnalysisObject", "enable_compilation_cache"]


def __getattr__(name):
    # Lazy import to keep `import oai_analysis_2_tpu` light.
    if name == "AnalysisObject":
        from oai_analysis_2_tpu.analysis_object import AnalysisObject

        return AnalysisObject
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
