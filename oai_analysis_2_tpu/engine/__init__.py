from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise

__all__ = ["Segmenter3DInPatchClassWise"]
