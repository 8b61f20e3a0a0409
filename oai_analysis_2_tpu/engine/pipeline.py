"""The full single-knee pipeline: segment ∥ register -> warp -> thickness.

This is the static, compiled equivalent of the reference's per-knee Dask
delayed DAG (dask_processing.py:46-189; DaskComputation.ipynb cell 5):
the reference ships pickled ITK objects between processes, while here each
stage feeds the next on-device, and per-stage wall times are recorded.

Use with parallel.cohort.CohortRunner for cohort fan-out.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from oai_analysis_2_tpu.core.image import Image
from oai_analysis_2_tpu.core.nifti import read_nifti
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
from oai_analysis_2_tpu.mesh.processing import get_thickness_mesh, get_thickness_meshes
from oai_analysis_2_tpu.mesh.types import Mesh
from oai_analysis_2_tpu.models.gradicon import GradICONConfig
from oai_analysis_2_tpu.ops.intensity import percentile_window
from oai_analysis_2_tpu.ops.resample import resample_image, resample_images
from oai_analysis_2_tpu.utils.profiling import StageTimer


@dataclasses.dataclass
class KneeResult:
    fc_probmap: Image
    tc_probmap: Image
    fc_inner: Mesh
    fc_outer: Mesh
    tc_inner: Mesh
    tc_outer: Mesh
    timings: dict
    # atlas-mapped 2D thickness products (engine.atlas_products.map_knee
    # payload) — populated when the pipeline was built with
    # atlas_products=True; the cohort-comparable representation
    thickness_2d: Optional[dict] = None
    # per-registration quality signals (ICON_Registration.last_quality:
    # folded-Jacobian fraction + inverse-consistency error)
    registration_quality: Optional[dict] = None


class KneePipeline:
    """segment + register + warp + thickness for one knee volume."""

    def __init__(
        self,
        segmenter: Segmenter3DInPatchClassWise,
        atlas_image: Image,
        registration_config: Optional[GradICONConfig] = None,
        instance_scales: Tuple[int, ...] = (4, 2, 1),
        instance_steps=(80, 60, 40),
        normalize: bool = True,
        registration_mode: str = "auto",
        finetune_steps: int = 0,
        finetune_scales: Tuple[int, ...] = (2,),
        finetune_lr: float = 0.15,
        warp_dtype: str = "float32",
        atlas_products: bool = False,
        atlas_dir: Optional[Path] = None,
    ):
        """registration_mode: "auto" uses the shipped trained GradICON when
        its weights exist (one forward pass + `finetune_steps` of per-pair
        refinement), else instance optimization; or force "network" /
        "instance".

        warp_dtype: "bfloat16" gathers probmap voxels at half HBM bandwidth
        during the warp stage (<~4e-3 absolute error on [0,1] maps — see
        ops.resample.resample_images); "float32" (default) is exact.

        atlas_products: also map each knee's thickness onto the common
        atlas meshes and rasterize to the fixed 2D grid (the reference
        FullDemo cells 9-12 chain, engine.atlas_products) — results land
        in KneeResult.thickness_2d, run_path() writes them as
        `<stem>_thickness_2d.npz`, and CohortRunner aggregates them into a
        population thickness atlas. atlas_dir locates the release's
        atlas_fc/tc.nii.gz probmaps; without it (or offline) the atlas
        image is segmented once with this pipeline's segmenter.

        N.B. with the shipped (synthetic-phantom-trained) GradICON weights
        present, "auto" registration resolves to the network path: ~40x
        faster than instance optimization but measurably less accurate on
        the held-out phantom (VALIDATION.md). Pass
        registration_mode="instance" when accuracy matters more than
        latency."""
        from oai_analysis_2_tpu.engine.registration import ICON_Registration

        if warp_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"warp_dtype must be 'float32' or 'bfloat16', got {warp_dtype!r}"
            )

        self.segmenter = segmenter
        self.atlas = atlas_image
        self.instance_scales = instance_scales
        self.instance_steps = instance_steps
        self.normalize = normalize
        self.warp_dtype = warp_dtype
        self.registerer = ICON_Registration(
            mode=registration_mode,
            # None lets the registerer adopt the shipped checkpoint's
            # recorded architecture (width/grid) as its config
            config=registration_config,
            instance_steps=instance_steps,
            instance_scales=instance_scales,
            finetune_steps=finetune_steps,
            finetune_scales=finetune_scales,
            finetune_lr=finetune_lr,
        )
        self.reg_config = self.registerer.config  # possibly checkpoint-adapted
        # atlas_products: False | True | a prebuilt AtlasThicknessMapper
        # (injection covers custom grids/filter thresholds or a shared
        # mapper across pipelines)
        self.atlas_products = bool(atlas_products)
        self.atlas_dir = atlas_dir
        self._atlas_mapper = (
            atlas_products if not isinstance(atlas_products, bool) else None
        )

    def _get_mapper(self):
        """Lazily build the AtlasThicknessMapper: the atlas 2D embedding is
        knee-independent, so it is computed once per pipeline."""
        if self._atlas_mapper is None:
            from oai_analysis_2_tpu.engine.atlas_products import (
                AtlasThicknessMapper,
            )

            self._atlas_mapper = AtlasThicknessMapper.from_segmenter(
                self.segmenter, self.atlas, atlas_dir=self.atlas_dir
            )
        return self._atlas_mapper

    def run(self, image: Image) -> KneeResult:
        import jax

        timer = StageTimer()
        with timer.stage("preprocess"):
            pre = percentile_window(image, 0.1, 99.9, 0.0, 1.0) if self.normalize else image

        with timer.stage("segment"):
            fc, tc = self.segmenter.segment(pre, if_output_prob_map=True)
            jax.block_until_ready((fc.data, tc.data))

        with timer.stage("register"):
            phi_ab = self.registerer.register(pre, self.atlas)
            jax.block_until_ready(phi_ab.field)

        with timer.stage("warp"):
            import jax.numpy as jnp

            wdt = jnp.bfloat16 if self.warp_dtype == "bfloat16" else None
            fc_w, tc_w = resample_images(
                [fc, tc], self.atlas, displacement=phi_ab, compute_dtype=wdt
            )
            jax.block_until_ready((fc_w.data, tc_w.data))

        with timer.stage("thickness"):
            (fc_inner, fc_outer), (tc_inner, tc_outer) = get_thickness_meshes(
                [fc_w, tc_w], ["FC", "TC"]
            )

        thickness_2d = None
        if self.atlas_products:
            with timer.stage("atlas_map"):
                thickness_2d = self._get_mapper().map_knee(fc_inner, tc_inner)

        return KneeResult(
            fc_probmap=fc_w,
            tc_probmap=tc_w,
            fc_inner=fc_inner,
            fc_outer=fc_outer,
            tc_inner=tc_inner,
            tc_outer=tc_outer,
            timings=timer.report(),
            thickness_2d=thickness_2d,
            registration_quality=self.registerer.last_quality,
        )

    def run_path(
        self, nifti_path, output_dir: Optional[Path] = None, image: Optional[Image] = None
    ) -> dict:
        """Cohort-runner-compatible wrapper: reads a NIfTI file, writes mesh
        results, returns JSON-serializable metadata. Pass `image` to skip
        the read (e.g. a CohortRunner `prepare=read_nifti` prefetch already
        decoded it while the previous knee computed)."""
        image = read_nifti(nifti_path) if image is None else image
        result = self.run(image)
        meta = {
            "input": str(nifti_path),
            "timings": result.timings,
            "fc_points": result.fc_inner.n_points,
            "tc_points": result.tc_inner.n_points,
        }
        if result.registration_quality is not None:
            meta["registration_quality"] = result.registration_quality
        if result.thickness_2d is not None:
            from oai_analysis_2_tpu.engine.atlas_products import (
                thickness_map_stats,
            )

            meta.update(thickness_map_stats(result.thickness_2d))
        if output_dir is not None:
            output_dir = Path(output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            stem = Path(str(nifti_path)).name.split(".")[0]
            result.fc_inner.save_vtk(output_dir / f"{stem}_FC_inner.vtk")
            result.tc_inner.save_vtk(output_dir / f"{stem}_TC_inner.vtk")
            result.fc_outer.save_vtk(output_dir / f"{stem}_FC_outer.vtk")
            result.tc_outer.save_vtk(output_dir / f"{stem}_TC_outer.vtk")
            if result.thickness_2d is not None:
                t2d = output_dir / f"{stem}_thickness_2d.npz"
                np.savez_compressed(t2d, **result.thickness_2d)
                meta["thickness_2d"] = str(t2d)
            meta["outputs"] = str(output_dir)
        return meta
