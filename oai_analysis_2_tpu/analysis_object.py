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
    else per-pair instance optimization (zero downloads);
  * offline construction: the reference facade is unconstructable without
    its release downloads (analysis_object.py:41 requires the atlas tarball).
    Here `atlas_path="phantom"` / `models_path="phantom"` (or the
    `AnalysisObject.offline()` shortcut) substitute a deterministic bundled
    synthetic atlas and a threshold-weights segmentation checkpoint — the
    facade then works in zero-egress environments. The substitution is
    EXPLICIT opt-in, never automatic: silently swapping a synthetic atlas
    for the OAI atlas would corrupt downstream science; a failed download
    raises with a hint instead.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple, Union

from oai_analysis_2_tpu.core.image import Image
from oai_analysis_2_tpu.core.nifti import read_nifti
from oai_analysis_2_tpu.engine.registration import ICON_Registration
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise

#: sentinel for offline construction; optionally "phantom:D,H,W" for a
#: non-default grid (z,y,x voxels), e.g. "phantom:48,96,96" in tests/demos.
PHANTOM = "phantom"


def _parse_phantom_shape(spec: str, default=(160, 384, 384)) -> Tuple[int, int, int]:
    _, _, dims = spec.partition(":")
    if not dims:
        return default
    shape = tuple(int(v) for v in dims.split(","))
    if len(shape) != 3 or any(s <= 0 for s in shape):
        raise ValueError(f"bad phantom shape spec {spec!r}; want 'phantom:D,H,W'")
    return shape


def _phantom_atlas(shape_zyx=(160, 384, 384)) -> Image:
    """Deterministic knee-like synthetic atlas on the reference's atlas grid
    (160x384x384, FullDemo cell 7) at DESS-like spacing."""
    import numpy as np

    from oai_analysis_2_tpu.core.image import image_from_array
    from oai_analysis_2_tpu.models.synthetic import random_phantom

    vol = random_phantom(np.random.default_rng(60), shape_zyx)
    return image_from_array(vol, spacing=(0.36, 0.36, 0.7))


def _phantom_models_dir() -> Path:
    """Write (once, cached) a models/ tree shaped like the release tarball:
    the full production `UNet` topology with threshold weights — real
    FLOPs/shapes computing sigmoid(24*(x-0.5)), so windowed volumes segment
    into clean intensity-threshold probability maps."""
    import json

    from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D, make_threshold_params
    from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

    cache = Path.home() / ".cache" / "oai_analysis_2_tpu" / "phantom_models"
    ckpt = cache / "segmentation_model.npz"
    cfg = cache / "segmentation_train_config.pth.tar"  # JSON; reference names it so
    if not (ckpt.exists() and cfg.exists()):
        import os

        cache.mkdir(parents=True, exist_ok=True)
        # Concurrent processes may race to populate this shared dir: write
        # both files under pid-unique temp names and os.replace() into place,
        # checkpoint first and config last (the exists() gate requires both,
        # and each replace is atomic), so no reader ever sees a partial file.
        tmp = f".tmp{os.getpid()}"
        model = UNet3D(NETWORK_SPECS["UNet"].replace(bias=True))
        params = make_threshold_params(model, gain=24.0, threshold=0.5)
        save_checkpoint({"params": params, "epoch": 600}, False, cache,
                        name=f"segmentation_model{tmp}.npz")
        os.replace(cache / f"segmentation_model{tmp}.npz", ckpt)
        cfg_tmp = cache / f"segmentation_train_config{tmp}"
        cfg_tmp.write_text(
            json.dumps(
                {
                    "patch_size": [128, 128, 32],
                    "model": "UNet",
                    "model_setting": {
                        "in_channels": 1, "n_classes": 2, "bias": True, "BN": False,
                    },
                }
            )
        )
        os.replace(cfg_tmp, cfg)
    return cache


class AnalysisObject:
    def __init__(
        self,
        models_path: Optional[Union[Path, str]] = None,
        atlas_path: Optional[Union[Path, str]] = None,
        batch_size: int = 4,
        overlap_size: Tuple[int, int, int] = (16, 16, 8),
        compute_dtype: str = "bfloat16",
        registration_mode: str = "auto",
        registration_steps: int = 60,
    ):
        if isinstance(models_path, str) and models_path.startswith(PHANTOM):
            models_path = _phantom_models_dir()
        elif models_path is None:
            from oai_analysis_2_tpu.utils.data import models_dir

            try:
                models_path = models_dir()
            except Exception as e:  # noqa: BLE001 — downloads fail offline
                raise RuntimeError(
                    "could not fetch the release models tarball; pre-seed "
                    "OAI_TPU_DATA_DIR, pass models_path=..., or use "
                    "models_path='phantom' for an offline threshold-weights "
                    "segmenter"
                ) from e
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

        #: directory holding the atlas artifacts (atlas_fc/tc.nii.gz probmaps
        #: next to atlas_image.nii.gz, FullDemo cell 9); None for phantoms.
        self.atlas_dir: Optional[Path] = None
        if isinstance(atlas_path, str) and atlas_path.startswith(PHANTOM):
            self.atlas_image: Image = _phantom_atlas(_parse_phantom_shape(atlas_path))
        else:
            if atlas_path is None:
                from oai_analysis_2_tpu.utils.data import atlases_dir

                try:
                    atlas_path = (
                        atlases_dir()
                        / "atlas_60_LEFT_baseline_NMI"
                        / "atlas_image.nii.gz"
                    )
                except Exception as e:  # noqa: BLE001 — downloads fail offline
                    raise RuntimeError(
                        "could not fetch the release atlas tarball; pre-seed "
                        "OAI_TPU_DATA_DIR, pass atlas_path=..., or use "
                        "atlas_path='phantom' for an offline synthetic atlas"
                    ) from e
            self.atlas_image = read_nifti(atlas_path)
            self.atlas_dir = Path(atlas_path).parent

    @classmethod
    def offline(cls, atlas_shape: str = "phantom", **kwargs) -> "AnalysisObject":
        """Construct with zero downloads: bundled synthetic atlas + the
        threshold-weights production-topology segmenter. `atlas_shape` may be
        "phantom" (reference 160x384x384 grid) or "phantom:D,H,W"."""
        kwargs.setdefault("models_path", PHANTOM)
        kwargs.setdefault("atlas_path", atlas_shape)
        return cls(**kwargs)

    def segment(self, preprocessed_image: Image) -> Tuple[Image, Image]:
        """(FC_probmap, TC_probmap) — reference analysis_object.py:43-45."""
        return self.segmenter.segment(
            preprocessed_image, if_output_prob_map=True, if_output_itk=True
        )

    def register(self, preprocessed_image: Image):
        """Displacement transform warping knee-grid data onto the atlas grid —
        reference analysis_object.py:47-49."""
        return self.registerer.register(preprocessed_image, self.atlas_image)
