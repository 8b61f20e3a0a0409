"""Patch-wise 3D segmentation engine.

TPU-native rework of the reference segmenter
(oai_analysis/segmentation/segmenter.py:38-131). The reference's hot loop —
partition, a Python batch loop with per-batch host<->device transfers
(segmenter.py:109-117), sigmoid, threshold, two assembles — collapses here
into ONE jitted function per volume shape: tiles are extracted by a fused
gather, scanned through the UNet in fixed-size batches entirely on device,
and scattered back by a reshape. The only host<->device transfers are the
input volume in and the two probability maps out.

Config keys mirror the reference (analysis_object.py:18-26):
  ckpoint_path, training_config_file, batch_size, overlap_size,
  output_prob, output_itk; plus framework extras `compute_dtype`
  ("float32" | "bfloat16") and `device` (accepted for API compatibility,
  ignored — JAX owns placement).
"""

from __future__ import annotations

import abc
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oai_analysis_2_tpu.core.image import Image
from oai_analysis_2_tpu.models.unet3d import UNet3D, get_network
from oai_analysis_2_tpu.ops.tiling import Partition
from oai_analysis_2_tpu.utils.checkpoint import initialize_model
from oai_analysis_2_tpu.utils.config import load_json_to_dict


class Segmenter(abc.ABC):
    """Engine interface (reference segmenter.py:19-35)."""

    @abc.abstractmethod
    def segment(self, image, *args, **kwargs):
        ...


class Segmenter3DInPatchClassWise(Segmenter):
    """Per-class sigmoid segmentation over overlap-tiled patches."""

    def __init__(self, mode: str = "pred", config: Optional[dict] = None):
        self.mode = mode
        self.config = dict(config or {})
        self.ready = False
        self.model: Optional[UNet3D] = None
        self.params = None
        self.partition: Optional[Partition] = None
        self._jitted = {}

    # -- setup -------------------------------------------------------------------

    def pred_setup(self) -> None:
        """Load training config + checkpoint, build the jittable model
        (reference pred_setup, segmenter.py:51-62)."""
        training_config = load_json_to_dict(self.config["training_config_file"])
        self.patch_size = tuple(training_config["patch_size"])  # x, y, z
        self.partition = Partition(
            self.patch_size, self.config.get("overlap_size", (16, 16, 8)), padding_mode="reflect"
        )
        spec = get_network(training_config["model"])
        setting = dict(training_config.get("model_setting", {}))
        if "in_channel" in setting:
            setting["in_channels"] = setting.pop("in_channel")
        if "BN" in setting:
            setting["batchnorm"] = setting.pop("BN")
        spec = spec.replace(**{k: v for k, v in setting.items() if k in
                               ("in_channels", "n_classes", "bias", "batchnorm")})
        dtype = jnp.bfloat16 if self.config.get("compute_dtype", "bfloat16") == "bfloat16" else jnp.float32
        self.model = UNet3D(spec, compute_dtype=dtype)
        self.params, self.epoch, self.best_score = initialize_model(
            self.model, ckpoint_path=self.config.get("ckpoint_path")
        )
        self.ready = True

    # -- the fused device-side pipeline ------------------------------------------

    def volume_fn(self, volume_shape: Tuple[int, int, int], batch_size: int, threshold: bool):
        """The PURE (params, volume) -> (C, D, H, W) probmaps function for a
        static volume shape — partition, scan the UNet over tile batches,
        sigmoid, assemble. Unjitted so callers can compose it: the single-knee
        path jits it directly (`_segment_fn`), the multi-chip batch pipeline
        vmaps it over a knee batch (parallel/batch.py)."""
        partition = self.partition
        model = self.model
        n_classes = model.spec.n_classes
        n_tiles = partition.num_tiles(volume_shape)
        n_batches = math.ceil(n_tiles / batch_size)
        n_padded = n_batches * batch_size
        crop = tuple(self.config.get("overlap_size", (16, 16, 8)))

        def run(params, volume):
            tiles = partition(volume)  # (N, tz, ty, tx)
            pad = n_padded - n_tiles
            tiles = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0), (0, 0)))
            batches = tiles.reshape((n_batches, batch_size) + partition.tile_size)

            def step(_, batch):
                logits = model.apply(params, batch[..., None])  # (B,D,H,W,C)
                return None, jax.nn.sigmoid(logits)

            _, probs = jax.lax.scan(step, None, batches)
            probs = probs.reshape((n_padded,) + partition.tile_size + (n_classes,))
            probs = probs[:n_tiles]
            if threshold:
                probs = (probs > 0.5).astype(jnp.float32)
            # assemble every class channel
            outs = [
                partition.assemble(probs[..., c], volume_shape, crop_size=crop)
                for c in range(n_classes)
            ]
            return jnp.stack(outs, axis=0)  # (C, D, H, W)

        return run

    def _segment_fn(self, volume_shape: Tuple[int, int, int], batch_size: int, threshold: bool):
        """Build (and cache) the jitted volume->probmaps function for a shape."""
        key = (volume_shape, batch_size, threshold)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self.volume_fn(volume_shape, batch_size, threshold))
        return self._jitted[key]

    # -- public API ---------------------------------------------------------------

    def segment(
        self,
        image: Image,
        if_output_prob_map: bool = True,
        if_output_itk: bool = True,
    ):
        """Segment a preprocessed volume into (FC, TC) maps — reference
        segmenter.py:100-131. Returns Images when `if_output_itk` (metadata
        copied from the input), else raw arrays."""
        if not self.ready:
            self.pred_setup()
        volume = image.data if isinstance(image, Image) else jnp.asarray(image)
        run = self._segment_fn(
            tuple(volume.shape),
            int(self.config.get("batch_size", 4)),
            threshold=not if_output_prob_map,
        )
        stacked = run(self.params, volume.astype(jnp.float32))
        fc, tc = stacked[0], stacked[1]
        if if_output_itk and isinstance(image, Image):
            return image.with_data(fc), image.with_data(tc)
        return fc, tc

    # training lives in engine/training.py; the reference's equivalents are
    # unimplemented stubs (segmenter.py:64-73, 94-98).
    def train(self, *args, **kwargs):
        from oai_analysis_2_tpu.engine.training import train_segmentation

        return train_segmentation(*args, **kwargs)

    def test(self, pairs, threshold: float = 0.5):
        """Evaluate the loaded model on (image, label) pairs; returns
        per-volume [FC, TC] Dice scores plus the mean.

        The reference declares this entry point but ships it as a stub
        (segmenter.py:94-98); here it runs the production `segment` path
        (same tiling/assembly) against binary label volumes shaped like the
        class maps: label (C, D, H, W) or a pair/list of per-class volumes.
        """
        results = []
        for image, label in pairs:
            fc, tc = self.segment(image, if_output_prob_map=True, if_output_itk=False)
            preds = [np.asarray(fc) > threshold, np.asarray(tc) > threshold]
            label = np.asarray(label)
            labels = [label[c] for c in range(label.shape[0])] if label.ndim == 4 else list(label)
            dices = []
            for p, l in zip(preds, labels):
                l = np.asarray(l) > 0.5
                denom = p.sum() + l.sum()
                dices.append(float(2.0 * np.logical_and(p, l).sum() / denom) if denom else 1.0)
            results.append(dices)
        arr = np.asarray(results, np.float64)
        return {"per_volume_dice": results, "mean_dice": arr.mean(axis=0).tolist()}
