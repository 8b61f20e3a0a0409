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
        self._auto_partitions = {}

    # -- setup -------------------------------------------------------------------

    def pred_setup(self) -> None:
        """Load training config + checkpoint, build the jittable model
        (reference pred_setup, segmenter.py:51-62).

        Config key `inference_patch_size` controls the inference tiling. The
        UNets are fully convolutional, so any tile whose dims survive the
        pooling ladder is valid — and larger tiles slash the overlap-tiling
        overhead: at the reference's 128x128x32 training tile with (16,16,8)
        overlap only 28% of each tile's voxels are kept (3.56x redundant
        conv work per volume); x,y-spanning z-slabs of 416x416x48 keep 57%
        (1.76x) and measure 1.65 s vs 2.63 s per knee on v5e. Values:

        * absent / "auto" (DEFAULT): per-volume-shape z-slabs spanning x,y
          (see `partition_for`), falling back to the training tile whenever
          the slab is unsafe or not a win. Outputs differ from the training
          tiling only inside the discarded overlap bands' receptive-field
          shadow — bounded well inside the reference's own Sum|diff| < 12
          acceptance budget (tests/test_segmenter_tiling_equivalence.py);
        * "train": the reference-faithful training-patch tiling
          (analysis_object.py:22-23 semantics, bit-matching the torch loop);
        * (x, y, z) tuple: a fixed explicit tile.
        """
        training_config = load_json_to_dict(self.config["training_config_file"])
        self.patch_size = tuple(training_config["patch_size"])  # x, y, z
        spec = get_network(training_config["model"])
        self.pool_factor = 2 ** (len(spec.enc) - 1)
        ips = self.config.get("inference_patch_size")
        self.auto_tile = ips in (None, "auto")
        tile = self.patch_size if (self.auto_tile or ips == "train") else tuple(ips)
        if any(t % self.pool_factor for t in tile):
            raise ValueError(
                f"inference_patch_size {tile} must be divisible by {self.pool_factor} "
                f"(the {training_config['model']} pooling ladder)"
            )
        try:
            self.partition = Partition(
                tile, self.config.get("overlap_size", (16, 16, 8)), padding_mode="reflect"
            )
        except ValueError:
            # Under "auto" the training-patch tiling is only the FALLBACK —
            # a train patch too small for the configured overlap (e.g. a
            # 32x32x16 patch with the default (16,16,8)) must not block
            # configs the auto z-slabs serve fine. Explicit/"train" tilings
            # keep the strict error.
            if not self.auto_tile:
                raise
            self.partition = None
        setting = dict(training_config.get("model_setting", {}))
        if "in_channel" in setting:
            setting["in_channels"] = setting.pop("in_channel")
        if "BN" in setting:
            setting["batchnorm"] = setting.pop("BN")
        spec = spec.replace(**{k: v for k, v in setting.items() if k in
                               ("in_channels", "n_classes", "bias", "batchnorm")})
        dtype = jnp.bfloat16 if self.config.get("compute_dtype", "bfloat16") == "bfloat16" else jnp.float32
        self.model = UNet3D(spec, compute_dtype=dtype,
                            conv_impl=self.config.get("conv_impl", "auto"))
        self.params, self.epoch, self.best_score = initialize_model(
            self.model, ckpoint_path=self.config.get("ckpoint_path")
        )
        self.ready = True

    # -- inference tiling ----------------------------------------------------------

    # Per-scan-step conv budget, in input voxels across ALL tiles in the
    # step (tile_voxels x scan_batch x n_knees). Measured-safe regimes on a
    # 16 GB v5e chip: one 416x416x48 z-slab per step (8.3M, 1.65 s/knee)
    # and eight (160,160,48) training tiles per step (9.83M, 2.4 s/knee);
    # FIVE slabs in one step (41.5M) built a 21 GB f32 fusion at the wide
    # decoder level and OOMed. 10M keeps every proven-good lowering and
    # pins slabs to scan batch 1.
    STEP_VOXEL_BUDGET = 10_000_000

    def partition_for(
        self, volume_shape: Tuple[int, int, int], n_knees: int = 1
    ) -> Partition:
        """The tiling used for one (z, y, x) volume shape in an
        `n_knees`-wide batch.

        With `inference_patch_size` absent/"auto" (default) this builds
        x,y-spanning z-slabs: one tile covers the whole padded x,y extent and
        the tile depth stays at the training patch depth — 1.76x redundant
        conv work instead of the training tiling's 3.56x, measured 1.65 s vs
        2.63 s per knee on v5e at the reference workload (NEXT.md). The
        output differs from the training tiling only inside the discarded
        overlap bands' receptive-field shadow (equivalence pinned in
        tests/test_segmenter_tiling_equivalence.py under the reference's
        Sum|diff| < 12 budget, test_all.py:32-33). Falls back to the
        training tiling when the slab is unsafe or not a win:

          * reflect padding would exceed a dim's extent (tiny volumes),
          * slab voxels x n_knees > STEP_VOXEL_BUDGET — the slab must be
            runnable at scan batch 1 (one slab per step) without blowing
            the step's conv-fusion memory,
          * no tile-count win over the training tiling.
        """
        if not getattr(self, "auto_tile", False):
            return self.partition
        key = tuple(int(s) for s in volume_shape) + (int(n_knees),)
        if key not in self._auto_partitions:
            part = self._build_auto_partition(key[:3], n_knees) or self.partition
            if part is None:
                ov = tuple(self.config.get("overlap_size", (16, 16, 8)))
                raise ValueError(
                    f"no valid inference tiling for volume {key}: the training "
                    f"patch {self.patch_size} does not exceed 2x overlap {ov} "
                    f"and no auto z-slab qualified — pass a larger explicit "
                    f"inference_patch_size or a smaller overlap_size"
                )
            self._auto_partitions[key] = part
        return self._auto_partitions[key]

    def _build_auto_partition(self, volume_shape, n_knees: int = 1) -> Optional[Partition]:
        pool = self.pool_factor
        ov = tuple(self.config.get("overlap_size", (16, 16, 8)))  # x, y, z
        d, h, w = volume_shape

        def up(v: int) -> int:
            return -(-int(v) // pool) * pool

        tx = up(w + 2 * ov[0])
        ty = up(h + 2 * ov[1])
        tz = min(up(self.patch_size[2] + 2 * ov[2]), up(d + 2 * ov[2]))
        if tx * ty * tz * n_knees > self.STEP_VOXEL_BUDGET:
            return None
        if any(t - 2 * o <= 0 for t, o in zip((tx, ty, tz), ov)):
            return None
        cand = Partition((tx, ty, tz), ov, padding_mode="reflect")
        # exact reflect-pad safety: left pad o and right pad eff*grid + o - s
        # must each stay below the dim's extent
        grid = cand.grid_shape(volume_shape)
        for e, g, o, s in zip(cand.effective_size, grid, cand.overlap_size,
                              volume_shape):
            if o > s - 1 or (e * g + o - s) > s - 1:
                return None
        if self.partition is not None and cand.num_tiles(
            volume_shape
        ) >= self.partition.num_tiles(volume_shape):
            return None
        return cand

    @classmethod
    def _step_batch(
        cls, batch_size: int, n_tiles: int, tile_voxels: int, n_knees: int
    ) -> int:
        """Clamp the scan batch to (a) the tile count — fewer tiles than the
        batch (auto z-slabs: 5 at production scale) would pad the conv batch
        with duplicate tiles — and (b) the per-step voxel budget: scan batch
        8 with z-slab tiles built a 21 GB decoder fusion and OOMed the 16 GB
        chip (the round-3 slab numbers were measured at scan batch 1). The
        knee axis multiplies per-step work identically, so it divides the
        budget too."""
        return max(
            1,
            min(batch_size, n_tiles, cls.STEP_VOXEL_BUDGET // (tile_voxels * n_knees)),
        )

    # -- the fused device-side pipeline ------------------------------------------

    def volume_fn(self, volume_shape: Tuple[int, int, int], batch_size: int, threshold: bool):
        """The PURE (params, volume) -> (C, D, H, W) probmaps function for a
        static volume shape. Unjitted so callers can compose it; the
        single-knee path jits it directly (`_segment_fn`). Delegates to
        `volume_fn_batched` with a 1-knee batch — identical layout and math,
        one builder to maintain."""
        run_b = self.volume_fn_batched(1, volume_shape, batch_size, threshold)

        def run(params, volume):
            return run_b(params, volume[None])[0]

        return run

    def _segment_fn(self, volume_shape: Tuple[int, int, int], batch_size: int, threshold: bool):
        """Build (and cache) the jitted volume->probmaps function for a shape."""
        key = (volume_shape, batch_size, threshold)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self.volume_fn(volume_shape, batch_size, threshold))
        return self._jitted[key]

    def volume_fn_batched(
        self, n_knees: int, volume_shape: Tuple[int, int, int], batch_size: int,
        threshold: bool,
    ):
        """(params, volumes (B,D,H,W)) -> (B,C,D,H,W), NATIVELY batched.

        Each scan step dynamic-slices one tile batch from EVERY knee and
        runs the UNet once on a (B*batch_size) conv batch — the knee axis
        is a plain conv batch dim, NOT a vmap (vmapping the per-knee program
        let XLA re-lay-out the convs: measured 1.7-2.4x slower per knee at
        production scale), and the dim shards cleanly over a device mesh
        (each chip convolves its own knees' tiles every step).

        STREAMING design: tiles are dynamic-sliced out of the padded volumes
        inside the scan step and each step's central regions are scattered
        straight into the output canvas carried through the scan. Live HBM
        per knee is one padded volume + one tile batch + the canvas
        (~0.4 GB at production scale) instead of the full tile array + all
        probabilities (~11 GB) — materializing those made a 2-knee batch
        spill HBM on a 16 GB chip (measured 3x slowdown)."""
        partition = self.partition_for(volume_shape, n_knees)
        model = self.model
        n_classes = model.spec.n_classes
        eff = partition.effective_size
        ov = partition.overlap_size
        tz, ty, tx = partition.tile_size
        grid = partition.grid_shape(volume_shape)
        n_tiles = partition.num_tiles(volume_shape)
        batch_size = self._step_batch(batch_size, n_tiles, tz * ty * tx, n_knees)
        n_batches = math.ceil(n_tiles / batch_size)
        n_padded = n_batches * batch_size
        crop = tuple(self.config.get("overlap_size", (16, 16, 8)))
        padded_total = tuple(e * g + 2 * o for e, g, o in zip(eff, grid, ov))
        pad_width = ((0, 0),) + tuple(
            (o, pt - s - o) for o, pt, s in zip(ov, padded_total, volume_shape)
        )

        starts = [
            (i * eff[0], j * eff[1], k * eff[2])
            for i in range(grid[0])
            for j in range(grid[1])
            for k in range(grid[2])
        ]
        starts += [starts[0]] * (n_padded - n_tiles)
        starts_arr = np.asarray(starts, np.int32).reshape(n_batches, batch_size, 3)

        def run(params, volumes):
            padded = jnp.pad(volumes, pad_width, mode=partition.padding_mode)
            canvas0 = jnp.zeros(
                (n_knees, n_classes) + tuple(g * e for g, e in zip(grid, eff)),
                jnp.float32,
            )
            step_starts = jnp.asarray(starts_arr)

            def step(canvas, batch_starts):
                def slice_tile(s):
                    # same tile position from every knee: (B, tz, ty, tx)
                    return jax.lax.dynamic_slice(
                        padded, (0, s[0], s[1], s[2]), (n_knees, tz, ty, tx)
                    )

                tiles = jax.vmap(slice_tile)(batch_starts)  # (bs, B, tz, ty, tx)
                flat = tiles.reshape((batch_size * n_knees, tz, ty, tx, 1))
                probs = jax.nn.sigmoid(model.apply(params, flat))
                if threshold:
                    probs = (probs > 0.5).astype(jnp.float32)
                probs = probs.reshape(
                    (batch_size, n_knees, tz, ty, tx, n_classes)
                )
                central = probs[
                    :, :, ov[0] : tz - ov[0], ov[1] : ty - ov[1], ov[2] : tx - ov[2], :
                ].astype(jnp.float32)
                for b in range(batch_size):
                    block = jnp.moveaxis(central[b], -1, 1)  # (B, C, ez, ey, ex)
                    canvas = jax.lax.dynamic_update_slice(
                        canvas,
                        block,
                        (0, 0, batch_starts[b, 0], batch_starts[b, 1], batch_starts[b, 2]),
                    )
                return canvas, None

            canvas, _ = jax.lax.scan(step, canvas0, step_starts)
            out = canvas[:, :, : volume_shape[0], : volume_shape[1], : volume_shape[2]]
            cz, cy_, cx_ = int(crop[2]), int(crop[0]), int(crop[1])
            mask = jnp.zeros(volume_shape, out.dtype)
            mask = mask.at[
                cz : volume_shape[0] - cz,
                cy_ : volume_shape[1] - cy_,
                cx_ : volume_shape[2] - cx_,
            ].set(1)
            return out * mask[None, None]

        return run

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
