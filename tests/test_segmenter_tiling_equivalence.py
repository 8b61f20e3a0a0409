"""Auto z-slab inference tiling: equivalence with the reference tiling.

The default inference tiling is now "auto" (x,y-spanning z-slabs,
engine/segmenter.py partition_for) instead of the reference's
training-patch tiling (analysis_object.py:22-23) — 1.76x redundant conv
work instead of 3.56x, measured 1.65 s vs 2.63 s per knee on v5e. The two
tilings are NOT bit-identical: outputs differ inside the discarded overlap
bands' receptive-field shadow, where a tile boundary's reflect padding
replaces true neighbors beyond the kept region. These tests bound that
difference under the reference's own acceptance budget — Sum|pred - golden|
< 12 per tissue (test/test_all.py:32-33) — with REAL (randomized) weights,
where every voxel is sensitive to its receptive field; threshold weights
would trivially agree.

Also pins the auto-rule's geometry: production shapes pick the measured
(416,416,48) slab; tiny/degenerate shapes fall back to the training tiling.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D
from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint


def _make_segmenter(tmp_path, inference_patch_size, model="UNet_light1",
                    patch_size=(32, 32, 16), overlap=(8, 8, 4)):
    cfg_file = tmp_path / "cfg.json"
    if not cfg_file.exists():
        cfg_file.write_text(
            json.dumps(
                {
                    "patch_size": list(patch_size),
                    "model": model,
                    "model_setting": {
                        "in_channels": 1, "n_classes": 2, "bias": True, "BN": False,
                    },
                }
            )
        )
        spec = NETWORK_SPECS[model].replace(bias=True)
        net = UNet3D(spec)
        params = net.init(jax.random.PRNGKey(7))
        # fan-in-scaled randomization keeps activations O(1) through depth so
        # probability outputs span (0, 1) and tolerances stay meaningful
        params = jax.tree_util.tree_map(
            lambda p: p * (1.5 / np.sqrt(max(np.prod(p.shape[:-1]), 1.0)))
            if p.ndim >= 5 else p * 0.05,
            params,
        )
        save_checkpoint({"params": params, "epoch": 1}, False, tmp_path,
                        name="seg.npz")
    config = {
        "ckpoint_path": str(tmp_path / "seg.npz"),
        "training_config_file": str(cfg_file),
        "batch_size": 2,
        "overlap_size": overlap,
        "compute_dtype": "float32",
    }
    if inference_patch_size is not None:
        config["inference_patch_size"] = inference_patch_size
    seg = Segmenter3DInPatchClassWise(mode="pred", config=config)
    seg.pred_setup()
    return seg


class TestAutoTileGeometry:
    def test_production_shape_picks_measured_slab(self, tmp_path):
        """At the reference workload (160x384x384, 128x128x32 training tile,
        (16,16,8) overlap) auto must pick the measured (416,416,48) slab."""
        seg = _make_segmenter(tmp_path, None, model="UNet",
                              patch_size=(128, 128, 32), overlap=(16, 16, 8))
        part = seg.partition_for((160, 384, 384))
        assert part.tile_size == (48, 416, 416)  # stored z,y,x
        assert part.num_tiles((160, 384, 384)) == 5
        assert seg.partition.num_tiles((160, 384, 384)) == 160  # training tiling

    def test_oversize_slab_falls_back(self, tmp_path):
        """A volume whose x,y span would exceed the per-step voxel budget
        keeps the training tiling."""
        seg = _make_segmenter(tmp_path, None, model="UNet",
                              patch_size=(128, 128, 32), overlap=(16, 16, 8))
        part = seg.partition_for((160, 768, 768))
        assert part is seg.partition

    def test_knee_batch_divides_slab_budget(self, tmp_path):
        """The auto slab must be runnable at scan batch 1 with ALL knees in
        the step: at the production shape a 2-knee batch already exceeds the
        budget (2 x 8.3M voxels), so batched runs keep the training tiling
        while the single-knee path keeps the measured slab."""
        seg = _make_segmenter(tmp_path, None, model="UNet",
                              patch_size=(128, 128, 32), overlap=(16, 16, 8))
        assert seg.partition_for((160, 384, 384), n_knees=1).num_tiles(
            (160, 384, 384)
        ) == 5
        assert seg.partition_for((160, 384, 384), n_knees=2) is seg.partition

    def test_step_batch_budget_clamp(self):
        """Per-step conv voxels (tile x scan_batch x knees) never exceed
        STEP_VOXEL_BUDGET: the bench OOM was 5 z-slabs in one step (41.5M,
        a 21 GB fusion); proven-good regimes (1 slab; 8 training tiles;
        8-knee training-tile batches at batch 1) must be preserved."""
        cls = Segmenter3DInPatchClassWise
        slab = 48 * 416 * 416        # 8.3M — the production auto slab
        train = 48 * 160 * 160       # 1.23M — training patch + overlap
        assert cls._step_batch(8, 5, slab, 1) == 1      # was 5 -> OOM
        assert cls._step_batch(8, 160, train, 1) == 8   # proven 2.4 s config
        assert cls._step_batch(8, 160, train, 8) == 1   # B=8 cohort batch
        assert cls._step_batch(8, 160, train, 2) == 4
        assert cls._step_batch(8, 3, train, 1) == 3     # tile-count clamp

    def test_tiny_volume_falls_back(self, tmp_path):
        """Reflect-pad safety: dims too small for the slab's padding keep
        the training tiling instead of crashing jnp.pad."""
        seg = _make_segmenter(tmp_path, None)
        part = seg.partition_for((6, 6, 6))
        assert part is seg.partition

    def test_train_sentinel_is_reference_faithful(self, tmp_path):
        seg = _make_segmenter(tmp_path, "train")
        assert seg.partition_for((64, 96, 96)) is seg.partition
        assert seg.partition.tile_size == (16, 32, 32)

    def test_matching_tile_is_bit_identical_path(self, tmp_path):
        """When auto degenerates to the training tile (volume fits one
        training patch), the partitions are equivalent."""
        seg = _make_segmenter(tmp_path, None, model="UNet",
                              patch_size=(128, 128, 32), overlap=(16, 16, 8))
        part = seg.partition_for((16, 96, 96))
        assert part.tile_size == seg.partition.tile_size


class TestTilingEquivalence:
    def test_auto_slab_within_reference_budget(self, tmp_path):
        """Auto z-slabs vs training tiling with REAL random weights on a
        structured phantom: the reference's Sum|diff| < 12 budget (on ~25x
        fewer voxels than its full volume, so strictly harder per voxel)
        plus a tight interior band."""
        rng = np.random.default_rng(3)
        shape = (48, 96, 96)
        z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                              indexing="ij")
        rr = np.sqrt(((z - 24) * 2.0) ** 2 + (y - 52) ** 2 + (x - 48) ** 2)
        shell = np.clip(1.0 - np.abs(rr - 30.0) / 3.0, 0, 1)
        vol = (shell * 0.7 + rng.uniform(0, 0.3, shape)).astype(np.float32)
        img = image_from_array(vol)

        seg_auto = _make_segmenter(tmp_path, None)
        seg_ref = _make_segmenter(tmp_path, "train")
        # same checkpoint, different tiling
        a_fc, a_tc = seg_auto.segment(img, if_output_prob_map=True, if_output_itk=False)
        r_fc, r_tc = seg_ref.segment(img, if_output_prob_map=True, if_output_itk=False)

        auto_part = seg_auto.partition_for(shape)
        assert auto_part.num_tiles(shape) < seg_ref.partition.num_tiles(shape)

        for got, want in ((a_fc, r_fc), (a_tc, r_tc)):
            diff = np.abs(np.asarray(got) - np.asarray(want))
            assert diff.sum() < 12.0, diff.sum()  # the reference's budget
            # the receptive-field shadow is local to discarded tile
            # boundaries: the bulk of the volume must agree tightly
            assert np.quantile(diff, 0.99) < 5e-3, np.quantile(diff, 0.99)
            assert diff.max() < 0.25, diff.max()

    def test_batched_path_uses_auto_tiling(self, tmp_path):
        """volume_fn_batched (the BatchKneePipeline seam) must pick the same
        auto tiling as the single-knee path — identical outputs."""
        rng = np.random.default_rng(5)
        shape = (32, 64, 64)
        vol = rng.uniform(0, 1, shape).astype(np.float32)
        seg = _make_segmenter(tmp_path, None)

        single = seg._segment_fn(shape, 2, threshold=False)
        batched = jax.jit(seg.volume_fn_batched(2, shape, 2, threshold=False))
        out_s = np.asarray(single(seg.params, jnp.asarray(vol)))
        out_b = np.asarray(batched(seg.params, jnp.stack([jnp.asarray(vol)] * 2)))
        np.testing.assert_allclose(out_b[0], out_s, atol=1e-6)
        np.testing.assert_allclose(out_b[1], out_s, atol=1e-6)
