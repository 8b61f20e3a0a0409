"""Production-shape surrogate for the reference's golden segmentation test.

The reference's core contract is `sum(|pred - golden probmap|) < 12` on the
full `UNet` with the shipped epoch-600 checkpoint at patch size
[128, 128, 32] / overlap (16, 16, 8) (test/test_all.py:26-40,
analysis_object.py:18-29). The shipped artifacts are network downloads this
environment cannot reach (tests/test_golden.py stays gated on them), so this
is the offline stand-in the round-2 verdict asked for: a REAL torch
`.pth.tar` checkpoint of the full reference-architecture `UNet` (module.
prefixes, optimizer state — the exact on-disk shape the release ships),
loaded through the production converter + segmenter at the production patch
size, pinned against the torch forward on the same volume with the
reference's own L1 budget.

Volume sizing: one effective region (16, 96, 96), reflect-padded by the
Partition to exactly one full (32, 128, 128) production patch — the full
UNet is ~550 GFLOP per patch, so a DESS-sized volume (160 patches) is not
CI-affordable on this CPU; patch-scale equivalence plus the separately
validated tiling algebra (tests/test_tiling.py, bit-identical to the
reference's Partition semantics) covers the same contract.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from oai_analysis_2_tpu.core.image import image_from_array  # noqa: E402
from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise  # noqa: E402
from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS  # noqa: E402
from oai_analysis_2_tpu.ops.tiling import Partition  # noqa: E402
from tests.test_unet3d import TorchUNetOracle, _randomize  # noqa: E402


def _phantom(shape, seed=11):
    """Shell + intensity ramp + texture — structured like a windowed DESS."""
    rng = np.random.default_rng(seed)
    d, h, w = shape
    z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")
    c = (d * 0.5, h * 0.55, w * 0.5)
    rr = np.sqrt(((z - c[0]) * 2.4) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2)
    shell = np.clip(1.0 - np.abs(rr - h * 0.3) / 3.0, 0, 1)
    ramp = 0.2 * x / w
    return (shell * 0.6 + ramp + rng.uniform(0, 0.2, shape)).astype(np.float32)


def test_full_unet_production_patch_matches_torch(tmp_path):
    spec = NETWORK_SPECS["UNet"]  # the shipped architecture (networks.py:38-66)
    oracle = _randomize(TorchUNetOracle(spec), seed=3).eval()

    # the release's on-disk checkpoint shape: DataParallel "module." prefixes,
    # optimizer state, epoch/best keys (reference utils.py:20-45)
    sd = {"module." + k: v for k, v in oracle.state_dict().items()}
    ck = {
        "model_state_dict": sd,
        "optimizer_state_dict": {"state": {}, "param_groups": []},
        "epoch": 600,
        "best_score": 0.89,
    }
    torch.save(ck, tmp_path / "surrogate_model.pth.tar")
    (tmp_path / "train_config.json").write_text(
        json.dumps(
            {
                "patch_size": [128, 128, 32],  # x, y, z — production
                "model": "UNet",
                "model_setting": {
                    "in_channels": 1, "n_classes": 2, "bias": False, "BN": False,
                },
            }
        )
    )

    seg = Segmenter3DInPatchClassWise(
        mode="pred",
        config={
            "ckpoint_path": str(tmp_path / "surrogate_model.pth.tar"),
            "training_config_file": str(tmp_path / "train_config.json"),
            "batch_size": 4,
            "overlap_size": (16, 16, 8),
            "compute_dtype": "float32",  # parity run; production uses bf16
        },
    )

    vol = _phantom((16, 96, 96))  # one effective region -> ONE full patch
    image = image_from_array(vol, spacing=(0.36, 0.36, 0.7))
    fc, tc = seg.segment(image, if_output_prob_map=True, if_output_itk=False)
    assert seg.epoch == 600 and seg.best_score == 0.89

    # torch oracle: the reference's segment loop semantics on the same tiles
    partition = Partition((128, 128, 32), (16, 16, 8), padding_mode="reflect")
    tiles = np.asarray(partition(jnp.asarray(vol)))
    with torch.no_grad():
        logits = oracle(torch.from_numpy(tiles[:, None]).float())
        probs = torch.sigmoid(logits).numpy()  # (N, C, D, H, W)
    fc_t = np.asarray(
        partition.assemble(jnp.asarray(probs[:, 0]), vol.shape, crop_size=(16, 16, 8))
    )
    tc_t = np.asarray(
        partition.assemble(jnp.asarray(probs[:, 1]), vol.shape, crop_size=(16, 16, 8))
    )

    # the reference's regression budget (test_all.py:32-33), on ~160x fewer
    # voxels than its full volume — still asserted at the same absolute value
    # to mirror the contract, plus a per-voxel cap that actually binds
    for got, want in ((np.asarray(fc), fc_t), (np.asarray(tc), tc_t)):
        assert np.abs(got - want).sum() < 12.0
        np.testing.assert_allclose(got, want, atol=5e-3)
