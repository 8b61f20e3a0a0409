"""Converter parity against the reference's OWN torch classes.

The round-3 review flagged converter transcription risk: the torch→JAX
checkpoint converter was exercised only against a hand-transcribed oracle
(tests/test_unet3d.TorchUNetOracle, built from this repo's spec tables), so
a key-naming or layout mismatch against the real `.pth.tar` would not be
caught. This test closes that gap by importing the reference tree's own
`oai_analysis/segmentation/networks.py` (mounted read-only at
/root/reference; torch is installed), `torch.save`-ing a REAL state_dict
from the reference classes, loading it through the production converter +
segmenter, and pinning the JAX forward against the reference torch forward.
Key names, Sequential indices, and tensor layouts all come from reference
code (networks.py:38-149 for UNet, 259-661 for the light variants), not
from this repo's spec tables.

Skips cleanly when the reference tree is not mounted (e.g. downstream CI).
"""

import importlib.util
import json
import os
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D  # noqa: E402
from oai_analysis_2_tpu.utils.checkpoint import convert_torch_unet_state_dict  # noqa: E402
from tests.test_unet3d import _randomize  # noqa: E402

_REF = Path(os.environ.get("OAI_REFERENCE_DIR", "/root/reference"))
_NETWORKS_PY = _REF / "oai_analysis" / "segmentation" / "networks.py"

pytestmark = pytest.mark.skipif(
    not _NETWORKS_PY.exists(),
    reason="reference tree not mounted (set OAI_REFERENCE_DIR)",
)


@pytest.fixture(scope="module")
def ref_networks():
    """The reference's networks module, loaded from its own source file."""
    spec = importlib.util.spec_from_file_location("ref_networks", _NETWORKS_PY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _forward_parity(ref_cls, spec, shape_zyx=(8, 8, 8), atol=2e-4, seed=3):
    """state_dict from the REFERENCE class -> converter -> JAX forward parity."""
    oracle = _randomize(ref_cls(1, spec.n_classes, bias=spec.bias, BN=spec.batchnorm),
                        seed=seed).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_torch_unet_state_dict(sd, spec)
    model = UNet3D(spec, compute_dtype=jnp.float32, precision="highest")

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, spec.in_channels) + shape_zyx).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()  # (N, C, D, H, W)
    got = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref, atol=atol, rtol=1e-3)


class TestReferenceForwardParity:
    """Every registry entry (networks.py:849-855) + the off-registry lights."""

    def test_unet(self, ref_networks):
        _forward_parity(ref_networks.UNet, NETWORK_SPECS["UNet"])

    def test_unet_bias(self, ref_networks):
        _forward_parity(ref_networks.UNet, NETWORK_SPECS["UNet"].replace(bias=True))

    def test_unet_bias_bn(self, ref_networks):
        _forward_parity(
            ref_networks.UNet, NETWORK_SPECS["UNet"].replace(bias=True, batchnorm=True)
        )

    @pytest.mark.parametrize(
        "name", ["UNet_light1", "UNet_light2", "UNet_light3", "UNet_light4"]
    )
    def test_light_variants(self, ref_networks, name):
        _forward_parity(getattr(ref_networks, name), NETWORK_SPECS[name])

    def test_light4_2(self, ref_networks):
        _forward_parity(
            ref_networks.UNet_light4_2, NETWORK_SPECS["UNet_light4_2"], shape_zyx=(4, 4, 4)
        )

    def test_classwise_trunk_converts_with_fresh_heads(self, ref_networks):
        """The reference's UNetClassWise keeps its per-class heads in a plain
        Python list (networks.py:182), so its shipped state_dicts lack them.
        The converter must restore the trunk and warn-initialize the heads."""
        spec = NETWORK_SPECS["UNetClassWise"]
        oracle = _randomize(ref_networks.UNetClassWise(1, 2), seed=5).eval()
        sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
        assert not any(k.startswith("dc0s") for k in sd)  # the reference defect
        with pytest.warns(UserWarning, match="head"):
            params = convert_torch_unet_state_dict(sd, spec)
        model = UNet3D(spec, compute_dtype=jnp.float32, precision="highest")
        out = model.apply(params, jnp.ones((1, 8, 8, 8, 1)))
        assert out.shape == (1, 8, 8, 8, 2)
        assert np.isfinite(np.asarray(out)).all()


def test_reference_checkpoint_through_segmenter(ref_networks, tmp_path):
    """End-to-end: a real `.pth.tar` written from the reference UNet class in
    the release's on-disk shape (DataParallel `module.` prefixes, optimizer
    state, epoch/best keys — reference utils.py:20-45,48-57), restored via the
    production config + segmenter path, compared against the reference torch
    forward through the same tiling with the reference's own L1 budget
    (test_all.py:32-33)."""
    from oai_analysis_2_tpu.core.image import image_from_array
    from oai_analysis_2_tpu.engine.segmenter import Segmenter3DInPatchClassWise
    from oai_analysis_2_tpu.ops.tiling import Partition

    oracle = _randomize(ref_networks.UNet(1, 2, bias=True), seed=7).eval()
    sd = {"module." + k: v for k, v in oracle.state_dict().items()}
    torch.save(
        {
            "model_state_dict": sd,
            "optimizer_state_dict": {"state": {}, "param_groups": []},
            "epoch": 600,
            "best_score": 0.89,
        },
        tmp_path / "reference_model.pth.tar",
    )
    (tmp_path / "train_config.json").write_text(
        json.dumps(
            {
                "patch_size": [64, 64, 32],  # x, y, z
                "model": "UNet",
                "model_setting": {
                    "in_channels": 1, "n_classes": 2, "bias": True, "BN": False,
                },
            }
        )
    )
    seg = Segmenter3DInPatchClassWise(
        mode="pred",
        config={
            "ckpoint_path": str(tmp_path / "reference_model.pth.tar"),
            "training_config_file": str(tmp_path / "train_config.json"),
            "batch_size": 4,
            "overlap_size": (16, 16, 8),
            "compute_dtype": "float32",  # parity run; production uses bf16
        },
    )

    rng = np.random.default_rng(13)
    vol = rng.uniform(0.0, 1.0, (16, 32, 32)).astype(np.float32)
    image = image_from_array(vol, spacing=(0.36, 0.36, 0.7))
    fc, tc = seg.segment(image, if_output_prob_map=True, if_output_itk=False)
    assert seg.epoch == 600 and seg.best_score == 0.89

    partition = Partition((64, 64, 32), (16, 16, 8), padding_mode="reflect")
    tiles = np.asarray(partition(jnp.asarray(vol)))
    with torch.no_grad():
        probs = torch.sigmoid(oracle(torch.from_numpy(tiles[:, None]).float())).numpy()
    for got, ch in ((np.asarray(fc), 0), (np.asarray(tc), 1)):
        want = np.asarray(
            partition.assemble(jnp.asarray(probs[:, ch]), vol.shape, crop_size=(16, 16, 8))
        )
        assert np.abs(got - want).sum() < 12.0  # the reference's budget
        np.testing.assert_allclose(got, want, atol=5e-3)
