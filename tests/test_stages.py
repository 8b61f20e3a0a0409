"""Stage-level API tests (engine/stages.py — the dask_processing-equivalent
surface) incl. zarr ingestion and the full segment_method artifact flow."""

import json

import numpy as np
import pytest

import jax

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.core.nifti import write_nifti
from oai_analysis_2_tpu.engine import stages
from oai_analysis_2_tpu.utils.zarr_io import write_zarr_volume


@pytest.fixture(scope="module")
def volume_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vols")
    rng = np.random.default_rng(0)
    img = image_from_array(
        rng.uniform(0, 800, (12, 24, 24)).astype(np.float32), spacing=(0.5, 0.5, 1.0)
    )
    write_nifti(img, tmp / "knee.nii.gz")
    write_zarr_volume(img, tmp / "knee_zarr")
    return tmp, img


class TestStages:
    def test_readimage_nifti_and_zarr_agree(self, volume_files):
        tmp, img = volume_files
        a = stages.readimage(tmp / "knee.nii.gz")
        b = stages.readimage(tmp / "knee_zarr")
        np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data), atol=1e-3)

    def test_image_normalize(self, volume_files):
        _, img = volume_files
        out = stages.image_normalize(img)
        d = np.asarray(out.data)
        assert d.min() >= 0.0 and d.max() <= 1.0

    def test_deform_probmap_identity_field(self, volume_files):
        from oai_analysis_2_tpu.ops.resample import DisplacementField
        import jax.numpy as jnp

        _, img = volume_files
        disp = DisplacementField(
            field=jnp.zeros(img.data.shape + (3,), jnp.float32),
            origin=img.origin, spacing=img.spacing, direction=img.direction,
        )
        out = stages.deform_probmap(disp, img, img, img)
        np.testing.assert_allclose(np.asarray(out.data), np.asarray(img.data), atol=1e-3)

    def test_segment_method_from_artifacts(self, volume_files, tmp_path):
        from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D
        from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

        tmp, _ = volume_files
        models = tmp_path / "models"
        models.mkdir()
        (models / "segmentation_train_config.pth.tar").write_text(
            json.dumps({
                "patch_size": [16, 16, 8],
                "model": "UNet_light4",
                "model_setting": {"in_channel": 1, "n_classes": 2},
            })
        )
        model = UNet3D(NETWORK_SPECS["UNet_light4"])
        save_checkpoint(
            {"params": jax.jit(model.init)(jax.random.PRNGKey(0)), "epoch": 2},
            False, models, name="segmentation_model.npz",
        )
        fc, tc = stages.segment_method(
            tmp / "knee.nii.gz", models, batch_size=2, overlap_size=(2, 2, 1)
        )
        assert fc.data.shape == (12, 24, 24)
