"""Facade test: AnalysisObject against a pre-seeded offline data directory
(the OAI_TPU_DATA_DIR escape hatch of utils/data.py) — segment + register
through the reference's one-stop API (analysis_object.py:9-49)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def data_tree(tmp_path_factory):
    """models/ + atlases/ trees shaped like the reference release tarballs."""
    root = tmp_path_factory.mktemp("oai_data")
    models = root / "models"
    models.mkdir()
    (models / "segmentation_train_config.pth.tar").write_text(
        json.dumps(
            {
                "patch_size": [32, 32, 16],
                "model": "UNet_light4",
                "model_setting": {"in_channel": 1, "n_classes": 2},
            }
        )
    )
    from oai_analysis_2_tpu.models.unet3d import NETWORK_SPECS, UNet3D
    from oai_analysis_2_tpu.utils.checkpoint import save_checkpoint

    model = UNet3D(NETWORK_SPECS["UNet_light4"])
    params = jax.jit(model.init)(jax.random.PRNGKey(3))
    save_checkpoint({"params": params, "epoch": 1}, False, models,
                    name="segmentation_model.npz")

    atlas_dir = root / "atlases" / "atlas_60_LEFT_baseline_NMI"
    atlas_dir.mkdir(parents=True)
    from oai_analysis_2_tpu.core.image import image_from_array
    from oai_analysis_2_tpu.core.nifti import write_nifti

    rng = np.random.default_rng(0)
    atlas = image_from_array(rng.uniform(0, 1, (16, 32, 32)).astype(np.float32))
    write_nifti(atlas, atlas_dir / "atlas_image.nii.gz")
    return root


class TestAnalysisObject:
    def test_segment_and_register(self, data_tree, monkeypatch):
        monkeypatch.setenv("OAI_TPU_DATA_DIR", str(data_tree))

        from oai_analysis_2_tpu import AnalysisObject
        from oai_analysis_2_tpu.core.image import image_from_array
        from oai_analysis_2_tpu.ops.resample import DisplacementField, resample_image

        obj = AnalysisObject(
            batch_size=2,
            overlap_size=(4, 4, 2),
            compute_dtype="float32",
            registration_steps=5,
        )
        # steer the registration grid down to test size
        obj.registerer.config = obj.registerer.config.__class__(grid_shape=(16, 32, 32))
        obj.registerer.instance_scales = (4, 2)

        rng = np.random.default_rng(1)
        img = image_from_array(rng.uniform(0, 900, (16, 32, 32)).astype(np.float32))

        fc, tc = obj.segment(img)
        assert fc.data.shape == img.data.shape
        assert 0.0 <= float(jnp.min(fc.data)) and float(jnp.max(fc.data)) <= 1.0

        phi = obj.register(img)
        assert isinstance(phi, DisplacementField)
        warped = resample_image(fc, obj.atlas_image, displacement=phi)
        assert warped.data.shape == obj.atlas_image.data.shape


class TestOfflineFacade:
    """atlas_path='phantom' / models_path='phantom': the flagship facade must
    construct in zero-egress environments (round-3 verdict #8; the reference
    facade hard-requires its release downloads, analysis_object.py:41)."""

    def test_offline_constructs_and_loads(self, monkeypatch, tmp_path):
        monkeypatch.setenv("HOME", str(tmp_path))  # isolate the phantom cache
        monkeypatch.delenv("OAI_TPU_DATA_DIR", raising=False)
        from oai_analysis_2_tpu.analysis_object import AnalysisObject

        obj = AnalysisObject.offline(
            atlas_shape="phantom:24,48,48", batch_size=1, compute_dtype="float32"
        )
        assert obj.atlas_image.data.shape == (24, 48, 48)
        obj.segmenter.pred_setup()  # loads the cached threshold checkpoint
        assert obj.segmenter.epoch == 600
        assert obj.segmenter.patch_size == (128, 128, 32)  # production topology

        # the bundled atlas is deterministic (seeded) — two constructions agree
        obj2 = AnalysisObject.offline(atlas_shape="phantom:24,48,48", batch_size=1)
        np.testing.assert_array_equal(
            np.asarray(obj.atlas_image.data), np.asarray(obj2.atlas_image.data)
        )

    def test_default_phantom_uses_reference_atlas_grid(self, monkeypatch, tmp_path):
        from oai_analysis_2_tpu import analysis_object as ao

        captured = {}
        real_phantom = ao._phantom_atlas

        def fake_phantom(shape):
            captured["shape"] = shape
            return real_phantom((8, 16, 16))

        monkeypatch.setattr(ao, "_phantom_atlas", fake_phantom)
        monkeypatch.setenv("HOME", str(tmp_path))
        ao.AnalysisObject(models_path="phantom", atlas_path="phantom")
        assert captured["shape"] == (160, 384, 384)  # FullDemo cell 7 grid

    def test_download_failure_hints_phantom(self, monkeypatch):
        from oai_analysis_2_tpu import analysis_object as ao
        from oai_analysis_2_tpu.utils import data as data_mod

        def boom():
            raise OSError("no egress")

        monkeypatch.setattr(data_mod, "models_dir", boom)
        with pytest.raises(RuntimeError, match="phantom"):
            ao.AnalysisObject()

    def test_bad_phantom_spec_raises(self, monkeypatch, tmp_path):
        monkeypatch.setenv("HOME", str(tmp_path))
        from oai_analysis_2_tpu.analysis_object import AnalysisObject

        with pytest.raises(ValueError, match="phantom"):
            AnalysisObject(models_path="phantom", atlas_path="phantom:1,2")
