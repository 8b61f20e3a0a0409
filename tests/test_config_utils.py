"""ParameterDict config system + checkpoint format + NIfTI qform tests."""

import gzip
import json
import struct

import numpy as np

from oai_analysis_2_tpu.utils.config import ParameterDict, load_json_to_dict


class TestParameterDict:
    def test_tuple_access_records_default_and_comment(self):
        p = ParameterDict()
        v = p[("batch_size", 4, "patches per forward pass")]
        assert v == 4
        assert p.com["batch_size"] == "patches per forward pass"
        # second access returns the recorded value
        assert p[("batch_size", 99, "ignored")] == 4

    def test_external_overrides_default(self):
        p = ParameterDict({"lr": 0.1})
        assert p[("lr", 0.5, "learning rate")] == 0.1

    def test_categories_and_json_roundtrip(self, tmp_path):
        p = ParameterDict()
        seg = p.new_category("segmentation", "segmentation settings")
        seg[("patch_size", [128, 128, 32], "xyz patch")]
        p[("device", "tpu", "execution device")]
        p.write_JSON(tmp_path / "cfg.json")
        p.write_JSON_comments(tmp_path / "cfg_comments.json")

        q = ParameterDict().load_JSON(tmp_path / "cfg.json")
        assert q["device"] == "tpu"
        assert q["segmentation"][("patch_size", None, "")] == [128, 128, 32]
        comments = json.loads((tmp_path / "cfg_comments.json").read_text())
        assert comments["device"] == "execution device"

    def test_load_json_to_dict(self, tmp_path):
        (tmp_path / "c.json").write_text(json.dumps({"model": "UNet"}))
        assert load_json_to_dict(tmp_path / "c.json") == {"model": "UNet"}


class TestNiftiQform:
    def test_qform_only_file(self, tmp_path):
        """Hand-built header with qform (no sform): identity quaternion +
        offset; ITK-style LPS conversion flips x/y."""
        from oai_analysis_2_tpu.core.nifti import read_nifti

        nx, ny, nz = 4, 3, 2
        hdr = bytearray(348)
        struct.pack_into("<i", hdr, 0, 348)
        struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
        struct.pack_into("<2h", hdr, 70, 16, 32)  # float32
        struct.pack_into("<8f", hdr, 76, 1.0, 1.5, 2.0, 2.5, 1.0, 1.0, 1.0, 1.0)
        struct.pack_into("<f", hdr, 108, 352.0)
        struct.pack_into("<2h", hdr, 252, 1, 0)  # qform only
        struct.pack_into("<3f", hdr, 256, 0.0, 0.0, 0.0)  # identity quaternion
        struct.pack_into("<3f", hdr, 268, 10.0, -20.0, 30.0)  # qoffset RAS
        hdr[344:348] = b"n+1\x00"
        data = np.arange(nx * ny * nz, dtype=np.float32)
        (tmp_path / "q.nii").write_bytes(bytes(hdr) + b"\x00" * 4 + data.tobytes())

        img = read_nifti(tmp_path / "q.nii")
        assert img.data.shape == (nz, ny, nx)
        np.testing.assert_allclose(np.asarray(img.spacing), [1.5, 2.0, 2.5], atol=1e-5)
        # RAS offset (10, -20, 30) -> LPS origin (-10, 20, 30)
        np.testing.assert_allclose(np.asarray(img.origin), [-10.0, 20.0, 30.0], atol=1e-5)
