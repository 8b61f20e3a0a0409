"""Remote zarr stores: HTTP(S) + S3 (utils/stores.py, utils/zarr_io.py).

The reference cohort reads `s3://…` zarr volumes directly
(reference dask_processing.py:32-36; DaskComputationCoiled cell 3). These
tests stand up a real HTTP server over a real zarr v2 directory store —
no network egress — and read it through the same `read_zarr_volume` entry
the cohort uses, including the S3 REST mapping and SigV4 signing.
"""

import datetime
import http.server
import threading

import numpy as np
import pytest

from oai_analysis_2_tpu.core.image import image_from_array
from oai_analysis_2_tpu.utils.stores import (
    DirectoryStore,
    HTTPStore,
    SigV4Signer,
    _s3_store,
    open_store,
)
from oai_analysis_2_tpu.utils.zarr_io import read_zarr_volume, write_zarr_volume


def _make_volume(tmp_path, name="vol.zarr"):
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 1, (20, 33, 17)).astype(np.float32)
    img = image_from_array(data, origin=(1.0, 2.0, 3.0), spacing=(0.5, 0.6, 0.7))
    write_zarr_volume(img, tmp_path / name, chunk=(8, 16, 16))
    return img


class _Server:
    """Local HTTP file server over a directory, with optional fault/header
    hooks (runs in a daemon thread; no egress)."""

    def __init__(self, root, fail_first=False, capture=None):
        failed = set()

        class Handler(http.server.SimpleHTTPRequestHandler):
            def __init__(self, *a, **kw):
                super().__init__(*a, directory=str(root), **kw)

            def do_GET(self):  # noqa: N802 — http.server API
                if capture is not None:
                    capture.append(dict(self.headers))
                if fail_first and self.path not in failed:
                    failed.add(self.path)
                    self.send_error(500, "transient")
                    return
                super().do_GET()

            def log_message(self, *a):  # quiet
                pass

        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def served(tmp_path):
    img = _make_volume(tmp_path)
    srv = _Server(tmp_path)
    yield srv, img, tmp_path
    srv.close()


class TestDirectoryStore:
    def test_roundtrip_through_open_store(self, tmp_path):
        img = _make_volume(tmp_path)
        store = open_store(tmp_path / "vol.zarr")
        assert isinstance(store, DirectoryStore)
        back = read_zarr_volume(tmp_path / "vol.zarr")
        np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data), atol=1e-6)
        np.testing.assert_allclose(back.spacing, img.spacing)


class TestHTTPStore:
    def test_reads_zarr_over_http(self, served):
        srv, img, _ = served
        back = read_zarr_volume(f"{srv.url}/vol.zarr")
        np.testing.assert_allclose(np.asarray(back.data), np.asarray(img.data), atol=1e-6)
        np.testing.assert_allclose(back.origin, img.origin)

    def test_missing_chunk_reads_as_fill(self, served):
        srv, img, tmp_path = served
        chunks = sorted(
            p for p in (tmp_path / "vol.zarr" / "image").iterdir() if p.name[0].isdigit()
        )
        chunks[0].unlink()  # drop chunk 0.0.0
        back = read_zarr_volume(f"{srv.url}/vol.zarr")
        assert float(np.abs(np.asarray(back.data)[:8, :16, :16]).max()) == 0.0
        # the rest is intact
        np.testing.assert_allclose(
            np.asarray(back.data)[8:], np.asarray(img.data)[8:], atol=1e-6
        )

    def test_missing_store_raises(self, served):
        srv, _, _ = served
        with pytest.raises(FileNotFoundError):
            read_zarr_volume(f"{srv.url}/nope.zarr")

    def test_retries_transient_500(self, tmp_path):
        img = _make_volume(tmp_path)
        srv = _Server(tmp_path, fail_first=True)  # every path 500s once
        try:
            back = read_zarr_volume(f"{srv.url}/vol.zarr")
            np.testing.assert_allclose(
                np.asarray(back.data), np.asarray(img.data), atol=1e-6
            )
        finally:
            srv.close()

    def test_exhausted_retries_raise(self, tmp_path):
        store = HTTPStore("http://127.0.0.1:1", retries=2)  # nothing listens
        with pytest.raises(IOError):
            store.get(".zarray")


class TestS3Store:
    def test_virtual_host_url_mapping(self, monkeypatch):
        monkeypatch.delenv("OAI_TPU_S3_ENDPOINT", raising=False)
        monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
        monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
        monkeypatch.setenv("AWS_REGION", "us-west-2")
        store = _s3_store("s3://oai-bucket/knees/case1.zarr")
        assert store.base_url == (
            "https://oai-bucket.s3.us-west-2.amazonaws.com/knees/case1.zarr"
        )
        assert store.signer is None  # anonymous without credentials

    def test_reads_via_endpoint_override(self, tmp_path, monkeypatch):
        # path-style local S3 emulation: {endpoint}/{bucket}/{prefix}/{key}
        bucket = tmp_path / "oai-bucket"
        bucket.mkdir()
        img = _make_volume(bucket)
        srv = _Server(tmp_path)
        monkeypatch.setenv("OAI_TPU_S3_ENDPOINT", srv.url)
        monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
        monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
        try:
            back = read_zarr_volume("s3://oai-bucket/vol.zarr")
            np.testing.assert_allclose(
                np.asarray(back.data), np.asarray(img.data), atol=1e-6
            )
        finally:
            srv.close()

    def test_sigv4_headers_sent_with_credentials(self, tmp_path, monkeypatch):
        bucket = tmp_path / "priv"
        bucket.mkdir()
        _make_volume(bucket)
        captured = []
        srv = _Server(tmp_path, capture=captured)
        monkeypatch.setenv("OAI_TPU_S3_ENDPOINT", srv.url)
        monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIDEXAMPLE")
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "secret")
        monkeypatch.setenv("AWS_SESSION_TOKEN", "tok")
        monkeypatch.setenv("AWS_REGION", "us-east-1")
        try:
            read_zarr_volume("s3://priv/vol.zarr")
        finally:
            srv.close()
        assert captured
        h = {k.lower(): v for k, v in captured[0].items()}  # urllib title-cases
        auth = h.get("authorization", "")
        assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")
        assert "/us-east-1/s3/aws4_request" in auth
        assert "SignedHeaders=host;x-amz-content-sha256;x-amz-date;x-amz-security-token" in auth
        sig = auth.rsplit("Signature=", 1)[1]
        assert len(sig) == 64 and all(c in "0123456789abcdef" for c in sig)
        assert h["x-amz-security-token"] == "tok"
        assert "x-amz-date" in h and "x-amz-content-sha256" in h

    def test_sigv4_is_deterministic(self):
        signer = SigV4Signer("AK", "SK", "eu-west-1")
        t = datetime.datetime(2026, 8, 19, 12, 0, 0, tzinfo=datetime.timezone.utc)
        h1 = signer("https://b.s3.eu-west-1.amazonaws.com/k/.zarray", now=t)
        h2 = signer("https://b.s3.eu-west-1.amazonaws.com/k/.zarray", now=t)
        assert h1 == h2
        h3 = signer("https://b.s3.eu-west-1.amazonaws.com/k/.zattrs", now=t)
        assert h3["Authorization"] != h1["Authorization"]  # path is signed
