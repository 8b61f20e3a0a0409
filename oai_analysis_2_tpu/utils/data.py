"""sha256-pinned artifact fetcher + data directory layout.

Replaces pooch (reference oai_analysis/data.py:8-49): a small pure-Python
registry of release tarballs with sha256 verification, lazy download with
retries, and tar extraction into the package data directory. Offline
environments can pre-seed `data_dir` (env OAI_TPU_DATA_DIR) with the
extracted trees; the fetchers then never touch the network.
"""

from __future__ import annotations

import hashlib
import os
import tarfile
import time
import urllib.request
from pathlib import Path

_GITHUB_RELEASE_TAG = "v2.0.0"
_BASE_URL = (
    "https://github.com/uncbiag/OAI_analysis_2/releases/download/"
    f"{_GITHUB_RELEASE_TAG}/"
)

# Same artifacts (and pins) the reference publishes (data.py:8-22).
REGISTRY = {
    "oai-analysis-test-data.tar.gz": (
        "bfb5d5f17ff0886f5815c79fba119fc4294c35b8f9fcd586a171d9310cd90cdf",
        "test_data",
    ),
    "oai-analysis-atlases.tar.gz": (
        "9332f6756efcc6f525a8cf1807cfe793405181047f850d68fd962ad8e5ac1d7a",
        "atlases",
    ),
    "oai-analysis-models.tar.gz": (
        "ffd081ba26f9908f17790ecdb8b1d025bff32ccbdced9bf55158166561064458",
        "models",
    ),
}


def data_dir() -> Path:
    d = os.environ.get("OAI_TPU_DATA_DIR")
    if d:
        p = Path(d)
    else:
        p = Path(__file__).resolve().parent.parent / "data"
    p.mkdir(parents=True, exist_ok=True)
    return p


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(name: str, retries: int = 5) -> Path:
    """Download-and-extract one registry artifact; returns the extracted dir.
    If the extraction directory already exists (pre-seeded), returns it
    without touching the network."""
    sha, extract_dir = REGISTRY[name]
    root = data_dir()
    out = root / extract_dir
    if out.exists() and any(out.iterdir()):
        return out

    tarball = root / name
    if not (tarball.exists() and _sha256(tarball) == sha):
        url = _BASE_URL + name
        last = None
        for attempt in range(retries):
            try:
                urllib.request.urlretrieve(url, tarball)
                break
            except Exception as e:  # noqa: BLE001
                last = e
                time.sleep(min(2**attempt, 30))
        else:
            raise RuntimeError(
                f"could not download {url} ({last}); pre-seed {out} to run offline"
            )
        got = _sha256(tarball)
        if got != sha:
            tarball.unlink(missing_ok=True)
            raise RuntimeError(f"sha256 mismatch for {name}: {got} != {sha}")

    out.mkdir(parents=True, exist_ok=True)
    with tarfile.open(tarball) as tf:
        tf.extractall(out, filter="data")
    return out


def test_data_dir() -> Path:
    """reference data.py:24-31"""
    return fetch("oai-analysis-test-data.tar.gz")


def atlases_dir() -> Path:
    """reference data.py:33-40"""
    return fetch("oai-analysis-atlases.tar.gz")


def models_dir() -> Path:
    """reference data.py:42-49"""
    return fetch("oai-analysis-models.tar.gz")
