"""Minimal zarr v2 volume reader — local, HTTP(S), and S3 stores.

Replaces the reference's xarray/zarr ingestion path (dask_processing.py:29-43,
DaskComputationCoiled cell 3 reads s3://… zarr volumes into ITK images): a
dependency-free reader for zarr v2 stores with raw/zlib/gzip/blosc
compressors (blosc — zarr's default and the OAI S3 store's — via the
pure-Python codec in utils/blosc.py), returning an Image whose metadata comes
from sidecar attrs (`.zattrs` keys origin/spacing/direction when present,
identity otherwise).

Store backends (utils/stores.py): posix directories, `http(s)://` bases,
and `s3://bucket/prefix` (anonymous or SigV4-signed from the standard AWS
env credentials) — remote chunks fetch in parallel with bounded retries.
"""

from __future__ import annotations

import json
import zlib
from pathlib import Path

import numpy as np

from oai_analysis_2_tpu.core.image import Image, image_from_array
from oai_analysis_2_tpu.utils.stores import open_store


def _decompress(buf: bytes, compressor) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    if cid in ("zlib", "gzip"):
        return zlib.decompress(buf, zlib.MAX_WBITS | 32 if cid == "gzip" else zlib.MAX_WBITS)
    if cid == "blosc":
        from oai_analysis_2_tpu.utils.blosc import blosc_decompress

        return blosc_decompress(buf)
    raise NotImplementedError(f"unsupported zarr compressor: {cid}")


def read_zarr_volume(path, array_name: str = "image") -> Image:
    """Read a 3D zarr v2 array into an Image ([z,y,x]).

    `path` may be a posix directory, an `http(s)://` URL, or an
    `s3://bucket/prefix` URL (utils/stores.py dispatches); the array lives
    either under `array_name/` or at the store root."""
    store = open_store(path)
    prefix = f"{array_name}/"
    meta_buf = store.get(prefix + ".zarray")
    if meta_buf is None:
        prefix = ""
        meta_buf = store.get(".zarray")
    if meta_buf is None:
        raise FileNotFoundError(f"no .zarray under {path!r} (or {array_name}/)")
    meta = json.loads(meta_buf)
    if len(meta["shape"]) != 3:
        raise ValueError(f"expected 3D array, got shape {meta['shape']}")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    fill = meta.get("fill_value", 0) or 0
    sep = meta.get("dimension_separator", ".")

    grid = [int(np.ceil(s / c)) for s, c in zip(shape, chunks)]
    coords = [
        (iz, iy, ix)
        for iz in range(grid[0])
        for iy in range(grid[1])
        for ix in range(grid[2])
    ]
    # one batched fetch: remote stores pull chunks in parallel (stores.py)
    bufs = store.getmany([prefix + sep.join(map(str, c)) for c in coords])

    out = np.full(shape, fill, dtype)
    for (iz, iy, ix) in coords:
        buf = bufs[prefix + sep.join(map(str, (iz, iy, ix)))]
        if buf is None:  # absent chunk = fill_value
            continue
        raw = _decompress(buf, meta.get("compressor"))
        chunk = np.frombuffer(raw, dtype).reshape(chunks)
        z0, y0, x0 = iz * chunks[0], iy * chunks[1], ix * chunks[2]
        z1, y1, x1 = (
            min(z0 + chunks[0], shape[0]),
            min(y0 + chunks[1], shape[1]),
            min(x0 + chunks[2], shape[2]),
        )
        out[z0:z1, y0:y1, x0:x1] = chunk[: z1 - z0, : y1 - y0, : x1 - x0]

    attrs = {}
    attr_buf = store.get(prefix + ".zattrs")
    if attr_buf is not None:
        attrs = json.loads(attr_buf)
    return image_from_array(
        out.astype(np.float32),
        origin=attrs.get("origin", (0.0, 0.0, 0.0)),
        spacing=attrs.get("spacing", (1.0, 1.0, 1.0)),
        direction=np.asarray(attrs["direction"], np.float32).reshape(3, 3)
        if "direction" in attrs
        else None,
    )


def write_zarr_volume(image: Image, path, array_name: str = "image", chunk=(32, 128, 128)):
    """Write an Image as a zlib-compressed zarr v2 directory store."""
    root = Path(path) / array_name
    root.mkdir(parents=True, exist_ok=True)
    data = np.asarray(image.data, np.float32)
    shape = data.shape
    chunks = tuple(min(c, s) for c, s in zip(chunk, shape))
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": "<f4",
        "compressor": {"id": "zlib", "level": 4},
        "fill_value": 0.0,
        "order": "C",
        "filters": None,
    }
    (root / ".zarray").write_text(json.dumps(meta))
    (root / ".zattrs").write_text(
        json.dumps(
            {
                "origin": np.asarray(image.origin).tolist(),
                "spacing": np.asarray(image.spacing).tolist(),
                "direction": np.asarray(image.direction).reshape(-1).tolist(),
            }
        )
    )
    grid = [int(np.ceil(s / c)) for s, c in zip(shape, chunks)]
    for iz in range(grid[0]):
        for iy in range(grid[1]):
            for ix in range(grid[2]):
                z0, y0, x0 = iz * chunks[0], iy * chunks[1], ix * chunks[2]
                block = np.zeros(chunks, np.float32)
                part = data[z0 : z0 + chunks[0], y0 : y0 + chunks[1], x0 : x0 + chunks[2]]
                block[: part.shape[0], : part.shape[1], : part.shape[2]] = part
                (root / ".".join(map(str, (iz, iy, ix)))).write_bytes(
                    zlib.compress(block.tobytes(), 4)
                )
