"""Pure-Python blosc1 codec tests: LZ4 block decode against hand-built
vectors, shuffle inverses, chunk roundtrips, and blosc-compressed zarr."""

import struct

import numpy as np
import pytest

from oai_analysis_2_tpu.utils.blosc import (
    _shuffle,
    _unshuffle,
    blosc_compress,
    blosc_decompress,
    lz4_compress_block,
    lz4_decompress_block,
)


class TestLZ4:
    def test_all_literals_roundtrip(self):
        data = bytes(range(256)) * 5
        assert lz4_decompress_block(lz4_compress_block(data), len(data)) == data

    def test_hand_built_match_sequence(self):
        """token: 4 literals 'abcd', then a match offset 4 length 12 ->
        'abcd' * 4; final sequence: 2 literals 'XY'."""
        stream = bytes([0x48]) + b"abcd" + struct.pack("<H", 4)  # matchlen 8+4=12
        stream += bytes([0x20]) + b"XY"
        out = lz4_decompress_block(stream, 4 + 12 + 2)
        assert out == b"abcd" * 4 + b"XY"

    def test_overlapping_match(self):
        """RLE via offset 1: 1 literal 'z' then match offset 1 len 19."""
        stream = bytes([0x1F]) + b"z" + struct.pack("<H", 1) + bytes([0])
        out = lz4_decompress_block(stream, 20)
        assert out == b"z" * 20

    def test_extended_lengths(self):
        data = b"A" * 300  # literal length needs 15 + 255 + 30 extension
        comp = lz4_compress_block(data)
        assert lz4_decompress_block(comp, 300) == data

    def test_corrupt_offset_raises(self):
        stream = bytes([0x10]) + b"a" + struct.pack("<H", 9) + bytes([0])
        with pytest.raises(ValueError):
            lz4_decompress_block(stream, 100)


class TestShuffle:
    @pytest.mark.parametrize("typesize,n", [(4, 64), (8, 120), (4, 66), (2, 7)])
    def test_shuffle_inverse(self, typesize, n):
        rng = np.random.default_rng(0)
        buf = rng.integers(0, 256, n, np.uint8).tobytes()
        assert _unshuffle(_shuffle(buf, typesize), typesize) == buf

    def test_shuffle_layout(self):
        # items (a0 a1)(b0 b1) -> planes (a0 b0)(a1 b1)
        assert _shuffle(bytes([1, 2, 3, 4]), 2) == bytes([1, 3, 2, 4])


class TestChunkRoundtrip:
    @pytest.mark.parametrize("shuffle", [True, False])
    @pytest.mark.parametrize("typesize", [1, 4, 8])
    def test_roundtrip(self, shuffle, typesize):
        rng = np.random.default_rng(1)
        data = (rng.normal(size=5000).astype(np.float64)).tobytes()
        chunk = blosc_compress(data, typesize=typesize, shuffle=shuffle)
        assert blosc_decompress(chunk) == data

    def test_multiblock_with_leftover(self):
        data = np.arange(10000, dtype=np.float32).tobytes()  # 40000 B
        chunk = blosc_compress(data, typesize=4, blocksize=16384)  # 3 blocks
        assert blosc_decompress(chunk) == data

    def test_incompressible_falls_back_to_memcpy(self):
        rng = np.random.default_rng(2)
        data = rng.integers(0, 256, 1000, np.uint8).tobytes()
        chunk = blosc_compress(data, typesize=1, shuffle=False)
        assert chunk[2] & 0x2  # memcpy flag
        assert blosc_decompress(chunk) == data

    def test_split_stream_layout_decodes(self):
        """A hand-built SPLIT chunk (typesize streams per block, like
        c-blosc's lz4 path) must decode via the adaptive stream detection."""
        items = 64
        data = np.arange(items, dtype=np.float32).tobytes()  # 256 B
        typesize, nbytes = 4, len(data)
        shuffled = _shuffle(data, typesize)
        neblock = nbytes // typesize
        streams = b""
        for s in range(typesize):  # each shuffled byte-plane as one stream
            plane = shuffled[s * neblock : (s + 1) * neblock]
            comp = lz4_compress_block(plane)
            if len(comp) >= neblock:
                streams += struct.pack("<i", neblock) + plane
            else:
                streams += struct.pack("<i", len(comp)) + comp
        flags = (1 << 5) | 0x1  # lz4 codec, byte-shuffle
        header = struct.pack(
            "<BBBBIII", 1, 1, flags, typesize, nbytes, nbytes, 16 + 4 + len(streams)
        )
        chunk = header + struct.pack("<I", 20) + streams
        assert blosc_decompress(chunk) == data

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            blosc_decompress(b"\x00" * 8)


class TestZarrBlosc:
    def test_blosc_zarr_volume_loads(self, tmp_path):
        """A blosc-compressed zarr v2 store (the reference cohort's format)
        loads through read_zarr_volume."""
        import json

        from oai_analysis_2_tpu.utils.zarr_io import read_zarr_volume

        rng = np.random.default_rng(3)
        vol = rng.uniform(0, 1, (8, 16, 16)).astype(np.float32)
        root = tmp_path / "case.zarr" / "image"
        root.mkdir(parents=True)
        chunks = (4, 16, 16)
        (root / ".zarray").write_text(
            json.dumps(
                {
                    "zarr_format": 2,
                    "shape": list(vol.shape),
                    "chunks": list(chunks),
                    "dtype": "<f4",
                    "compressor": {
                        "id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 1,
                    },
                    "fill_value": 0.0,
                    "order": "C",
                    "filters": None,
                }
            )
        )
        (root / ".zattrs").write_text(json.dumps({"spacing": [0.7, 0.36, 0.36]}))
        for iz in range(2):
            block = vol[iz * 4 : (iz + 1) * 4]
            (root / f"{iz}.0.0").write_bytes(
                blosc_compress(block.tobytes(), typesize=4)
            )
        img = read_zarr_volume(tmp_path / "case.zarr")
        np.testing.assert_allclose(np.asarray(img.data), vol, atol=1e-7)
        np.testing.assert_allclose(np.asarray(img.spacing), [0.7, 0.36, 0.36])
