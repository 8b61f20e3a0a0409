"""Partition/assemble parity tests against a numpy oracle that transcribes the
reference semantics (image_transforms.py:371-519)."""

import numpy as np

import jax

from oai_analysis_2_tpu.ops.tiling import Partition


def _oracle_partition(volume, tile_size_xyz, overlap_xyz, mode="reflect"):
    """Reference behavior, written independently in plain numpy."""
    tile = np.flipud(np.asarray(tile_size_xyz))
    ov = np.flipud(np.asarray(overlap_xyz))
    eff = tile - 2 * ov
    shape = np.asarray(volume.shape)
    grid = np.ceil(shape / eff).astype(int)
    padded_total = eff * grid + 2 * ov
    pad = padded_total - shape
    padded = np.pad(
        volume,
        [(ov[a], pad[a] - ov[a]) for a in range(3)],
        mode=mode,
    )
    tiles = []
    for i in range(grid[0]):
        for j in range(grid[1]):
            for k in range(grid[2]):
                tiles.append(
                    padded[
                        i * eff[0] : i * eff[0] + tile[0],
                        j * eff[1] : j * eff[1] + tile[1],
                        k * eff[2] : k * eff[2] + tile[2],
                    ]
                )
    return np.stack(tiles, 0)


def _oracle_assemble(tiles, image_shape, tile_size_xyz, overlap_xyz, crop_size_xyz=None):
    tile = np.flipud(np.asarray(tile_size_xyz))
    ov = np.flipud(np.asarray(overlap_xyz))
    eff = tile - 2 * ov
    shape = np.asarray(image_shape)
    grid = np.ceil(shape / eff).astype(int)
    out = np.zeros(eff * grid, dtype=tiles.dtype)
    for i in range(grid[0]):
        for j in range(grid[1]):
            for k in range(grid[2]):
                ind = i * grid[1] * grid[2] + j * grid[2] + k
                out[
                    i * eff[0] : (i + 1) * eff[0],
                    j * eff[1] : (j + 1) * eff[1],
                    k * eff[2] : (k + 1) * eff[2],
                ] = tiles[ind][
                    ov[0] : tile[0] - ov[0],
                    ov[1] : tile[1] - ov[1],
                    ov[2] : tile[2] - ov[2],
                ]
    out = out[: shape[0], : shape[1], : shape[2]]
    if crop_size_xyz is not None:
        c = crop_size_xyz
        cropped = np.zeros_like(out)
        cropped[c[2] : -c[2], c[0] : -c[0], c[1] : -c[1]] = out[
            c[2] : -c[2], c[0] : -c[0], c[1] : -c[1]
        ]
        out = cropped
    return out


TILE = (32, 24, 16)  # x, y, z
OVERLAP = (4, 6, 2)  # x, y, z


class TestPartition:
    def test_partition_matches_oracle(self):
        rng = np.random.default_rng(0)
        vol = rng.standard_normal((37, 61, 83)).astype(np.float32)  # z,y,x
        p = Partition(TILE, OVERLAP)
        got = np.asarray(p(vol))
        expect = _oracle_partition(vol, TILE, OVERLAP)
        assert got.shape == expect.shape
        np.testing.assert_array_equal(got, expect)

    def test_assemble_matches_oracle(self):
        rng = np.random.default_rng(1)
        vol_shape = (37, 61, 83)
        p = Partition(TILE, OVERLAP)
        n = p.num_tiles(vol_shape)
        tiles = rng.standard_normal((n,) + p.tile_size).astype(np.float32)
        got = np.asarray(p.assemble(tiles, vol_shape, crop_size=(4, 6, 2)))
        expect = _oracle_assemble(tiles, vol_shape, TILE, OVERLAP, crop_size_xyz=(4, 6, 2))
        np.testing.assert_array_equal(got, expect)

    def test_roundtrip_identity_inside_margin(self):
        """partition -> assemble must reproduce the volume away from the
        zeroed boundary margin."""
        rng = np.random.default_rng(2)
        vol = rng.standard_normal((40, 50, 45)).astype(np.float32)
        p = Partition(TILE, OVERLAP)
        tiles = p(vol)
        out = np.asarray(p.assemble(tiles, vol.shape))
        np.testing.assert_allclose(out, vol, atol=1e-6)

    def test_oai_configuration(self):
        """The shipped pipeline config: patch (128,128,32), overlap (16,16,8)."""
        rng = np.random.default_rng(3)
        vol = rng.standard_normal((120, 250, 250)).astype(np.float32)
        p = Partition((128, 128, 32), (16, 16, 8))
        tiles = p(vol)
        assert tiles.shape[1:] == (32, 128, 128)  # zyx tile
        assert p.effective_size == (16, 96, 96)
        out = np.asarray(p.assemble(tiles, vol.shape, crop_size=(16, 16, 8)))
        # margin is zero with the axis quirk: z margin 8, y margin 16, x margin 16
        assert np.all(out[:8] == 0) and np.all(out[-8:] == 0)
        assert np.all(out[:, :16] == 0) and np.all(out[:, -16:] == 0)
        assert np.all(out[:, :, :16] == 0) and np.all(out[:, :, -16:] == 0)
        np.testing.assert_allclose(out[8:-8, 16:-16, 16:-16], vol[8:-8, 16:-16, 16:-16], atol=1e-6)

    def test_jit_compatible(self):
        p = Partition((16, 16, 8), (2, 2, 1))
        vol = np.ones((10, 20, 20), np.float32)

        @jax.jit
        def roundtrip(v):
            return p.assemble(p(v), v.shape)

        out = np.asarray(roundtrip(vol))
        np.testing.assert_allclose(out, vol, atol=1e-6)


def _oracle_assemble_vote(tiles, image_shape, tile_size_xyz, overlap_xyz, n_classes):
    """Reference is_vote=True behavior (image_transforms.py:468-490), written
    independently: full-tile-extent votes on the padded grid, argmax, crop."""
    tile = np.flipud(np.asarray(tile_size_xyz))
    ov = np.flipud(np.asarray(overlap_xyz))
    eff = tile - 2 * ov
    shape = np.asarray(image_shape)
    grid = np.ceil(shape / eff).astype(int)
    votes = np.zeros((n_classes, *(eff * grid + 2 * ov)), int)
    idx = 0
    for i in range(grid[0]):
        for j in range(grid[1]):
            for k in range(grid[2]):
                for label in range(n_classes):
                    zz, yy, xx = np.where(tiles[idx] == label)
                    votes[label][zz + i * eff[0], yy + j * eff[1], xx + k * eff[2]] += 1
                idx += 1
    seg = np.argmax(votes, axis=0)
    return seg[
        ov[0] : ov[0] + shape[0], ov[1] : ov[1] + shape[1], ov[2] : ov[2] + shape[2]
    ]


class TestVoteAssemble:
    def test_vote_matches_oracle(self):
        rng = np.random.default_rng(0)
        image_shape = (10, 21, 17)
        tile_xyz, ov_xyz = (12, 14, 8), (2, 3, 1)
        part = Partition(tile_xyz, ov_xyz)
        n = part.num_tiles(image_shape)
        tz, ty, tx = part.tile_size
        tiles = rng.integers(0, 3, (n, tz, ty, tx)).astype(np.float32)
        got = np.asarray(part.assemble_vote(jax.numpy.asarray(tiles), image_shape, 3))
        expect = _oracle_assemble_vote(tiles, image_shape, tile_xyz, ov_xyz, 3)
        np.testing.assert_array_equal(got, expect)

    def test_vote_agrees_with_mean_on_consistent_tiles(self):
        """When every tile carries the same labels, vote == central assembly."""
        image_shape = (8, 16, 16)
        part = Partition((12, 12, 8), (2, 2, 2))
        vol = (np.arange(np.prod(image_shape)).reshape(image_shape) % 2).astype(np.float32)
        tiles = part(jax.numpy.asarray(vol))
        voted = np.asarray(part.assemble_vote(tiles, image_shape, 2))
        direct = np.asarray(part.assemble(tiles, image_shape))
        np.testing.assert_array_equal(voted, direct.astype(np.int32))

    def test_vote_crop_quirk(self):
        image_shape = (8, 16, 16)
        part = Partition((12, 12, 8), (2, 2, 2))
        tiles = jax.numpy.ones((part.num_tiles(image_shape), *part.tile_size))
        seg = np.asarray(part.assemble_vote(tiles, image_shape, 2, crop_size=(2, 3, 1)))
        # (cx, cy, cz)=(2,3,1) -> margins (cz, cx, cy)=(1,2,3) on (z,y,x)
        assert seg[0].max() == 0 and seg[-1].max() == 0
        assert seg[:, :2].max() == 0 and seg[:, -2:].max() == 0
        assert seg[:, :, :3].max() == 0 and seg[:, :, -3:].max() == 0
        assert seg[1:-1, 2:-2, 3:-3].min() == 1
