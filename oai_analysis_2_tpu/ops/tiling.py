"""Overlap-tile partition / assembly for patch-wise 3D inference.

TPU-first reimplementation of the reference's `Partition` class
(oai_analysis/segmentation/image_transforms.py:371-519): the volume is
reflect-padded to a static grid of overlapping tiles, the network runs
batched over tiles, and each tile's central "effective" region is scattered
back. Here both directions are single fused XLA ops (one gather / one
reshape-transpose) instead of Python triple loops, so the whole
partition -> UNet -> assemble pipeline stays inside one `jit`.

Semantics preserved exactly (validated against a numpy oracle in
tests/test_tiling.py):
  * sizes are given in x,y,z order and flipped to z,y,x internally
    (reference image_transforms.py:389-391);
  * effective = tile - 2*overlap; grid = ceil(image / effective);
    pad = overlap before, (padded_total - image - overlap) after
    (image_transforms.py:407-415);
  * tiles are ordered z-major (i,j,k C-order, image_transforms.py:427-434);
  * assembly keeps each tile's central region, crops to the image size, and
    zeroes a boundary margin with the reference's axis quirk: a crop_size
    (cx, cy, cz) in x,y,z order is applied as margins (cz, cx, cy) on the
    (z, y, x) axes (image_transforms.py:509-513 — behavior contract, kept
    bug-for-bug because the shipped models were evaluated under it).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class Partition:
    """Static-shape overlap tiling. Stateless w.r.t. array values; all index
    math happens at trace time so partition/assemble compile into fixed
    gathers/reshapes."""

    def __init__(
        self,
        tile_size: Sequence[int],
        overlap_size: Sequence[int],
        padding_mode: str = "reflect",
    ):
        # Flip x,y,z -> z,y,x to match numpy index order.
        self.tile_size = tuple(int(v) for v in np.flipud(np.asarray(tile_size)))
        self.overlap_size = tuple(int(v) for v in np.flipud(np.asarray(overlap_size)))
        self.padding_mode = padding_mode
        for t, o in zip(self.tile_size, self.overlap_size):
            if t - 2 * o <= 0:
                raise ValueError(f"tile {t} must exceed 2*overlap {o}")

    # -- static geometry --------------------------------------------------------

    def grid_shape(self, image_shape: Tuple[int, int, int]) -> Tuple[int, int, int]:
        eff = self.effective_size
        return tuple(int(np.ceil(s / e)) for s, e in zip(image_shape, eff))

    @property
    def effective_size(self) -> Tuple[int, int, int]:
        return tuple(t - 2 * o for t, o in zip(self.tile_size, self.overlap_size))

    def num_tiles(self, image_shape: Tuple[int, int, int]) -> int:
        return int(np.prod(self.grid_shape(image_shape)))

    # -- forward: volume -> tiles ------------------------------------------------

    def __call__(self, volume: jnp.ndarray) -> jnp.ndarray:
        """Split a (D, H, W) volume into (N, tz, ty, tx) tiles."""
        image_shape = volume.shape
        eff = self.effective_size
        grid = self.grid_shape(image_shape)
        ov = self.overlap_size
        padded_total = tuple(e * g + 2 * o for e, g, o in zip(eff, grid, ov))
        pad_width = tuple(
            (o, pt - s - o) for o, pt, s in zip(ov, padded_total, image_shape)
        )
        padded = jnp.pad(volume, pad_width, mode=self.padding_mode)

        # The tile grid is static at trace time, so extraction is a stack of
        # static slices — contiguous copies XLA handles at memcpy speed
        # (a single big gather measured far slower on TPU).
        tz, ty, tx = self.tile_size
        tiles = []
        for i in range(grid[0]):
            for j in range(grid[1]):
                for k in range(grid[2]):
                    z0, y0, x0 = i * eff[0], j * eff[1], k * eff[2]
                    tiles.append(
                        padded[z0 : z0 + tz, y0 : y0 + ty, x0 : x0 + tx]
                    )
        return jnp.stack(tiles, axis=0)

    # -- inverse: tiles -> volume --------------------------------------------------

    def assemble(
        self,
        tiles: jnp.ndarray,
        image_shape: Tuple[int, int, int],
        crop_size: Optional[Sequence[int]] = None,
    ) -> jnp.ndarray:
        """Reassemble (N, tz, ty, tx) tiles into a (D, H, W) volume."""
        eff = self.effective_size
        grid = self.grid_shape(image_shape)
        ov = self.overlap_size
        tz, ty, tx = self.tile_size

        central = tiles[
            :,
            ov[0] : tz - ov[0],
            ov[1] : ty - ov[1],
            ov[2] : tx - ov[2],
        ].reshape(grid + eff)
        # (gz, gy, gx, ez, ey, ex) -> (gz*ez, gy*ey, gx*ex)
        volume = central.transpose(0, 3, 1, 4, 2, 5).reshape(
            tuple(g * e for g, e in zip(grid, eff))
        )
        volume = volume[: image_shape[0], : image_shape[1], : image_shape[2]]

        if crop_size is not None:
            # Reference margin quirk: (cx, cy, cz) -> margins (cz, cx, cy) on (z, y, x).
            cz, cy_, cx_ = int(crop_size[2]), int(crop_size[0]), int(crop_size[1])
            mask = jnp.zeros(image_shape, dtype=volume.dtype)
            mask = mask.at[cz : image_shape[0] - cz, cy_ : image_shape[1] - cy_, cx_ : image_shape[2] - cx_].set(1)
            volume = volume * mask
        return volume

    def assemble_vote(
        self,
        tiles: jnp.ndarray,
        image_shape: Tuple[int, int, int],
        n_classes: int,
        crop_size: Optional[Sequence[int]] = None,
    ) -> jnp.ndarray:
        """Majority-vote reassembly of integer-label tiles — the reference's
        `assemble(is_vote=True)` (image_transforms.py:468-490): every tile
        votes over its FULL extent at its position on the padded grid (not
        just the central region), the winning class per voxel is the argmax
        (ties to the lowest class, like np.argmax), and the result is cropped
        back to the image window. `n_classes` is static so the whole vote
        runs as one-hot scatter-adds under jit (the reference's version is a
        quadruple Python loop over np.where results).

        N.B. the reference indexes its vote array by label VALUE while sizing
        it by the number of distinct labels (an IndexError for non-contiguous
        labels); here labels are class indices 0..n_classes-1.
        """
        import jax

        eff = self.effective_size
        grid = self.grid_shape(image_shape)
        ov = self.overlap_size
        tz, ty, tx = self.tile_size
        padded_total = tuple(e * g + 2 * o for e, g, o in zip(eff, grid, ov))

        onehot = jax.nn.one_hot(tiles.astype(jnp.int32), n_classes, axis=0, dtype=jnp.int32)
        votes = jnp.zeros((n_classes,) + padded_total, jnp.int32)
        idx = 0
        for i in range(grid[0]):
            for j in range(grid[1]):
                for k in range(grid[2]):
                    z0, y0, x0 = i * eff[0], j * eff[1], k * eff[2]
                    votes = votes.at[:, z0 : z0 + tz, y0 : y0 + ty, x0 : x0 + tx].add(
                        onehot[:, idx]
                    )
                    idx += 1
        seg = jnp.argmax(votes, axis=0).astype(jnp.int32)
        seg = seg[
            ov[0] : ov[0] + image_shape[0],
            ov[1] : ov[1] + image_shape[1],
            ov[2] : ov[2] + image_shape[2],
        ]
        if crop_size is not None:
            cz, cy_, cx_ = int(crop_size[2]), int(crop_size[0]), int(crop_size[1])
            mask = jnp.zeros(image_shape, dtype=seg.dtype)
            mask = mask.at[cz : image_shape[0] - cz, cy_ : image_shape[1] - cy_, cx_ : image_shape[2] - cx_].set(1)
            seg = seg * mask
        return seg
