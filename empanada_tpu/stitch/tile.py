"""2D overlapping tiler for big-image inference (reference
``empanada/inference/tile.py``).

The reference delegates tile geometry to cztile's
AlmostEqualBorderFixedTotalAreaStrategy2D; here the equivalent geometry is
computed directly: fixed tile size, at least ``overlap_width`` overlap, tile
origins spread as evenly as possible so border tiles aren't degenerate.
"""

from __future__ import annotations

import numpy as np

from empanada_tpu.core import merge_rles, rle_voting

__all__ = ["Tiler", "calculate_overlap_rle", "tile_ranges_1d"]


def tile_ranges_1d(length: int, tile: int, min_overlap: int):
    """Positions of fixed-size tiles covering [0, length) with >= min_overlap.

    Returns a list of (start, end) with end - start == tile (or == length when
    the image is smaller than the tile).
    """
    tile = min(tile, length)
    if tile == length:
        return [(0, length)]
    if min_overlap >= tile:
        raise ValueError(
            f"overlap ({min_overlap}) must be smaller than the tile size "
            f"({tile}) — equal/larger overlap cannot advance and would "
            "leave most of the image untiled"
        )
    # minimum tile count such that overlap >= min_overlap:
    # n tiles cover n*tile - (n-1)*overlap >= length with overlap >= min_overlap
    # -> n >= (length - min_overlap) / (tile - min_overlap)
    n = int(np.ceil((length - min_overlap) / (tile - min_overlap)))
    n = max(n, 1)
    # distribute origins evenly from 0 to length - tile
    if n == 1:
        return [(0, tile)]
    step = (length - tile) / (n - 1)
    out = []
    for i in range(n):
        start = int(round(i * step))
        out.append((start, start + tile))
    return out


def calculate_overlap_rle(yranges, xranges, image_shape):
    """Flat RLE of all pixels covered by >= 2 tiles (tile.py:8)."""
    h, w = image_shape
    y = rle_voting(np.unique(np.stack(yranges, axis=0), axis=0), vote_thr=2)
    x = rle_voting(np.unique(np.stack(xranges, axis=0), axis=0), vote_thr=2)

    if len(y) > 0:
        row_starts = y[:, 0] * w
        row_runs = y[:, 1] * w - row_starts
    else:
        row_starts, row_runs = [], []

    if len(x) > 0:
        col_ranges = np.concatenate([x + r * w for r in range(h)], axis=0)
        col_starts = col_ranges[:, 0]
        col_runs = col_ranges[:, 1] - col_starts
    else:
        col_starts, col_runs = [], []

    if len(row_starts) > 0 or len(col_starts) > 0:
        return merge_rles(row_starts, row_runs, col_starts, col_runs)
    return [], []


class Tiler:
    def __init__(self, image_shape, tile_size=2048, overlap_width=128):
        if isinstance(tile_size, int):
            tile_size = (tile_size, tile_size)
        assert isinstance(overlap_width, int)
        assert len(image_shape) == 2, "Tiler only works with 2D images"

        self.image_shape = tuple(image_shape)
        self.tile_size = tile_size
        self.overlap_width = overlap_width

        th = min(tile_size[0], image_shape[0])
        tw = min(tile_size[1], image_shape[1])

        ys = tile_ranges_1d(image_shape[0], th, overlap_width)
        xs = tile_ranges_1d(image_shape[1], tw, overlap_width)

        # row-major tile order
        self.yranges = []
        self.xranges = []
        for y0, y1 in ys:
            for x0, x1 in xs:
                self.yranges.append((y0, y1))
                self.xranges.append((x0, x1))

        self.overlap_rle = calculate_overlap_rle(self.yranges, self.xranges, self.image_shape)

    def __len__(self):
        return len(self.yranges)

    def overlap_mask(self) -> np.ndarray:
        overlap = np.zeros(int(np.prod(self.image_shape)))
        for s, r in zip(self.overlap_rle[0], self.overlap_rle[1]):
            overlap[s : s + r] = 1
        return overlap.reshape(self.image_shape)

    @staticmethod
    def _split_runs_by_row(starts, runs, width):
        """Split flat runs at row boundaries so each run lies in one row.

        The reference translates only run starts (tile.py:122) which corrupts
        runs spanning multiple tile rows; splitting first makes translation
        exact for any instance shape.
        """
        starts = np.asarray(starts, dtype=np.int64)
        runs = np.asarray(runs, dtype=np.int64)
        cols = starts % width
        n_rows = (cols + runs + width - 1) // width  # rows each run touches
        if (n_rows <= 1).all():
            return starts, runs
        total = int(n_rows.sum())
        out_s = np.empty(total, dtype=np.int64)
        out_r = np.empty(total, dtype=np.int64)
        k = 0
        for s, l, c, n in zip(starts, runs, cols, n_rows):
            if n == 1:
                out_s[k], out_r[k] = s, l
                k += 1
                continue
            first = width - c
            out_s[k], out_r[k] = s, first
            k += 1
            pos = s + first
            rem = l - first
            while rem > 0:
                piece = min(width, rem)
                out_s[k], out_r[k] = pos, piece
                k += 1
                pos += piece
                rem -= piece
        return out_s[:k], out_r[:k]

    def translate_rle_seg(self, rle_seg: dict, tile_index: int) -> dict:
        """Shift a tile's boxes and RLE starts into the global frame
        (in-place, tile.py:122)."""
        ys, _ = self.yranges[tile_index]
        xs, xe = self.xranges[tile_index]
        w = xe - xs

        for class_id, labels in rle_seg.items():
            # values are rewritten in place below; drop any attached
            # FlatInstances cache (key-sequence validation alone cannot
            # detect value mutation) so readers rebuild from the dict
            if hasattr(labels, "_flat"):
                labels._flat = None
            for label, attrs in labels.items():
                box = list(attrs["box"])
                box[0] += ys
                box[1] += xs
                box[2] += ys
                box[3] += xs
                attrs["box"] = tuple(box)

                starts, runs = self._split_runs_by_row(attrs["starts"], attrs["runs"], w)
                starts_y = starts // w + ys
                starts_x = starts % w + xs
                attrs["starts"] = np.ravel_multi_index(
                    (starts_y, starts_x), dims=self.image_shape
                )
                attrs["runs"] = runs
        return rle_seg

    def __call__(self, image: np.ndarray, tile_index: int) -> np.ndarray:
        if tile_index >= len(self):
            raise IndexError("Tile index out of range")
        assert image.shape[:2] == self.image_shape, (
            f"Image shape {image.shape} does not match tiler expected shape {self.image_shape}"
        )
        yslice = slice(*self.yranges[tile_index])
        xslice = slice(*self.xranges[tile_index])
        return image[yslice, xslice]
