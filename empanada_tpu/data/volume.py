"""Volume slicing dataset + resize helpers (reference
``empanada/data/volume_dataset.py`` and ``data/utils/transforms.py``).

Works over numpy arrays or ChunkedArray stores; slices are taken along an
axis, optionally downsampled by a power-of-two scale (cv2 bilinear like the
reference), and normalized by the given preprocessor.
"""

from __future__ import annotations

import math

import cv2
import numpy as np

from empanada_tpu.core.masks import take

__all__ = ["resize_by_factor", "factor_pad_numpy", "VolumeDataset"]


def resize_by_factor(image: np.ndarray, scale_factor: int = 1) -> np.ndarray:
    """cv2 bilinear downsample by an integer factor (transforms.py:9)."""
    if scale_factor == 1:
        return image
    h, w = image.shape
    dh = math.ceil(h / scale_factor)
    dw = math.ceil(w / scale_factor)
    return cv2.resize(image, (dw, dh), interpolation=cv2.INTER_LINEAR)


def factor_pad_numpy(image: np.ndarray, factor: int = 128) -> np.ndarray:
    """Bottom/right zero pad to a multiple of factor (transforms.py:23)."""
    h, w = image.shape[:2]
    pad_bottom = (-h) % factor
    pad_right = (-w) % factor
    if image.ndim == 3:
        padding = ((0, pad_bottom), (0, pad_right), (0, 0))
    elif image.ndim == 2:
        padding = ((0, pad_bottom), (0, pad_right))
    else:
        raise Exception(f"unsupported ndim {image.ndim}")
    return np.pad(image, padding)


class VolumeDataset:
    """Iterable of {'index', 'image', 'size'} slices along an axis
    (volume_dataset.py:8)."""

    def __init__(self, array, axis: int = 0, tfs=None, scale: int = 1,
                 start: int = 0):
        if not math.log2(scale).is_integer():
            raise Exception(f"Image rescaling must be log base 2, got {scale}")
        self.array = array
        self.axis = axis
        self.tfs = tfs
        self.scale = scale
        # first slice index iteration yields (checkpoint resume restarts
        # mid-axis without materializing a sub-volume; chunked/dask inputs
        # keep streaming lazily)
        self.start = start

    def __len__(self):
        return self.array.shape[self.axis]

    def __getitem__(self, idx: int) -> dict:
        image = take(self.array, idx, self.axis)
        if hasattr(image, "compute"):
            # dask arrays materialize per-slice, exactly like the reference
            # (volume_dataset.py:43-44); dask itself is an optional import
            image = image.compute()
        image = np.asarray(image)
        h, w = image.shape
        image = resize_by_factor(image, self.scale)
        assert (image.shape[0] * self.scale) >= h
        assert (image.shape[1] * self.scale) >= w
        if self.tfs is not None:
            image = self.tfs(image=image)["image"]
        return {"index": idx, "image": image, "size": (h, w)}

    def __iter__(self):
        for idx in range(self.start, len(self)):
            yield self[idx]
