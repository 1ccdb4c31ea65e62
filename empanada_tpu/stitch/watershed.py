"""Boundary-contour (BC) watershed segmentation (reference
``empanada/inference/watershed.py``).

Seeds = connected components of (semantic > thres1 & boundary < thres2),
size-filtered; flooding mask = semantic > thres3.  The flood itself is the
inherently sequential heap watershed, run in native C++ (grayscale priority
flood matching skimage's watershed ordering, or the simplified binary-mask
variant); a pure-Python heap fallback exists for environments without the
shared library.
"""

from __future__ import annotations

import heapq

import numpy as np
from scipy import ndimage

__all__ = ["bc_watershed", "mask_watershed", "gray_watershed", "cast2dtype", "size_threshold"]


def cast2dtype(segm: np.ndarray) -> np.ndarray:
    """Smallest unsigned dtype that can hold the max label (watershed.py:37)."""
    mid = np.max(segm)
    m_type = np.uint64
    if mid < 2**8:
        m_type = np.uint8
    elif mid < 2**16:
        m_type = np.uint16
    elif mid < 2**32:
        m_type = np.uint32
    return segm.astype(m_type)


def size_threshold(seg: np.ndarray, thres: int) -> np.ndarray:
    """Remove labeled objects smaller than ``thres`` voxels."""
    if thres is None or thres <= 0:
        return seg
    labels, counts = np.unique(seg, return_counts=True)
    small = labels[(counts < thres) & (labels > 0)]
    if len(small):
        seg[np.isin(seg, small)] = 0
    return seg


def _neighborhood_offsets(shape, connectivity=1):
    """Flat-index offsets of the neighborhood for a padded array."""
    struct = ndimage.generate_binary_structure(len(shape), connectivity)
    center = tuple(s // 2 for s in struct.shape)
    offsets = []
    strides = np.array([int(np.prod(shape[i + 1:])) for i in range(len(shape))])
    for idx in np.argwhere(struct):
        delta = idx - np.array(center)
        if not delta.any():
            continue
        offsets.append(int((delta * strides).sum()))
    return np.array(offsets, dtype=np.int64)


def _py_watershed(image_flat, mask_flat, markers_flat, offsets, output_flat):
    """Python heap fallback of the priority flood."""
    age = 0
    heap = []
    for ml in np.flatnonzero(markers_flat):
        heapq.heappush(heap, (float(image_flat[ml]) if image_flat is not None else 0.0, age, int(ml)))
        age += 1
    size = len(mask_flat)
    while heap:
        _, _, idx = heapq.heappop(heap)
        for off in offsets:
            nb = idx + off
            if nb < 0 or nb >= size or not mask_flat[nb] or output_flat[nb]:
                continue
            output_flat[nb] = output_flat[idx]
            heapq.heappush(
                heap,
                (float(image_flat[nb]) if image_flat is not None else 0.0, age, int(nb)),
            )
            age += 1


def _run_watershed(image, mask, markers, connectivity=1):
    """Pad, flatten, flood, crop.  ``image`` None -> binary mask watershed."""
    ndim = mask.ndim
    pad = [(1, 1)] * ndim
    mask_p = np.pad(mask.astype(np.uint8), pad)
    out_p = np.pad(markers.astype(np.int64), pad)
    img_p = None if image is None else np.pad(image.astype(np.float32), pad)

    offsets = _neighborhood_offsets(mask_p.shape, connectivity)
    marker_locs = np.flatnonzero(out_p.reshape(-1))

    out_flat = np.ascontiguousarray(out_p.reshape(-1))
    try:
        from empanada_tpu.core import native

        if native.available():
            if image is None:
                native.mask_watershed(mask_p.reshape(-1), marker_locs, offsets, out_flat)
            else:
                native.gray_watershed(
                    img_p.reshape(-1), mask_p.reshape(-1), marker_locs, offsets, out_flat
                )
        else:
            raise ImportError
    except ImportError:
        _py_watershed(
            None if image is None else img_p.reshape(-1),
            mask_p.reshape(-1), out_p.reshape(-1), offsets, out_flat,
        )

    out_p = out_flat.reshape(mask_p.shape)
    crop = tuple(slice(1, -1) for _ in range(ndim))
    return out_p[crop]


def mask_watershed(mask, markers, connectivity=1):
    """Simplified binary-mask watershed (watershed.py:89)."""
    return _run_watershed(None, mask, markers, connectivity)


def gray_watershed(image, markers, mask, connectivity=1):
    """skimage-style seeded watershed: floods lowest image values first."""
    return _run_watershed(image, mask, markers, connectivity)


def bc_watershed(
    volume: np.ndarray,
    thres1: float = 0.9,
    thres2: float = 0.8,
    thres3: float = 0.85,
    seed_thres: int = 32,
    min_size: int = 128,
    label_divisor: int = 1000,
    use_mask_wts: bool = False,
) -> np.ndarray:
    """Foreground+boundary probability maps (uint8 scale) -> instance masks
    (watershed.py:129)."""
    assert volume.shape[0] == 2
    semantic = volume[0]
    boundary = volume[1]
    seed_map = (semantic > int(255 * thres1)) * (boundary < int(255 * thres2))
    foreground = semantic > int(255 * thres3)

    struct = ndimage.generate_binary_structure(semantic.ndim, semantic.ndim)
    seed, _ = ndimage.label(seed_map, structure=struct)
    seed = size_threshold(seed.astype(np.int64), seed_thres)

    if use_mask_wts:
        segm = mask_watershed(foreground, seed)
    else:
        segm = gray_watershed(-semantic.astype(np.float32), seed, foreground)
    segm = segm.astype(np.uint32)

    if min_size is not None:
        segm = size_threshold(segm, min_size)

    segm[segm > 0] += label_divisor
    return cast2dtype(segm)
