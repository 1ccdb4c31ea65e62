"""Training target creation (reference
``empanada/data/utils/target_creation.py``): Gaussian center heatmaps +
per-pixel offsets for Panoptic-DeepLab, and Sobel contour maps for
boundary-contour models."""

from __future__ import annotations

import cv2
import numpy as np
from scipy import ndimage
from scipy.signal import convolve2d

__all__ = ["heatmap_and_offsets", "seg_to_instance_bd"]


def heatmap_and_offsets(sl2d: np.ndarray, heatmap_sigma: float = 6):
    """Instance seg (h, w) -> heatmap (h, w, 1) and offsets (h, w, 2).

    Centroids are computed per instance label; the heatmap is a peak-1
    Gaussian blur of the center points (sigma 6); offsets are (dy, dx) from
    each pixel to its own instance centroid, zero outside instances
    (target_creation.py:13).
    """
    h, w = sl2d.shape
    heatmap = np.zeros((h, w), dtype=np.float32)
    centers = np.zeros((2, h, w), dtype=np.float32)

    labels = np.unique(sl2d)
    labels = labels[labels > 0]
    if len(labels):
        coms = ndimage.center_of_mass(np.ones_like(sl2d), sl2d, labels)
        for label, (y, x) in zip(labels, coms):
            heatmap[int(y), int(x)] = 1
            mask = sl2d == label
            centers[0][mask] = y
            centers[1][mask] = x

    heatmap = cv2.GaussianBlur(
        heatmap, ksize=(0, 0), sigmaX=heatmap_sigma, sigmaY=heatmap_sigma,
        borderType=cv2.BORDER_CONSTANT,
    )
    hmax = heatmap.max()
    if hmax > 0:
        heatmap = heatmap / hmax

    yindices = np.arange(0, h, dtype=np.float32)
    xindices = np.arange(0, w, dtype=np.float32)
    offsets = np.zeros_like(centers)
    offsets[0] = centers[0] - yindices[:, None]
    offsets[1] = centers[1] - xindices[None, :]
    offsets[:, sl2d == 0] = 0

    # channel-last for the JAX models
    return heatmap[..., None], offsets.transpose(1, 2, 0)


def seg_to_instance_bd(seg: np.ndarray, tsz_h: int = 1, do_bg: bool = True) -> np.ndarray:
    """Instance contours (target_creation.py:80).

    seg: (z, h, w) label volume -> (z, h, w) uint8 contour map.
    ``do_bg=True``: Sobel edges + dilation (boundaries incl. against
    background).  ``do_bg=False``: only boundaries BETWEEN instances — a
    pixel whose (2*tsz_h+1)-window contains two different nonzero labels
    (matching the reference's im2col min/max formulation).
    """
    sz = seg.shape
    bd = np.zeros(sz, np.uint8)
    tsz = tsz_h * 2 + 1

    if not do_bg:
        mm = int(seg.max())
        for z in range(sz[0]):
            slide = np.pad(seg[z], tsz_h, mode="reflect").astype(np.int64)
            p0 = ndimage.maximum_filter(slide, size=tsz)[tsz_h:-tsz_h, tsz_h:-tsz_h]
            masked = np.where(slide == 0, mm + 1, slide)
            p1 = ndimage.minimum_filter(masked, size=tsz)[tsz_h:-tsz_h, tsz_h:-tsz_h]
            bd[z] = ((p0 != 0) & (p1 != 0) & (p0 != p1)).astype(np.uint8)
        return bd

    sobel = np.array([1, 0, -1])
    sobel_x = sobel.reshape(3, 1)
    sobel_y = sobel.reshape(1, 3)
    struct = np.ones((tsz, tsz), dtype=bool)
    for z in range(sz[0]):
        slide = seg[z]
        edge_x = convolve2d(slide, sobel_x, "same", boundary="symm")
        edge_y = convolve2d(slide, sobel_y, "same", boundary="symm")
        edge = np.maximum(np.abs(edge_x), np.abs(edge_y))
        contour = (edge != 0)
        bd[z] = ndimage.binary_dilation(contour, structure=struct).astype(np.uint8)
    return bd
