"""Label filtering (reference ``empanada_napari/_filter_small_labels.py``):
remove small-area labels and border-touching labels, per-image / 2D-patch /
3D modes."""

from __future__ import annotations

import numpy as np

__all__ = [
    "filter_out_small_label_areas",
    "remove_boundary_labels",
    "apply_label_filter",
]


def filter_out_small_label_areas(img: np.ndarray, minimum_area_allowed: int):
    """Remove labels whose pixel/voxel area is <= the threshold; returns
    (filtered image, number removed)."""
    labels, counts = np.unique(img, return_counts=True)
    keep = labels > 0
    labels, counts = labels[keep], counts[keep]
    if len(labels) == 0:
        return img, 0
    small = labels[counts <= minimum_area_allowed]
    if len(small):
        img[np.isin(img, small)] = 0
    return img, len(small)


def remove_boundary_labels(labels: np.ndarray):
    """Remove labels touching any array border; returns (filtered, n_removed)."""
    border_ids = set()
    for axis in range(labels.ndim):
        for sl in (0, -1):
            face = np.take(labels, sl, axis=axis)
            border_ids.update(int(v) for v in np.unique(face) if v > 0)
    if border_ids:
        labels[np.isin(labels, list(border_ids))] = 0
    return labels, len(border_ids)


def apply_label_filter(labels: np.ndarray, mode: str = "image", **kwargs):
    """Apply a filter per-image ('image'), per-2D-slice of a stack
    ('patches'), or over the whole volume ('volume')."""
    filt = kwargs.pop("filter", "small")
    fn = (
        (lambda a: filter_out_small_label_areas(a, kwargs["minimum_area_allowed"]))
        if filt == "small"
        else remove_boundary_labels
    )
    if mode == "patches" and labels.ndim == 3:
        total = 0
        for z in range(labels.shape[0]):
            labels[z], n = fn(labels[z])
            total += n
        return labels, total
    return fn(labels)
