"""Segmentation export (reference ``empanada_napari/_export_batch_segs.py``):
write label volumes as per-slice 2D tiffs or one 3D multipage tiff, with
optional paired greyscale export."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

__all__ = ["export_segmentations"]


def _to_saveable(arr: np.ndarray) -> np.ndarray:
    if arr.dtype in (np.uint8, np.uint16, np.int32, np.float32):
        return arr
    if arr.max() < 2**16:
        return arr.astype(np.uint16)
    return arr.astype(np.int32)


def export_segmentations(
    labels: np.ndarray,
    save_dir: str,
    prefix: str = "seg",
    as_stack: bool = False,
    image: np.ndarray | None = None,
    impaths=None,
):
    """Export a (d, h, w) label volume (and optional greyscale image).

    ``impaths`` provides per-slice filenames to mirror (the reference
    recovers names from dask stacks, _export_batch_segs.py:20).
    Returns list of written paths.
    """
    os.makedirs(save_dir, exist_ok=True)
    labels = np.asarray(labels)
    if labels.ndim == 2:
        labels = labels[None]
    if image is not None:
        image = np.asarray(image)
        if image.ndim == 2:
            # promote like labels: leading slice axis (np.atleast_3d would
            # append the axis at the END, writing h frames of (w, 1))
            image = image[None]
    written = []

    if as_stack:
        frames = [Image.fromarray(_to_saveable(sl)) for sl in labels]
        path = os.path.join(save_dir, f"{prefix}.tiff")
        frames[0].save(path, save_all=True, append_images=frames[1:])
        written.append(path)
        if image is not None:
            frames = [Image.fromarray(np.asarray(sl)) for sl in image]
            path = os.path.join(save_dir, f"{prefix}_image.tiff")
            frames[0].save(path, save_all=True, append_images=frames[1:])
            written.append(path)
        return written

    for i, sl in enumerate(labels):
        if impaths is not None and i < len(impaths):
            name = os.path.splitext(os.path.basename(impaths[i]))[0]
        else:
            name = f"{prefix}_{i:05d}"
        path = os.path.join(save_dir, f"{name}.tiff")
        Image.fromarray(_to_saveable(sl)).save(path)
        written.append(path)
        if image is not None:
            gpath = os.path.join(save_dir, f"{name}_image.tiff")
            Image.fromarray(np.asarray(image[i])).save(gpath)
            written.append(gpath)
    return written
