"""Shared impl for skimage.morphology._util internals used by the
reference's mask watershed (watershed.py:14)."""

import numpy as np
from scipy import ndimage


def _validate_connectivity(image_dim, connectivity, offset):
    if connectivity is None:
        connectivity = 1
    if np.isscalar(connectivity):
        structure = ndimage.generate_binary_structure(image_dim, connectivity)
    else:
        structure = np.asarray(connectivity, bool)
    if offset is None:
        offset = np.array([s // 2 for s in structure.shape])
    return structure, offset


def _offsets_to_raveled_neighbors(image_shape, structure, center, order="C"):
    offsets = np.argwhere(structure) - np.asarray(center)
    offsets = offsets[np.any(offsets != 0, axis=1)]
    strides = np.array(
        [int(np.prod(image_shape[i + 1:])) for i in range(len(image_shape))],
        dtype=np.int64,
    )
    raveled = (offsets * strides).sum(axis=1)
    # skimage sorts by euclidean distance from the center (stable)
    dist = np.sqrt((offsets.astype(float) ** 2).sum(axis=1))
    return raveled[np.argsort(dist, kind="stable")]
