"""skimage.morphology shim: grey erosion/dilation with skimage's default
cross-shaped footprint (scipy connectivity-1 structure)."""

import numpy as np
from scipy import ndimage


def _footprint(image, footprint):
    if footprint is None:
        return ndimage.generate_binary_structure(np.asarray(image).ndim, 1)
    return footprint


def erosion(image, footprint=None, **kwargs):
    return ndimage.grey_erosion(image, footprint=_footprint(image, footprint))


def dilation(image, footprint=None, **kwargs):
    return ndimage.grey_dilation(image, footprint=_footprint(image, footprint))


def remove_small_objects(ar, min_size=64, connectivity=1):
    """skimage semantics: labeled input -> drop labels with area < min_size;
    bool input -> connected components first."""
    ar = np.asarray(ar)
    if ar.dtype == bool:
        lab, _ = ndimage.label(
            ar, structure=ndimage.generate_binary_structure(ar.ndim, connectivity)
        )
    else:
        lab = ar
    out = ar.copy()
    ids, counts = np.unique(lab[lab > 0], return_counts=True)
    small = ids[counts < min_size]
    if len(small):
        out[np.isin(lab, small)] = 0
    return out
