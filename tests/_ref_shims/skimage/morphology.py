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
