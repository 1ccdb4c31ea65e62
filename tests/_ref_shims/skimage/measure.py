"""skimage.measure shim: multilabel connected components + regionprops
with the subset of attributes the reference uses (label, bbox, coords).

Matches skimage semantics where they matter for parity:
- ``label`` default connectivity = input.ndim (8-connectivity in 2D); two
  pixels are connected only when they have the SAME value (multilabel cc,
  like cc3d).  Output label numbering differs from skimage's scan order but
  downstream consumers relabel, so only component identity matters.
- ``regionprops`` yields regions sorted by label value with row-major
  sorted coords (what np.argwhere produces), matching skimage.
"""

import numpy as np
from scipy import ndimage


def label(input, background=0, connectivity=None, return_num=False):
    input = np.asarray(input)
    if connectivity is None:
        connectivity = input.ndim
    structure = ndimage.generate_binary_structure(input.ndim, connectivity)
    out = np.zeros(input.shape, np.int64)
    next_label = 0
    for v in np.unique(input):
        if v == background:
            continue
        lab, n = ndimage.label(input == v, structure=structure)
        out[lab > 0] = lab[lab > 0] + next_label
        next_label += n
    if return_num:
        return out, next_label
    return out


class _RegionProps:
    def __init__(self, label, bbox, coords):
        self.label = label
        self.bbox = bbox
        self.coords = coords

    @property
    def area(self):
        return len(self.coords)


def regionprops(label_image):
    label_image = np.asarray(label_image)
    rps = []
    for v in np.unique(label_image):
        if v <= 0:
            continue
        coords = np.argwhere(label_image == v)
        mins = coords.min(0)
        maxs = coords.max(0) + 1
        bbox = tuple(int(m) for m in mins) + tuple(int(m) for m in maxs)
        rps.append(_RegionProps(int(v), bbox, coords))
    return rps
