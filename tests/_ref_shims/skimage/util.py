import numpy as np


def crop(ar, crop_width, copy=False, order="K"):
    slices = tuple(slice(a, s - b) for (a, b), s in zip(crop_width, ar.shape))
    out = ar[slices]
    return out.copy() if copy else out
