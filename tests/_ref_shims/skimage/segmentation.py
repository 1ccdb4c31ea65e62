"""skimage.segmentation shim: only the import-time symbol; the cross-gate
drives the reference's use_mask_wts=True path (pure-Python heap watershed),
not skimage's grayscale watershed."""


def watershed(*args, **kwargs):
    raise NotImplementedError(
        "skimage shim: grayscale watershed unavailable; use use_mask_wts=True"
    )
