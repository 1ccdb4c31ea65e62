"""Host-side augmentation pipeline.

The reference composes albumentations transforms by name from the training
config (train.py:153-170; default list in training/train_config.yaml).
albumentations isn't available here, so this module implements the same
transform vocabulary on numpy/cv2 with the albumentations calling convention
(``tf(image=..., mask=...) -> {"image", "mask"}``) and name-dispatch via
``create_augmentations``.

Supported (the reference's default set + padding):
RandomScale, PadIfNeeded, RandomCrop, CenterCrop, Rotate,
RandomBrightnessContrast, HorizontalFlip, VerticalFlip, GaussianBlur,
GaussNoise, FactorPad, Normalize.
"""

from __future__ import annotations

import math
from typing import Optional

import cv2
import numpy as np

__all__ = ["Compose", "create_augmentations", "AUGMENTATIONS"]


class _Transform:
    def __call__(self, image, mask=None, rng=None):
        raise NotImplementedError


class Compose:
    def __init__(self, transforms, seed: Optional[int] = None):
        self.transforms = transforms
        self.rng = np.random.default_rng(seed)

    def __call__(self, image, mask=None):
        for tf in self.transforms:
            out = tf(image=image, mask=mask, rng=self.rng)
            image = out["image"]
            mask = out.get("mask", mask)
        out = {"image": image}
        if mask is not None:
            out["mask"] = mask
        return out


class RandomScale(_Transform):
    def __init__(self, scale_limit=(-0.9, 1.0), p=0.5):
        self.scale_limit = scale_limit
        self.p = p

    def __call__(self, image, mask=None, rng=None):
        if rng.random() > self.p:
            return {"image": image, "mask": mask}
        scale = 1.0 + rng.uniform(*self.scale_limit)
        h, w = image.shape[:2]
        nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if mask is not None:
            mask = cv2.resize(
                mask.astype(np.int32), (nw, nh), interpolation=cv2.INTER_NEAREST
            )
        return {"image": image, "mask": mask}


# cv2 border constants -> np.pad modes (albumentations configs use the
# cv2 integers)
_BORDER_MODES = {
    0: "constant",    # cv2.BORDER_CONSTANT
    1: "edge",        # cv2.BORDER_REPLICATE
    2: "symmetric",   # cv2.BORDER_REFLECT
    4: "reflect",     # cv2.BORDER_REFLECT_101
}


class PadIfNeeded(_Transform):
    def __init__(self, min_height, min_width, border_mode=0, p=1.0):
        self.min_height = min_height
        self.min_width = min_width
        if border_mode not in _BORDER_MODES:
            raise ValueError(
                f"unsupported border_mode {border_mode}; "
                f"supported cv2 codes: {sorted(_BORDER_MODES)}"
            )
        self.border_mode = border_mode

    def __call__(self, image, mask=None, rng=None):
        h, w = image.shape[:2]
        pb = max(0, self.min_height - h)
        pr = max(0, self.min_width - w)
        pt, pl = pb // 2, pr // 2
        pad = ((pt, pb - pt), (pl, pr - pl))
        mode = _BORDER_MODES[self.border_mode]
        image = np.pad(image, pad, mode=mode)
        if mask is not None:
            mask = np.pad(mask, pad, mode=mode)
        return {"image": image, "mask": mask}


class RandomCrop(_Transform):
    def __init__(self, height, width, p=1.0):
        self.height = height
        self.width = width

    def __call__(self, image, mask=None, rng=None):
        h, w = image.shape[:2]
        assert h >= self.height and w >= self.width, "pad before cropping"
        y = int(rng.integers(0, h - self.height + 1))
        x = int(rng.integers(0, w - self.width + 1))
        image = image[y : y + self.height, x : x + self.width]
        if mask is not None:
            mask = mask[y : y + self.height, x : x + self.width]
        return {"image": image, "mask": mask}


class CenterCrop(_Transform):
    def __init__(self, height, width, p=1.0):
        self.height = height
        self.width = width

    def __call__(self, image, mask=None, rng=None):
        h, w = image.shape[:2]
        assert h >= self.height and w >= self.width, "pad before cropping"
        y = (h - self.height) // 2
        x = (w - self.width) // 2
        image = image[y : y + self.height, x : x + self.width]
        if mask is not None:
            mask = mask[y : y + self.height, x : x + self.width]
        return {"image": image, "mask": mask}


# cv2 border codes usable directly by warpAffine
_CV2_BORDER = {0: 0, 1: 1, 2: 2, 4: 4}


class Rotate(_Transform):
    def __init__(self, limit=180, border_mode=0, p=0.5):
        self.limit = limit
        self.p = p
        if border_mode not in _CV2_BORDER:
            raise ValueError(
                f"unsupported border_mode {border_mode}; "
                f"supported cv2 codes: {sorted(_CV2_BORDER)}"
            )
        self.border_mode = border_mode

    def __call__(self, image, mask=None, rng=None):
        if rng.random() > self.p:
            return {"image": image, "mask": mask}
        angle = float(rng.uniform(-self.limit, self.limit))
        h, w = image.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        image = cv2.warpAffine(image, m, (w, h), flags=cv2.INTER_LINEAR,
                               borderMode=self.border_mode, borderValue=0)
        if mask is not None:
            mask = cv2.warpAffine(
                mask.astype(np.int32), m, (w, h), flags=cv2.INTER_NEAREST,
                borderMode=self.border_mode, borderValue=0
            )
        return {"image": image, "mask": mask}


class RandomBrightnessContrast(_Transform):
    def __init__(self, brightness_limit=0.3, contrast_limit=0.3, p=0.5):
        self.brightness_limit = brightness_limit
        self.contrast_limit = contrast_limit
        self.p = p

    def __call__(self, image, mask=None, rng=None):
        if rng.random() > self.p:
            return {"image": image, "mask": mask}
        alpha = 1.0 + float(rng.uniform(-self.contrast_limit, self.contrast_limit))
        beta = float(rng.uniform(-self.brightness_limit, self.brightness_limit))
        img = image.astype(np.float32)
        scale = 1.0 if np.issubdtype(image.dtype, np.floating) else float(np.iinfo(image.dtype).max)
        img = img * alpha + beta * scale
        if not np.issubdtype(image.dtype, np.floating):
            img = np.clip(img, 0, scale)
        return {"image": img.astype(image.dtype), "mask": mask}


class HorizontalFlip(_Transform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, image, mask=None, rng=None):
        if rng.random() <= self.p:
            image = image[:, ::-1].copy()
            if mask is not None:
                mask = mask[:, ::-1].copy()
        return {"image": image, "mask": mask}


class VerticalFlip(_Transform):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, image, mask=None, rng=None):
        if rng.random() <= self.p:
            image = image[::-1].copy()
            if mask is not None:
                mask = mask[::-1].copy()
        return {"image": image, "mask": mask}


class GaussianBlur(_Transform):
    def __init__(self, blur_limit=(3, 7), p=0.5):
        self.blur_limit = blur_limit
        self.p = p

    def __call__(self, image, mask=None, rng=None):
        if rng.random() > self.p:
            return {"image": image, "mask": mask}
        k = int(rng.integers(self.blur_limit[0] // 2, self.blur_limit[1] // 2 + 1)) * 2 + 1
        return {"image": cv2.GaussianBlur(image, (k, k), 0), "mask": mask}


class GaussNoise(_Transform):
    def __init__(self, var_limit=(10.0, 50.0), p=0.5):
        self.var_limit = var_limit
        self.p = p

    def __call__(self, image, mask=None, rng=None):
        if rng.random() > self.p:
            return {"image": image, "mask": mask}
        var = float(rng.uniform(*self.var_limit))
        sigma = math.sqrt(var)
        if np.issubdtype(image.dtype, np.floating):
            # var_limit is specified on the 0-255 scale (albumentations
            # convention); scale to the float image's [0, 1] range and clip
            # so float inputs aren't drowned in noise
            noise = rng.normal(0, sigma / 255.0, image.shape[:2])
            img = np.clip(image.astype(np.float32) + noise, 0.0, 1.0)
        else:
            noise = rng.normal(0, sigma, image.shape[:2])
            img = np.clip(
                image.astype(np.float32) + noise, 0, np.iinfo(image.dtype).max
            )
        return {"image": img.astype(image.dtype), "mask": mask}


class FactorPad(_Transform):
    def __init__(self, factor=128, p=1.0):
        self.factor = factor

    def __call__(self, image, mask=None, rng=None):
        from empanada_tpu.data.volume import factor_pad_numpy

        image = factor_pad_numpy(image, self.factor)
        if mask is not None:
            mask = factor_pad_numpy(mask, self.factor)
        return {"image": image, "mask": mask}


class Normalize(_Transform):
    """Mean/std normalization scaled by the dtype max (matches the inference
    Preprocessor so train/test distributions agree)."""

    def __init__(self, mean=0.5, std=0.2, p=1.0):
        self.mean = mean
        self.std = std

    def __call__(self, image, mask=None, rng=None):
        if np.issubdtype(image.dtype, np.floating):
            maxv = 1.0
        else:
            maxv = float(np.iinfo(image.dtype).max)
        image = (image.astype(np.float32) - self.mean * maxv) / (self.std * maxv)
        return {"image": image, "mask": mask}


AUGMENTATIONS = {
    "RandomScale": RandomScale,
    "PadIfNeeded": PadIfNeeded,
    "RandomCrop": RandomCrop,
    "CenterCrop": CenterCrop,
    "Rotate": Rotate,
    "RandomBrightnessContrast": RandomBrightnessContrast,
    "HorizontalFlip": HorizontalFlip,
    "VerticalFlip": VerticalFlip,
    "GaussianBlur": GaussianBlur,
    "GaussNoise": GaussNoise,
    "FactorPad": FactorPad,
    "Normalize": Normalize,
}


def create_augmentations(aug_specs, seed: Optional[int] = None) -> Compose:
    """Name-dispatch a config list like
    ``[{"aug": "RandomCrop", "height": 256, "width": 256}, ...]``
    (reference train.py:153-170)."""
    tfs = []
    for spec in aug_specs:
        spec = dict(spec)
        name = spec.pop("aug")
        tfs.append(AUGMENTATIONS[name](**spec))
    return Compose(tfs, seed=seed)
