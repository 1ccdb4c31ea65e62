"""Data layer: volume slicing, datasets, targets, augmentations."""

from empanada_tpu.data.volume import VolumeDataset, factor_pad_numpy, resize_by_factor

__all__ = ["VolumeDataset", "factor_pad_numpy", "resize_by_factor"]
