"""Data layer: volume slicing, datasets, targets, augmentations."""

from empanada_tpu.data.augment import AUGMENTATIONS, Compose, create_augmentations
from empanada_tpu.data.datasets import (
    BaseDataset,
    BCDataset,
    PanopticDataset,
    SingleClassInstanceDataset,
    WeightedBatchLoader,
    create_dataset,
)
from empanada_tpu.data.targets import heatmap_and_offsets, seg_to_instance_bd
from empanada_tpu.data.volume import VolumeDataset, factor_pad_numpy, resize_by_factor

__all__ = [
    "VolumeDataset", "factor_pad_numpy", "resize_by_factor",
    "AUGMENTATIONS", "Compose", "create_augmentations",
    "BaseDataset", "BCDataset", "PanopticDataset", "SingleClassInstanceDataset",
    "WeightedBatchLoader", "create_dataset",
    "heatmap_and_offsets", "seg_to_instance_bd",
]
