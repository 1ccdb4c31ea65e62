"""Jitted compute ops: resize/sampling, panoptic post-processing, padding."""

from empanada_tpu.ops.interpolate import (
    bilinear_resize,
    grid_sample,
    nearest_resize,
    point_sample,
)

__all__ = ["bilinear_resize", "grid_sample", "nearest_resize", "point_sample"]
