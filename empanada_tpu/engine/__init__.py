"""Inference engine layer (L2): jitted forward + panoptic post-processing."""

from empanada_tpu.engine.engines import (
    BCEngine,
    BCEngine3d,
    MedianQueue,
    PanopticDeepLabEngine,
    PanopticDeepLabEngine3d,
    PanopticDeepLabRenderEngine,
    PanopticDeepLabRenderEngine3d,
)

__all__ = [
    "BCEngine",
    "BCEngine3d",
    "MedianQueue",
    "PanopticDeepLabEngine",
    "PanopticDeepLabEngine3d",
    "PanopticDeepLabRenderEngine",
    "PanopticDeepLabRenderEngine3d",
]
