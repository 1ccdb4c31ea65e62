"""Model layer (L1): flax panoptic segmentation models.

Name-dispatched factory mirroring the reference's
``models.__dict__[arch](**MODEL)`` pattern (train.py:83).
"""

from empanada_tpu.models.panoptic_bifpn import PanopticBiFPN, PanopticBiFPNPR
from empanada_tpu.models.panoptic_deeplab import (
    PanopticDeepLab,
    PanopticDeepLabBC,
    PanopticDeepLabPR,
)
from empanada_tpu.models.regnet import RegNet, RegNetParams, regnet_configs
from empanada_tpu.models.resnet import ResNet, resnet_configs

MODEL_REGISTRY = {
    "PanopticDeepLab": PanopticDeepLab,
    "PanopticDeepLabPR": PanopticDeepLabPR,
    "PanopticDeepLabBC": PanopticDeepLabBC,
    "PanopticBiFPN": PanopticBiFPN,
    "PanopticBiFPNPR": PanopticBiFPNPR,
}


def create_model(arch: str, **kwargs):
    """Instantiate a model by architecture name (e.g. 'PanopticDeepLabPR')."""
    if arch not in MODEL_REGISTRY:
        raise ValueError(f"unknown arch {arch}, choices: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[arch](**kwargs)


__all__ = [
    "MODEL_REGISTRY",
    "create_model",
    "PanopticDeepLab",
    "PanopticDeepLabPR",
    "PanopticDeepLabBC",
    "PanopticBiFPN",
    "PanopticBiFPNPR",
    "ResNet",
    "RegNet",
    "RegNetParams",
    "resnet_configs",
    "regnet_configs",
]
