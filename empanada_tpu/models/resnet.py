"""ResNet encoders returning a 5-level feature pyramid.

Covers the reference ``empanada/models/encoders/resnet.py``: 1-channel stem,
output_stride 16 (dilated layer4, stride 1) or 32, pyramid = [stem+pool,
layer1..layer4].  MitoNet_v1's PanopticDeepLab uses resnet50.
"""

from __future__ import annotations

from dataclasses import field
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import ConvBnAct, batch_norm, max_pool_2d

__all__ = [
    "ResNet",
    "resnet_configs",
    "RESNET_WIDTHS",
]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    int8_execution: bool = False

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBnAct(self.planes, 3, stride=self.stride, dtype=self.dtype,
                        int8_execution=self.int8_execution, name="cba1")(x, train)
        out = ConvBnAct(self.planes, 3, activation=None, dtype=self.dtype,
                        int8_execution=self.int8_execution, name="cba2")(out, train)
        if self.downsample:
            identity = ConvBnAct(
                self.planes, 1, stride=self.stride, activation=None,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    int8_execution: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = ConvBnAct(width, 1, dtype=self.dtype, name="cba1")(x, train)
        out = ConvBnAct(
            width, 3, stride=self.stride, groups=self.groups, dilation=self.dilation,
            dtype=self.dtype, int8_execution=self.int8_execution, name="cba2",
        )(out, train)
        out = ConvBnAct(
            self.planes * self.expansion, 1, activation=None, dtype=self.dtype, name="cba3"
        )(out, train)
        if self.downsample:
            identity = ConvBnAct(
                self.planes * self.expansion, 1, stride=self.stride, activation=None,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns pyramid [p1 (1/4, stem), p2 (1/4), p3 (1/8), p4 (1/16), p5]."""

    block: str  # 'basic' | 'bottleneck'
    layers: Sequence[int]
    groups: int = 1
    width_per_group: int = 64
    in_channels: int = 1
    output_stride: int = 32
    dtype: jnp.dtype = jnp.float32
    int8_execution: bool = False

    @property
    def widths(self) -> Tuple[int, ...]:
        exp = 1 if self.block == "basic" else 4
        return tuple(p * exp for p in (64, 128, 256, 512))

    def _stage(self, x, planes, blocks, stride, dilation, inplanes, name, train):
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        exp = block_cls.expansion
        need_ds = stride != 1 or inplanes != planes * exp
        kw = dict(dtype=self.dtype, int8_execution=self.int8_execution)
        if self.block == "bottleneck":
            kw.update(groups=self.groups, base_width=self.width_per_group, dilation=dilation)
        # BasicBlock at output_stride 16: layer4 runs stride 1 WITHOUT
        # dilation.  The reference cannot express this config at all (its
        # BasicBlock raises for dilation > 1, torchvision resnet.py:53), so
        # no reference weights exist to mis-port; here it is a deliberate
        # extension — geometry matches os16, receptive field is that of the
        # un-dilated blocks.  Documented in PARITY.md "Known divergences".
        x = block_cls(planes, stride=stride, downsample=need_ds, name=f"{name}_block1", **kw)(x, train)
        for i in range(1, blocks):
            x = block_cls(planes, name=f"{name}_block{i + 1}", **kw)(x, train)
        return x, planes * exp

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.output_stride in (16, 32)
        # flax infers conv input channels from x, so in_channels would
        # otherwise be silently ignored — validate instead
        assert x.shape[-1] == self.in_channels, (
            f"input has {x.shape[-1]} channels, model configured for "
            f"in_channels={self.in_channels}"
        )
        # 7x7/2 stem; on TPU the few-channel conv goes through the exact
        # space-to-depth rewrite (blocks.s2d_stride2_conv) — the direct
        # form runs at ~3% of MXU peak with cin=1
        stem = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )
        from empanada_tpu.models.blocks import s2d_stem_supported, s2d_stride2_conv

        if s2d_stem_supported(x, self.dtype):
            if self.is_initializing():
                stem(x[:, :16, :16])
            kern = stem.variables["params"]["kernel"].astype(self.dtype)
            x = s2d_stride2_conv(x.astype(self.dtype), kern, 3)
        else:
            x = stem(x)
        x = batch_norm(x, train, self.dtype, name="stem_bn")
        x = nn.relu(x)
        p1 = max_pool_2d(x, 3, 2, 1)

        inplanes = 64
        p2, inplanes = self._stage(p1, 64, self.layers[0], 1, 1, inplanes, "layer1", train)
        p3, inplanes = self._stage(p2, 128, self.layers[1], 2, 1, inplanes, "layer2", train)
        p4, inplanes = self._stage(p3, 256, self.layers[2], 2, 1, inplanes, "layer3", train)

        last_stride = 1 if self.output_stride == 16 else 2
        dilation = 2 if self.output_stride == 16 else 1
        p5, _ = self._stage(p4, 512, self.layers[3], last_stride, dilation, inplanes, "layer4", train)

        return [p1, p2, p3, p4, p5]


# name -> constructor kwargs (reference resnet.py:239-360)
resnet_configs = {
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2)),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3)),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3)),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3)),
    "resnet152": dict(block="bottleneck", layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(block="bottleneck", layers=(3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_32x8d": dict(block="bottleneck", layers=(3, 4, 23, 3), groups=32, width_per_group=8),
    "wide_resnet50_2": dict(block="bottleneck", layers=(3, 4, 6, 3), width_per_group=128),
    "wide_resnet101_2": dict(block="bottleneck", layers=(3, 4, 23, 3), width_per_group=128),
}

RESNET_WIDTHS = {
    name: tuple(p * (1 if cfg["block"] == "basic" else 4) for p in (64, 128, 256, 512))
    for name, cfg in resnet_configs.items()
}
