"""RegNetX/Y encoders (reference ``empanada/models/encoders/regnet.py``).

Widths/depths are generated from the RegNet design-space equations
(https://arxiv.org/abs/2003.13678); regnety_6p4gf is the MitoNet_v1_mini
(PanopticBiFPN) backbone.  Pyramid: [stem (1/2), stage1 (1/4), stage2 (1/8),
stage3 (1/16), stage4 (1/32, or 1/16 when output_stride=16)].
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import ConvBnAct, Resample2d, SqueezeExcite

__all__ = ["RegNet", "RegNetParams", "regnet_configs"]


class RegNetParams:
    """Generates and adjusts stage widths/depths/groups (regnet.py:171-262)."""

    w_stem = 32
    bottle_ratio = 1

    def __init__(self, depth, w_0, w_a, w_m, group_w, q=8, use_se=False):
        assert w_a >= 0 and w_0 > 0 and w_m > 1 and w_0 % q == 0
        self.use_se = use_se

        # eqn (2)-(4): continuous widths quantized to stages
        u = w_0 + np.arange(depth) * w_a
        s = np.round(np.log(u / w_0) / np.log(w_m))
        w = w_0 * np.power(w_m, s)
        w = q * np.round(w / q).astype(int)
        w, d = np.unique(w, return_counts=True)
        assert len(w) == 4, "Bad parameters, only 4 stage networks allowed!"

        widths = w.tolist()
        depths = d.tolist()
        group_widths = [group_w] * 4

        # adjust widths/groups for divisibility
        b = self.bottle_ratio
        adj_ws, adj_groups = [], []
        for width, gw in zip(widths, group_widths):
            w_b = int(max(1, width * b))
            gw = int(min(gw, w_b))
            m = np.lcm(gw, b) if b > 1 else gw
            w_b = max(m, int(m * round(w_b / m)))
            adj_ws.append(int(w_b / b))
            adj_groups.append(w_b // gw)

        self.widths = adj_ws
        self.depths = depths
        self.groups = adj_groups


class _RegNetBottleneck(nn.Module):
    w_out: int
    groups: int = 1
    stride: int = 1
    use_se: bool = False
    bottle_ratio: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_b = int(round(self.w_out * self.bottle_ratio))
        identity = Resample2d(self.w_out, stride=self.stride, dtype=self.dtype, name="downsample")(x, train)
        out = ConvBnAct(w_b, 1, dtype=self.dtype, name="a")(x, train)
        out = ConvBnAct(w_b, 3, stride=self.stride, groups=self.groups, dtype=self.dtype, name="b")(out, train)
        if self.use_se:
            out = SqueezeExcite(dtype=self.dtype, name="se")(out)
        out = ConvBnAct(self.w_out, 1, activation=None, dtype=self.dtype, name="c")(out, train)
        return nn.relu(identity + out)


class RegNet(nn.Module):
    widths: Sequence[int]
    depths: Sequence[int]
    groups: Sequence[int]
    use_se: bool = False
    im_channels: int = 1
    output_stride: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.output_stride in (16, 32)
        # flax infers conv input channels from x, so im_channels would
        # otherwise be silently ignored — validate instead
        assert x.shape[-1] == self.im_channels, (
            f"input has {x.shape[-1]} channels, model configured for "
            f"im_channels={self.im_channels}"
        )
        strides = [2, 2, 2, 2]
        if self.output_stride == 16:
            strides[-1] = 1

        pyramid = []
        x = ConvBnAct(RegNetParams.w_stem, 3, stride=2, dtype=self.dtype,
                      s2d_stem=True, name="stem")(x, train)
        pyramid.append(x)

        for i, (w, d, g, s) in enumerate(zip(self.widths, self.depths, self.groups, strides)):
            for j in range(d):
                x = _RegNetBottleneck(
                    w,
                    groups=g,
                    stride=s if j == 0 else 1,
                    use_se=self.use_se,
                    dtype=self.dtype,
                    name=f"stage{i + 1}_block{j + 1}",
                )(x, train)
            pyramid.append(x)

        return pyramid


# name -> design-space parameters (reference regnet.py:262-316)
regnet_configs = {
    "regnetx_6p4gf": dict(depth=17, w_0=184, w_a=60.83, w_m=2.07, group_w=56),
    "regnety_200mf": dict(depth=13, w_0=24, w_a=36.44, w_m=2.49, group_w=8),
    "regnety_800mf": dict(depth=14, w_0=56, w_a=38.84, w_m=2.4, group_w=16),
    "regnety_3p2gf": dict(depth=21, w_0=80, w_a=42.63, w_m=2.66, group_w=24),
    "regnety_4gf": dict(depth=22, w_0=96, w_a=31.41, w_m=2.24, group_w=64),
    "regnety_6p4gf": dict(depth=25, w_0=112, w_a=33.22, w_m=2.27, group_w=72, use_se=True),
    "regnety_8gf": dict(depth=17, w_0=192, w_a=76.82, w_m=2.19, group_w=56, use_se=True),
    "regnety_16gf": dict(depth=18, w_0=200, w_a=106.23, w_m=2.48, group_w=112, use_se=True),
}
