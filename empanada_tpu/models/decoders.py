"""Decoders: ASPP + Panoptic-DeepLab top-down decoder, and EfficientDet-style
BiFPN + upsampling decoder.

Covers the reference ``empanada/models/decoders/{aspp,panoptic_deeplab,
bifpn}.py``.  Note the reference BiFPN appends ONE ``conv_block`` module N
times so the after-combine convs share weights across pyramid levels — we
reproduce that (a single module applied at every level) so checkpoints map
1:1 and parameter counts match.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import (
    ConvBnAct,
    Resample2d,
    Resize2d,
    SeparableConvBnAct,
)
from empanada_tpu.ops.interpolate import bilinear_resize

__all__ = ["ASPP", "PanopticDeepLabDecoder", "BiFPN", "BiFPNDecoder"]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (aspp.py:51): 1x1 + three dilated 3x3 +
    global image pooling, concat, 1x1 projection with dropout."""

    out_channels: int
    atrous_rates: Sequence[int] = (2, 4, 6)
    dropout_p: float = 0.5
    pool_size: Optional[int] = None  # None = global adaptive pooling
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = x.shape[1:3]
        res = [ConvBnAct(self.out_channels, 1, dtype=self.dtype, name="conv1x1")(x, train)]
        for i, rate in enumerate(self.atrous_rates):
            res.append(
                ConvBnAct(
                    self.out_channels, 3, dilation=rate, dtype=self.dtype,
                    name=f"aspp_conv{i + 1}",
                )(x, train)
            )

        # image pooling branch: global average (or fixed window during
        # training, reference set_image_pooling), conv+relu, bilinear upsample
        if self.pool_size is None:
            # exact global pooling even under spatial sharding
            from empanada_tpu.parallel.spatial import spatial_global_mean

            pooled = spatial_global_mean(x)
        else:
            k = self.pool_size
            pooled = nn.avg_pool(x, (k, k), strides=(1, 1))
        pooled = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="pool_conv"
        )(pooled)
        pooled = nn.relu(pooled)
        res.append(bilinear_resize(pooled, size, align_corners=True))

        x = jnp.concatenate(res, axis=-1)
        x = ConvBnAct(self.out_channels, 1, dtype=self.dtype, name="project")(x, train)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        return x


class PanopticDeepLabDecoder(nn.Module):
    """ASPP + top-down projection/fuse over low-level stages
    (decoders/panoptic_deeplab.py:23)."""

    decoder_channels: int
    low_level_stages: Sequence[int]  # pyramid indices, largest stride first
    low_level_channels_project: Sequence[int]
    atrous_rates: Sequence[int] = (2, 4, 6)
    aspp_channels: Optional[int] = None
    aspp_dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid_features, train: bool = False):
        aspp_channels = self.aspp_channels or self.decoder_channels
        x = ASPP(
            aspp_channels, self.atrous_rates, self.aspp_dropout, dtype=self.dtype, name="aspp"
        )(pyramid_features[-1], train)

        for i, stage in enumerate(self.low_level_stages):
            low = pyramid_features[stage]
            low = ConvBnAct(
                self.low_level_channels_project[i], 1, dtype=self.dtype, name=f"project{i}"
            )(low, train)
            x = bilinear_resize(x, low.shape[1:3], align_corners=True)
            x = jnp.concatenate([x, low], axis=-1)
            x = SeparableConvBnAct(
                self.decoder_channels, 5, dtype=self.dtype, name=f"fuse{i}"
            )(x, train)

        return x


class _TopDownFPN(nn.Module):
    """Top-down pass, smallest-resolution first (bifpn.py:17)."""

    n_levels: int  # number of levels BELOW the top (each gets resample+fuse)
    fpn_dim: int
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid_features, train: bool = False):
        # fast-fusion weights (n_levels + 1), relu + normalize
        weights = self.param("fusion_weights", nn.initializers.ones, (self.n_levels + 1,))
        weights = nn.relu(weights)
        weights = weights / (weights.sum() + 1e-4)

        # reference quirk: ONE shared after-combine conv for all levels
        conv_cls = SeparableConvBnAct if self.depthwise else ConvBnAct
        after_combine = conv_cls(
            self.fpn_dim, 3, activation="silu" if self.depthwise else "relu",
            dtype=self.dtype, name="after_combine",
        )
        resize_up = Resize2d(2, "up")

        td = [pyramid_features[0]]
        for i in range(self.n_levels):
            low_res = td[-1]
            high_res = Resample2d(self.fpn_dim, dtype=self.dtype, name=f"resample{i}")(
                pyramid_features[i + 1], train
            )
            w1, w2 = weights[i], weights[i + 1]
            fused = (w1 * resize_up(low_res) + w2 * high_res) / (w1 + w2 + 1e-4)
            td.append(after_combine(fused, train))
        return td


class _BottomUpFPN(nn.Module):
    """Bottom-up pass, largest-resolution first (bifpn.py:73)."""

    n_levels: int
    fpn_dim: int
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid_features, top_down_features, train: bool = False):
        weights = self.param("fusion_weights", nn.initializers.ones, (self.n_levels + 1,))
        weights = nn.relu(weights)
        weights = weights / (weights.sum() + 1e-4)

        conv_cls = SeparableConvBnAct if self.depthwise else ConvBnAct
        after_combine = conv_cls(
            self.fpn_dim, 3, activation="silu" if self.depthwise else "relu",
            dtype=self.dtype, name="after_combine",
        )
        resize_down = Resize2d(2, "down")

        bu = [top_down_features[0]]
        for i in range(self.n_levels):
            high_res = bu[-1]
            td_low = top_down_features[i + 1]
            pyr_low = Resample2d(self.fpn_dim, dtype=self.dtype, name=f"resample{i}")(
                pyramid_features[i], train
            )
            if i < self.n_levels - 1:
                w1, w2, w3 = weights[i], weights[i + 1], weights[i + 2]
                fused = (w1 * resize_down(high_res) + w2 * pyr_low + w3 * td_low) / (
                    w1 + w2 + w3 + 1e-4
                )
            else:
                w1, w2 = weights[i], weights[i + 1]
                fused = (w1 * resize_down(high_res) + w2 * pyr_low) / (w1 + w2 + 1e-4)
            bu.append(after_combine(fused, train))
        return bu


class _BiFPNLayer(nn.Module):
    n_scales: int
    fpn_dim: int
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid_features, train: bool = False):
        # top-down over reversed (smallest first)
        td = _TopDownFPN(
            self.n_scales - 1, self.fpn_dim, self.depthwise, dtype=self.dtype, name="top_down"
        )(pyramid_features[::-1], train)
        # bottom-up over remaining levels (largest first, skipping level 0)
        bu = _BottomUpFPN(
            self.n_scales - 1, self.fpn_dim, self.depthwise, dtype=self.dtype, name="bottom_up"
        )(pyramid_features[1:], td[::-1], train)
        return bu


class BiFPN(nn.Module):
    """Adds P6/P7 and stacks BiFPN layers (bifpn.py:160).

    Input: encoder features at strides 8/16/32 (P3-P5); output: fused
    features at strides 8..128 (P3-P7), each fpn_dim channels.
    """

    fpn_dim: int
    num_layers: int = 3
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid_features, train: bool = False):
        downsize = Resize2d(2, "down")
        p6 = downsize(
            Resample2d(self.fpn_dim, dtype=self.dtype, name="p6_resample")(
                pyramid_features[-1], train
            )
        )
        p7 = downsize(p6)
        feats = list(pyramid_features) + [p6, p7]

        for i in range(self.num_layers):
            feats = _BiFPNLayer(
                len(feats), self.fpn_dim, self.depthwise, dtype=self.dtype, name=f"bifpn{i + 1}"
            )(feats, train)
        return feats


class BiFPNDecoder(nn.Module):
    """Transpose-conv upsampling decoder over the BiFPN pyramid
    (bifpn.py:198); input ordered smallest-resolution first, output at the
    resolution of the last (largest) skip."""

    fpn_dim: int
    n_fpn_scales: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fpn_features, train: bool = False):
        from empanada_tpu.models.blocks import ConvTransposeBnAct

        assert len(fpn_features) == self.n_fpn_scales + 1
        x = fpn_features[0]
        skips = fpn_features[1:]
        for i in range(self.n_fpn_scales):
            x = ConvTransposeBnAct(self.fpn_dim, 2, dtype=self.dtype, name=f"up{i}")(x, train)
            x = jnp.concatenate([x, skips[i]], axis=-1)
        return SeparableConvBnAct(self.fpn_dim, 5, dtype=self.dtype, name="fusion")(x, train)
