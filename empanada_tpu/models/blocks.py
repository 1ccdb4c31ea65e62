"""Shared conv building blocks (reference ``empanada/models/blocks.py``).

All modules are flax.linen, NHWC, with a ``dtype`` compute-precision knob
(bfloat16 on TPU by default at the engine level; params stay float32).
Torch's explicit ``padding=(k-1)//2`` is reproduced with symmetric explicit
padding so strided convs match torch geometry (XLA 'SAME' differs for
even-size inputs under stride 2).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.ops.interpolate import bilinear_resize, nearest_resize

__all__ = [
    "ConvBnAct",
    "SeparableConvBnAct",
    "ConvTransposeBnAct",
    "SeparableConv",
    "SqueezeExcite",
    "Resample2d",
    "Interpolate2d",
    "Resize2d",
    "max_pool_2d",
]


def _pad(kernel_size: int):
    p = (kernel_size - 1) // 2
    return [(p, p), (p, p)]


def max_pool_2d(x, window: int, stride: int, padding: int):
    """Torch-style max pool with explicit symmetric padding (pads with -inf)."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
    )


class SeparableConv(nn.Module):
    """Depthwise k×k + pointwise 1×1 (reference blocks.py:15)."""

    nout: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        x = nn.Conv(
            nin,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=_pad(self.kernel_size),
            feature_group_count=nin,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.nout, (1, 1), use_bias=self.use_bias, dtype=self.dtype, name="pointwise"
        )(x)
        return x


def batch_norm(x, train: bool, dtype, name: str = "bn"):
    """BatchNorm matching torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5).

    Inline submodule so params live at ``<parent>/<name>/{scale,bias}`` —
    keeps paths 1:1 with the torch weight-port name map.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )(x)


_ACTS: dict = {
    "relu": nn.relu,
    "silu": nn.silu,
    "sigmoid": nn.sigmoid,
    None: None,
}


class ConvBnAct(nn.Module):
    """conv (no bias) + BN + activation (reference blocks.py:134)."""

    nout: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    activation: Optional[str] = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.nout,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = batch_norm(x, train, self.dtype)
        act = _ACTS[self.activation]
        return act(x) if act is not None else x


class SeparableConvBnAct(nn.Module):
    """separable conv (no bias) + BN + activation (reference blocks.py:108)."""

    nout: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConv(
            self.nout, self.kernel_size, self.stride, use_bias=False,
            dtype=self.dtype, name="sepconv",
        )(x)
        x = batch_norm(x, train, self.dtype)
        act = _ACTS[self.activation]
        return act(x) if act is not None else x


class ConvTransposeBnAct(nn.Module):
    """transpose conv (stride == kernel) + BN + act (reference blocks.py:155)."""

    nout: int
    kernel_size: int = 2
    activation: Optional[str] = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.nout,
            (self.kernel_size, self.kernel_size),
            strides=(self.kernel_size, self.kernel_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="tconv",
        )(x)
        x = batch_norm(x, train, self.dtype)
        act = _ACTS[self.activation]
        return act(x) if act is not None else x


class SqueezeExcite(nn.Module):
    """Global squeeze-excite with hardcoded squeeze factor 4 (blocks.py:35)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        ns = nin // 4
        # exact global pooling even under spatial sharding
        from empanada_tpu.parallel.spatial import spatial_global_mean

        s = spatial_global_mean(x)
        s = nn.Conv(ns, (1, 1), use_bias=True, dtype=self.dtype, name="squeeze")(s)
        s = nn.relu(s)
        s = nn.Conv(nin, (1, 1), use_bias=True, dtype=self.dtype, name="excite")(s)
        return x * nn.sigmoid(s)


class Resample2d(nn.Module):
    """1x1 conv-bn channel/stride resampling, identity if no-op (blocks.py:52)."""

    nout: int
    stride: int = 1
    activation: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.nout or self.stride > 1:
            x = ConvBnAct(
                self.nout, 1, stride=self.stride, activation=self.activation,
                dtype=self.dtype, name="conv",
            )(x, train)
        return x


class Interpolate2d(nn.Module):
    """Fixed-scale interpolation (blocks.py:72)."""

    scale_factor: int
    mode: str = "nearest"
    align_corners: bool = False

    @nn.compact
    def __call__(self, x):
        out_hw = (x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor)
        if self.mode == "nearest":
            return nearest_resize(x, out_hw)
        return bilinear_resize(x, out_hw, align_corners=self.align_corners)


class Resize2d(nn.Module):
    """Nearest 2x up, or 3x3/stride-2 max-pool down (blocks.py:90)."""

    scale_factor: int = 2
    up_or_down: str = "up"

    @nn.compact
    def __call__(self, x):
        if self.up_or_down == "up":
            return nearest_resize(x, (x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor))
        return max_pool_2d(x, 3, self.scale_factor, 1)
