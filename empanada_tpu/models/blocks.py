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
    "s2d_stem_supported",
    "s2d_stride2_conv",
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


def s2d_stem_supported(x, dtype) -> bool:
    """Whether the space-to-depth stride-2 stem path applies."""
    return (
        dtype == jnp.bfloat16
        and x.ndim == 4
        and x.shape[-1] <= 4
        and x.shape[1] % 4 == 0
        and x.shape[2] % 4 == 0
        and jax.default_backend() == "tpu"
    )


def int8_conv(x, kernel, stride: int, pad: int, dilation: int, dtype):
    """s8 x s8 -> s32 conv with dynamic per-tensor activation scale and
    per-output-channel weight scales; weight quantization constant-folds
    at compile time (kernel is a parameter)."""
    w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True) / 127.0
    w_scale = jnp.maximum(w_scale, 1e-12)
    wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)

    a_scale = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
    ).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), [(pad, pad), (pad, pad)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = (a_scale.astype(jnp.float32) * w_scale[0, 0, 0].astype(jnp.float32))
    return (acc.astype(jnp.float32) * scale).astype(dtype)


def s2d_stride2_conv(x, kernel, pad: int):
    """Stride-2 kxk conv on few-channel input via space-to-depth(4).

    EM stems convolve a 1-channel image (7x7/2 in ResNet, 3x3/2 in RegNet)
    — with cin=1 the MXU contraction dim is the kernel footprint (<=49)
    and XLA runs it at ~2-3% of peak (~1 ms of a 512^2x8 forward).  The
    exact rewrite: space-to-depth the input by 4 (16 channels), convolve
    with an algebraically transformed kernel (window covers the same taps,
    contraction dim 16*cin*win^2 >= 128), depth-to-space the 2x2 output
    subpixels back.  Zero-padded kernel entries contribute exact zeros, so
    this equals the direct conv up to f32-accumulation order.

    Args: x (N,H,W,C) with H,W % 4 == 0; kernel (k,k,C,Co) HWIO; ``pad``
    the direct conv's symmetric padding.  Returns (N,H/2,W/2,Co).
    """
    import numpy as onp

    n, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[3]
    # output p = 2*i2 + a samples x[4*i2 + t], t = 2a + u - pad
    dlo = int(onp.floor(-pad / 4))
    dhi = int(onp.floor((2 + (k - 1) - pad) / 4))
    wn = dhi - dlo + 1

    kk = onp.arange(wn)
    sl = onp.arange(4)
    ab = onp.arange(2)
    t = 4 * (dlo + kk[:, None, None]) + sl[None, :, None]
    u = t - 2 * ab[None, None, :] + pad               # (wn, 4, 2)
    valid = (u >= 0) & (u < k)
    uc = onp.clip(u, 0, k - 1)

    uf, vf = uc.reshape(-1), uc.reshape(-1)
    wg = kernel[uf][:, vf]                            # (wn*8, wn*8, C, Co)
    mask = jnp.asarray(
        (valid.reshape(-1)[:, None] & valid.reshape(-1)[None, :]), kernel.dtype
    )
    wg = wg * mask[:, :, None, None]
    wg = wg.reshape(wn, 4, 2, wn, 4, 2, cin, cout)
    wg = wg.transpose(0, 3, 1, 4, 6, 2, 5, 7)         # kku,kkv,su,sv,ci,a,b,co
    w2 = wg.reshape(wn, wn, 16 * cin, 4 * cout)

    x4 = x.reshape(n, h // 4, 4, w // 4, 4, cin)
    x4 = x4.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * cin)

    y = jax.lax.conv_general_dilated(
        x4.astype(w2.dtype), w2,
        window_strides=(1, 1),
        padding=((-dlo, dhi), (-dlo, dhi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(n, h // 4, w // 4, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, cout)
    return y


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
    # opt-in for stride-2 few-channel stems: exact space-to-depth rewrite
    # (s2d_stride2_conv) instead of the MXU-starved direct conv
    s2d_stem: bool = False
    # opt-in int8 execution for wide k>=3 convs: dynamic per-tensor
    # activation quant + per-output-channel int8 weights, s8xs8->s32 on the
    # MXU (2x bf16 peak on v5e).  Measured (benchmarks/profile_int8.py):
    # ~2x on stage4 dilated 3x3s, +18% on stage2 3x3s; 1x1s LOSE (quantize
    # overhead), hence the kernel_size/width gate below.  TPU analog of the
    # reference's fbgemm int8 (quantization/panoptic_deeplab.py:17-20).
    int8_execution: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.dilation * (self.kernel_size - 1) // 2
        conv = nn.Conv(
            self.nout,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )
        use_int8 = (
            self.int8_execution
            and not train
            and self.kernel_size >= 3
            and self.groups == 1
            and x.shape[-1] >= 128
        )
        if (
            self.s2d_stem
            and self.stride == 2
            and self.groups == 1
            and self.dilation == 1
            and s2d_stem_supported(x, self.dtype)
        ):
            if self.is_initializing():
                conv(x[:, :16, :16])
            kern = conv.variables["params"]["kernel"].astype(self.dtype)
            x = s2d_stride2_conv(x.astype(self.dtype), kern, p)
        elif use_int8:
            if self.is_initializing():
                conv(x[:, : 4 * self.stride, : 4 * self.stride])
            kern = conv.variables["params"]["kernel"]  # f32 master weights
            x = int8_conv(
                x, kern, self.stride, p, self.dilation, self.dtype
            )
        else:
            x = conv(x)
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
    """Squeeze-excite with hardcoded squeeze factor 4 (blocks.py:35).

    PARITY NOTE: the reference's ``nn.AvgPool2d((1, 1))`` (blocks.py:38)
    is an identity op — kernel 1, stride 1 — so its published SE-equipped
    weights (regnety_6p4gf/8gf/...) were trained with PER-PIXEL gating,
    not the SE paper's global pooling.  Weight-port parity requires
    reproducing that exact behavior; per-pixel gating is also pointwise,
    so it needs no special handling under spatial sharding."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        ns = nin // 4
        s = nn.Conv(ns, (1, 1), use_bias=True, dtype=self.dtype, name="squeeze")(x)
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
