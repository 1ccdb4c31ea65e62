"""Resize/sampling ops with explicit align-corners semantics.

The reference relies on torch ``F.interpolate`` (bilinear, align_corners=True
for all 4x head upsamplings and decoder fusions; align_corners=False inside
PointRend) and ``F.grid_sample`` (PointRend point sampling).  ``jax.image``
has no align_corners control, so these are built from first principles as
separable gathers — XLA fuses them into the surrounding graph.

All functions take NHWC tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "bilinear_resize",
    "nearest_resize",
    "grid_sample",
    "point_sample",
]


def _axis_weights(in_size: int, out_size: int, align_corners: bool, dtype):
    """Source indices and lerp weights for 1D resize.

    Returns (idx0, idx1, w1) such that out[i] = in[idx0[i]]*(1-w1[i]) +
    in[idx1[i]]*w1[i].
    """
    out_pos = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners and out_size > 1:
        src = out_pos * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (out_pos + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    idx0 = jnp.floor(src).astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, in_size - 1)
    w1 = (src - idx0.astype(jnp.float32)).astype(dtype)
    return idx0, idx1, w1


def bilinear_resize(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to (out_h, out_w)."""
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    if (out_h, out_w) == (h, w):
        return x
    dtype = x.dtype

    iy0, iy1, wy = _axis_weights(h, out_h, align_corners, dtype)
    ix0, ix1, wx = _axis_weights(w, out_w, align_corners, dtype)

    # rows
    top = jnp.take(x, iy0, axis=1)
    bot = jnp.take(x, iy1, axis=1)
    rows = top + (bot - top) * wy[None, :, None, None]
    # cols
    left = jnp.take(rows, ix0, axis=2)
    right = jnp.take(rows, ix1, axis=2)
    return left + (right - left) * wx[None, None, :, None]


def nearest_resize(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest-neighbor resize (torch 'nearest' semantics: floor(i*in/out))."""
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    if (out_h, out_w) == (h, w):
        return x
    iy = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return jnp.take(jnp.take(x, iy, axis=1), ix, axis=2)


def grid_sample(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample NHWC ``features`` at normalized coords in [-1, 1].

    ``coords`` has shape (N, P, 2) ordered (x, y) like torch grid_sample.
    Zero padding outside the image.  Returns (N, P, C).
    """
    n, h, w, c = features.shape
    x = coords[..., 0]
    y = coords[..., 1]

    def to_pix(v, size):
        if align_corners:
            return (v + 1.0) * (size - 1) / 2.0
        return ((v + 1.0) * size - 1.0) / 2.0

    px = to_pix(x, w)
    py = to_pix(y, h)

    def gather(iy, ix):
        # validity before clipping (zeros padding)
        valid = (
            (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
        )
        iy_c = jnp.clip(iy, 0, h - 1)
        ix_c = jnp.clip(ix, 0, w - 1)
        flat = iy_c * w + ix_c  # (N, P)
        feats = features.reshape(n, h * w, c)
        out = jnp.take_along_axis(feats, flat[..., None], axis=1)
        return out * valid[..., None].astype(features.dtype)

    if mode == "nearest":
        # torch nearest rounds half away? it uses round-half-to-even via
        # floor(x+0.5) in practice; jnp.round is half-to-even. floor(x+.5)
        iy = jnp.floor(py + 0.5).astype(jnp.int32)
        ix = jnp.floor(px + 0.5).astype(jnp.int32)
        return gather(iy, ix)

    ix0 = jnp.floor(px).astype(jnp.int32)
    iy0 = jnp.floor(py).astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1
    wx = (px - ix0.astype(px.dtype)).astype(features.dtype)
    wy = (py - iy0.astype(py.dtype)).astype(features.dtype)

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix1)
    v10 = gather(iy1, ix0)
    v11 = gather(iy1, ix1)

    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def point_sample(
    features: jnp.ndarray,
    point_coords: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample features at [0,1]x[0,1] normalized points (reference
    models/point_rend.py:35).  ``point_coords``: (N, P, 2) ordered (x, y).
    Returns (N, P, C)."""
    return grid_sample(features, 2.0 * point_coords - 1.0, mode=mode, align_corners=align_corners)
