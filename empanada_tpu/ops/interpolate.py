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
import numpy as np

__all__ = [
    "bilinear_resize",
    "nearest_resize",
    "grid_sample",
    "point_sample",
]


def _resize_matrix(in_size: int, out_size: int, align_corners: bool,
                   zeros_padding: bool = False) -> np.ndarray:
    """Dense (out, in) interpolation matrix for 1D bilinear resize.

    ``zeros_padding`` reproduces torch grid_sample's zero padding at borders
    (out-of-range corners contribute 0) instead of edge clamping — needed
    when a resize stands in for point_sample at pixel centers.
    """
    out_pos = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = out_pos * (in_size - 1) / (out_size - 1)
    else:
        src = (out_pos + 0.5) * (in_size / out_size) - 0.5
    if not zeros_padding:
        src = np.clip(src, 0.0, in_size - 1)
    idx0 = np.floor(src).astype(np.int64)
    w1 = (src - idx0).astype(np.float32)
    idx1 = idx0 + 1
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    ok0 = (idx0 >= 0) & (idx0 < in_size)
    ok1 = (idx1 >= 0) & (idx1 < in_size)
    np.add.at(mat, (rows[ok0], idx0[ok0]), (1.0 - w1)[ok0])
    np.add.at(mat, (rows[ok1], np.minimum(idx1, in_size - 1)[ok1]), w1[ok1])
    return mat


def bilinear_resize(x: jnp.ndarray, out_hw, align_corners: bool = False,
                    zeros_padding: bool = False) -> jnp.ndarray:
    """Bilinear resize of an NHWC tensor to (out_h, out_w).

    Implemented as two small dense matmuls (out = A_h @ x @ A_w^T) — the
    interpolation matrices are trace-time constants, so the resize runs on
    the MXU instead of as serialized TPU gathers (~10x faster at these
    sizes).  f32 inputs use precision=HIGHEST (exactness for torch parity);
    bf16 inputs use the fast default MXU path.
    """
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    if (out_h, out_w) == (h, w):
        return x
    dtype = x.dtype

    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    out = x
    if out_h != h:
        a_h = jnp.asarray(_resize_matrix(h, out_h, align_corners, zeros_padding), dtype)
        out = jnp.einsum("oh,nhwc->nowc", a_h, out, precision=prec)
    if out_w != w:
        a_w = jnp.asarray(_resize_matrix(w, out_w, align_corners, zeros_padding), dtype)
        out = jnp.einsum("ow,nhwc->nhoc", a_w, out, precision=prec)
    return out.astype(dtype)


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
        flat = iy_c * w + ix_c  # (N, P), in-bounds after the clip above
        feats = features.reshape(n, h * w, c)
        out = jnp.take_along_axis(
            feats, flat[..., None], axis=1, mode="promise_in_bounds"
        )
        return out * valid[..., None].astype(features.dtype)

    if mode == "nearest":
        # torch CPU grid_sample nearest uses std::nearbyint =
        # round-half-to-even; jnp.round matches (floor(x+0.5) would round
        # half-integers up, off by one pixel at exact .5 coordinates)
        iy = jnp.round(py).astype(jnp.int32)
        ix = jnp.round(px).astype(jnp.int32)
        return gather(iy, ix)
    if mode != "bilinear":
        raise ValueError(f"grid_sample mode {mode!r}: expected 'bilinear' or 'nearest'")

    ix0 = jnp.floor(px).astype(jnp.int32)
    iy0 = jnp.floor(py).astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1
    wx = (px - ix0.astype(px.dtype)).astype(features.dtype)
    wy = (py - iy0.astype(py.dtype)).astype(features.dtype)

    # NOTE: a (2,2,C)-slice lax.gather variant measured ~25% faster in
    # isolation on v5e but 4x SLOWER in-context (the sliced gather blocks
    # XLA's fusion/layout around the feature producer: 27 -> 110 ms on the
    # full MitoNet pipeline) — keep the four flat gathers.
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


def point_sample_packed(features: jnp.ndarray, point_coords: jnp.ndarray) -> jnp.ndarray:
    """``point_sample`` (bilinear, align_corners=False, zero padding) via a
    corner-packed feature map: ONE gather row per point instead of four.

    TPU gathers pay a large per-gather overhead on top of the bandwidth term
    (measured v5e, K=8192 of 128^2: 4 gathers x 257ch = 2.9 ms, 1 gather x
    1028ch = 1.6 ms), so packing the 4 bilinear corners of every source cell
    into one wide row — ``packed[a, b] = (f[a-1,b-1], f[a-1,b], f[a,b-1],
    f[a,b])`` over a zero-padded grid — trades a cheap dense concat for 3 of
    the 4 gathers.  Values and the lerp combination are identical to
    ``point_sample`` (bit-exact in eager mode); under jit the two programs
    may differ at fma-rounding level (~1e-6 rel) because XLA contracts the
    multiply-add chains independently per program.

    PRECONDITION: every coordinate lies in [0, 1] (grid pixel centers, as
    produced by ``get_uncertain_point_coords_on_grid``).  Out-of-range
    coords would index-clamp instead of zero-padding.
    """
    n, h, w, c = features.shape
    fpad = jnp.pad(features, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [
            fpad[:, : h + 1, : w + 1],   # corner (iy0, ix0)
            fpad[:, : h + 1, 1:],        # corner (iy0, ix1)
            fpad[:, 1:, : w + 1],        # corner (iy1, ix0)
            fpad[:, 1:, 1:],             # corner (iy1, ix1)
        ],
        axis=-1,
    )
    # replicate grid_sample's exact fp chain ([0,1] -> [-1,1] -> pixels) so
    # the lerp weights are bit-identical to point_sample's
    gx = 2.0 * point_coords[..., 0] - 1.0
    gy = 2.0 * point_coords[..., 1] - 1.0
    px = ((gx + 1.0) * w - 1.0) / 2.0
    py = ((gy + 1.0) * h - 1.0) / 2.0
    ix0 = jnp.floor(px).astype(jnp.int32)  # in [-1, w-1] for coords in [0,1]
    iy0 = jnp.floor(py).astype(jnp.int32)
    wx = (px - ix0.astype(px.dtype)).astype(features.dtype)[..., None]
    wy = (py - iy0.astype(py.dtype)).astype(features.dtype)[..., None]
    flat = (iy0 + 1) * (w + 1) + (ix0 + 1)
    # flat is in [0, (h+1)*(w+1)) for coords in [0,1] (see PRECONDITION);
    # the clip makes out-of-contract coords read defined (wrong, matching
    # the old clamped-gather behavior) rather than undefined memory, and
    # keeps promise_in_bounds trivially true so XLA still drops its clamp
    flat = jnp.clip(flat, 0, (h + 1) * (w + 1) - 1)
    v = jnp.take_along_axis(
        packed.reshape(n, (h + 1) * (w + 1), 4 * c),
        flat[..., None],
        axis=1,
        mode="promise_in_bounds",
    )
    v00 = v[..., :c]
    v01 = v[..., c : 2 * c]
    v10 = v[..., 2 * c : 3 * c]
    v11 = v[..., 3 * c :]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
