"""Order-statistic selection without sorting.

``jax.lax.top_k`` on TPU lowers to a full bitonic sort — ~5 ms for
8x262144 f32 on v5e.  PointRend's dense refinement path only needs the
K-th VALUE (the mask is ``uncertainty >= kth``), not the sorted indices,
so an exact radix-select (binary search on the monotone bit encoding of
f32) does the job in 32 cheap masked reductions (~10x faster, and the
passes fuse into neighbouring elementwise work).

Reference context: empanada/models/point_rend.py:109
(get_uncertain_point_coords_on_grid) uses torch.topk; here the top-K
*set* is identified by thresholding at the exact K-th value instead
(ties select a superset — see PARITY.md "PointRend top-k ties").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kth_largest", "kth_smallest_nonneg"]


def _monotone_key(x: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving f32 -> uint32 map (IEEE-754 total order trick)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = (bits >> 31) == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _key_to_float(key: jnp.ndarray) -> jnp.ndarray:
    neg = (key >> 31) == 0
    bits = jnp.where(neg, ~key, key & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def kth_largest(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th largest value per row of ``x`` (n, m); k is 1-indexed.

    Equivalent to ``jax.lax.top_k(x, k)[0][:, -1]`` (NaN-free input).
    If ``k >= m`` returns the row minimum.
    """
    n, m = x.shape
    if k >= m:
        return jnp.min(x.astype(jnp.float32), axis=1)
    key = _monotone_key(x)

    def body(i, t):
        cand = t | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum((key >= cand[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(cnt >= k, cand, t)

    t = jax.lax.fori_loop(0, 32, body, jnp.zeros((n,), jnp.uint32))
    return _key_to_float(t)


def kth_smallest_nonneg(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th smallest value per row for NON-NEGATIVE ``x`` (n, m).

    For non-negative f32 the raw bit pattern is already monotone, so the
    radix select runs directly on 31 bits.  k is 1-indexed; ``k >= m``
    returns the row maximum.
    """
    n, m = x.shape
    if k >= m:
        return jnp.max(x.astype(jnp.float32), axis=1)
    key = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)

    # minimal v with count(key <= v) >= k, built MSB-first: keep a bit 0
    # whenever enough keys lie strictly below the candidate prefix
    def body(i, t):
        cand = t | (jnp.uint32(1) << (30 - i))
        cnt = jnp.sum((key < cand[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(cnt >= k, t, cand)

    t = jax.lax.fori_loop(0, 31, body, jnp.zeros((n,), jnp.uint32))
    return jax.lax.bitcast_convert_type(t, jnp.float32)
