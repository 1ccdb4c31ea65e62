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

__all__ = ["kth_largest", "kth_smallest_nonneg", "top_k_mask_indices",
           "top_k_neg_bf16_indices"]


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


def top_k_mask_indices(x: jnp.ndarray, k: int, block: int = 128) -> jnp.ndarray:
    """Indices of the k largest entries per row, WITHOUT a sort.

    Exact threshold via radix select, then compaction by block-rank
    arithmetic: per-``block`` counts -> exclusive scan -> for each output
    slot a searchsorted block lookup + in-block rank match.

    MEASURED VERDICT (v5e): the (k, block) row gather serializes on TPU
    and makes this ~8x SLOWER than ``jax.lax.top_k``'s bitonic sort at
    PointRend sizes (17.3 vs 2.2 ms for 8x8192-of-262144) — compaction is
    gather-bound on this hardware, the sort is the right tool.  Kept as
    tested infrastructure (and the right formulation on gather-friendly
    backends); the hot paths use top_k for indices and the radix select
    for threshold values only.

    Returns (n, k) int32 indices: the strictly-above-threshold positions in
    ascending (scanline) order first, then tie positions (ascending among
    themselves) filling the remaining slots — NOT globally sorted when ties
    fill the tail.  When the k-th value ties, an arbitrary k-subset of the
    tied positions is selected (torch.topk's tie resolution is likewise
    unspecified — see PARITY.md "PointRend top-k ties").  Rows with fewer
    than k finite entries repeat index 0 in the tail slots; ``k >= m``
    pads with index 0 beyond the first m slots.
    """
    n, m = x.shape
    if k >= m:
        base = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (n, m))
        if k == m:
            return base
        return jnp.concatenate(
            [base, jnp.zeros((n, k - m), dtype=jnp.int32)], axis=1
        )
    assert m % block == 0
    kth = kth_largest(x, k)
    xf = x.astype(jnp.float32)
    strict = xf > kth[:, None]                     # < k set bits, all required
    ties = xf == kth[:, None]                      # boundary values

    def nth_set_bit(mask, slots):
        """Per row: index of the (slots[i]+1)-th set bit, scanline order."""
        mb = mask.reshape(n, m // block, block)
        counts = mb.sum(axis=2, dtype=jnp.int32)
        offs = jnp.cumsum(counts, axis=1) - counts   # exclusive scan
        ranks = jnp.cumsum(mb, axis=2, dtype=jnp.int32)

        def per_row(offs_r, ranks_r, mb_r, slots_r):
            blk = (
                jnp.searchsorted(offs_r, slots_r, side="right").astype(jnp.int32)
                - 1
            )
            blk = jnp.clip(blk, 0, m // block - 1)
            lane_rank = slots_r - offs_r[blk] + 1
            hit = (ranks_r[blk] == lane_rank[:, None]) & mb_r[blk]
            lane = jnp.argmax(hit, axis=1).astype(jnp.int32)
            found = hit.any(axis=1)
            return jnp.where(found, blk * block + lane, 0)

        return jax.vmap(per_row)(offs, ranks, mb, slots)

    # slots [0, c_strict) take the strict set; the rest fill from the ties
    # (the strict set has < k members by definition of the k-th value; any
    # tie subset is a legitimate top-k — torch.topk's tie resolution is
    # likewise unspecified)
    c_strict = strict.sum(axis=1, dtype=jnp.int32)[:, None]  # (n, 1)
    slots = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (n, k))
    idx_strict = nth_set_bit(strict, jnp.minimum(slots, c_strict - 1))
    idx_tie = nth_set_bit(ties, jnp.maximum(slots - c_strict, 0))
    return jnp.where(slots < c_strict, idx_strict, idx_tie)


_SEG = 65536  # segment length: local indices must fit 16 bits


def top_k_neg_bf16_indices(u: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k largest entries per row of non-positive bf16 ``u``
    — exact, via a single-operand segment-packed sort.

    ``jax.lax.top_k``'s index output forces a (value, iota) PAIR sort
    (~2.2 ms for 8x262144-of-8192 on v5e).  When values are bf16 and
    non-positive (PointRend uncertainties are ``-|logit|``), value and
    index pack into ONE int32 key per element — 16 monotone value bits
    above 16 inverted local-index bits — so each 65536-element segment
    sorts a single int32 operand, and a second small top_k merges the
    per-segment survivors.  ~2x less sort traffic at PointRend sizes.

    Ordering: by value descending, then by index ascending WITHIN a
    segment, then by segment — a different tie-subset than top_k's global
    index order when equal values straddle the k boundary across
    segments, which is inside the documented tie-divergence class
    (PARITY.md "PointRend top-k ties"; torch.topk is likewise
    unspecified).  Requires u.dtype == bfloat16, all values <= 0 (incl.
    -0.0 — ``-jnp.abs`` always produces the sign bit), m % 65536 == 0 and
    k <= m; callers fall back to ``jax.lax.top_k`` otherwise.
    """
    n, m = u.shape
    assert u.dtype == jnp.bfloat16 and m % _SEG == 0 and k <= m
    s = m // _SEG
    bits = jax.lax.bitcast_convert_type(u, jnp.uint16).astype(jnp.uint32)
    # monotone key for non-positive bf16: sign bit is always set, so the
    # IEEE trick reduces to plain inversion (bigger key = bigger value);
    # the result fits 15 bits, keeping the packed int32 positive
    key16 = (~bits) & jnp.uint32(0x7FFF)
    local = jnp.arange(m, dtype=jnp.uint32) % _SEG
    packed = ((key16 << 16) | (jnp.uint32(_SEG - 1) - local)).astype(jnp.int32)
    per_seg = jax.lax.top_k(packed.reshape(n, s, _SEG), min(k, _SEG))[0]
    cand = per_seg.reshape(n, -1)
    top_vals, top_pos = jax.lax.top_k(cand, k)
    seg = (top_pos // min(k, _SEG)).astype(jnp.int32)
    local_idx = jnp.int32(_SEG - 1) - (top_vals & jnp.int32(0xFFFF))
    return seg * _SEG + local_idx


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
