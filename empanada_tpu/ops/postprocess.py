"""Jitted panoptic post-processing.

TPU-first redesign of the reference's TorchScript kernels
(``empanada/inference/postprocess.py``): everything below runs inside one XLA
graph with *static shapes* — no ``torch.nonzero`` / ``torch.unique`` / Python
dict loops:

- center NMS keeps the max-pool-equality trick but emits a fixed-size top-K
  center list (ascending flat index = the reference's scanline order) plus a
  validity mask instead of a dynamic (K, 2) tensor
  (ref ``find_instance_center:38``);
- offset grouping computes a running argmin over center chunks so the
  (H*W, K) distance matrix never materializes
  (ref ``group_pixels:118`` / ``chunked_pixel_grouping:78``);
- semantic/instance merging replaces the per-instance ``torch.mode`` loop
  with one scatter-add histogram + argmax, and the per-class sequential
  instance renumbering with an exclusive cumsum over the class one-hot
  (ref ``merge_semantic_and_instance:223``).

All image tensors are NHWC; semantic/instance maps are (N, H, W).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from empanada_tpu.models.blocks import max_pool_2d
from empanada_tpu.ops.interpolate import nearest_resize

__all__ = [
    "factor_pad",
    "bucket_dim",
    "logits_to_prob",
    "harden_seg",
    "harden_logits",
    "to_median_space",
    "harden_median_space",
    "find_instance_center",
    "group_pixels",
    "get_instance_cells",
    "merge_semantic_and_instance",
    "merge_semantic_and_instance_coarse",
    "get_panoptic_segmentation",
    "encode_runs_packed",
]


# ~25%-growth bucket ladder (in units of padding_factor).  Bucketing bounds
# the number of distinct jit shapes for ragged workloads at the cost of up to
# ~25% extra padded area per dim; exact factor padding stays the default.
_BUCKET_MULTIPLES = (1, 2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32,
                     40, 48, 56, 64, 80, 96, 112, 128)


def bucket_dim(n: int, factor: int) -> int:
    """Smallest bucket size >= n: ``factor`` times a ladder multiple."""
    m = -(-int(n) // factor)
    for b in _BUCKET_MULTIPLES:
        if b >= m:
            return b * factor
    return (-(-m // 16) * 16) * factor


def factor_pad(x: jnp.ndarray, factor: int = 16, buckets: bool = False) -> jnp.ndarray:
    """Zero-pad H and W (axes 1, 2 of NHWC) up to multiples of ``factor``
    (or, with ``buckets``, up to the next ladder size — see bucket_dim)."""
    h, w = x.shape[1], x.shape[2]
    if buckets:
        pad_b = bucket_dim(h, factor) - h
        pad_r = bucket_dim(w, factor) - w
    else:
        pad_b = (-h) % factor
        pad_r = (-w) % factor
    if pad_b == 0 and pad_r == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (0, pad_b)
    cfg[2] = (0, pad_r)
    return jnp.pad(x, cfg)


def logits_to_prob(logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax over channels if multiclass else sigmoid (engines.py:22)."""
    if logits.shape[-1] > 1:
        return jax.nn.softmax(logits, axis=-1)
    return jax.nn.sigmoid(logits)


def harden_seg(sem_prob: jnp.ndarray, confidence_thr: float = 0.5) -> jnp.ndarray:
    """(N, H, W, C) probabilities -> (N, H, W) integer labels
    (engines.py:114: argmax if multiclass, threshold if binary)."""
    if sem_prob.shape[-1] > 1:
        return jnp.argmax(sem_prob, axis=-1).astype(jnp.int32)
    return (sem_prob[..., 0] >= confidence_thr).astype(jnp.int32)


def harden_logits(sem_logits: jnp.ndarray, confidence_thr: float = 0.5) -> jnp.ndarray:
    """Exact logit-space equivalent of
    ``harden_seg(logits_to_prob(sem_logits), confidence_thr)``.

    Multiclass: ``argmax(softmax(x)) == argmax(x)`` identically.  Binary:
    ``sigmoid(x) >= t  <=>  x >= log(t / (1 - t))`` by monotonicity — exact
    in real arithmetic for every t.  The computed-probability path is NOT
    the real-arithmetic reference in low precision: bf16 ``sigmoid(x)``
    rounds to exactly 0.5 for |x| < ~2e-3, flipping those near-boundary
    pixels, while the logit comparison (widened to f32) decides them the
    way exact arithmetic would — so this path is both cheaper AND more
    faithful.  Skipping the probability round-trip keeps a full-res
    f32/bf16 probability map out of HBM on the hot postprocess path
    (VERDICT r4 #1); the reference always materializes it
    (empanada/inference/engines.py:22,114).
    """
    if sem_logits.shape[-1] > 1:
        return jnp.argmax(sem_logits, axis=-1).astype(jnp.int32)
    t = float(confidence_thr)
    assert 0.0 < t < 1.0, f"confidence_thr {t} outside (0, 1)"
    logit_thr = math.log(t / (1.0 - t))
    # compare in f32: widening the logit is exact, and beats rounding the
    # threshold into bf16 (boundary pixels would flip vs the prob path)
    return (
        sem_logits[..., 0].astype(jnp.float32) >= jnp.float32(logit_thr)
    ).astype(jnp.int32)


def to_median_space(sem_logits: jnp.ndarray) -> jnp.ndarray:
    """Representation a sliding per-pixel median may be taken over such that
    hardening afterwards (:func:`harden_median_space`) matches the
    reference's median-of-probabilities exactly.

    Binary: raw logits — an odd-window median is a per-pixel SELECTION,
    which commutes with the strictly monotone sigmoid, so probabilities
    never need materializing.  Multiclass: softmax probabilities — the
    per-channel median does NOT commute through softmax (channels are
    medianed independently), so the probability map is required.
    """
    if sem_logits.shape[-1] > 1:
        return jax.nn.softmax(sem_logits, axis=-1)
    return sem_logits


def harden_median_space(sem: jnp.ndarray, confidence_thr: float = 0.5) -> jnp.ndarray:
    """Harden a tensor produced by medianing :func:`to_median_space` output:
    logit-space threshold when binary, probability argmax when multiclass."""
    if sem.shape[-1] > 1:
        return harden_seg(sem, confidence_thr)
    return harden_logits(sem, confidence_thr)


def find_instance_center(
    ctr_hmp: jnp.ndarray,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    max_centers: int = 256,
    return_count: bool = False,
):
    """Center NMS with a fixed-size output.

    Args:
        ctr_hmp: (1, H, W, 1) heatmap probabilities.
        max_centers: static K; up to K surviving peaks are returned in
            ascending flat-index (scanline) order, matching the reference's
            ``torch.nonzero`` ordering.
        return_count: also return the TOTAL number of surviving peaks (a
            device scalar) so callers can detect when the fixed K dropped
            centers — the reference has no cap, so silent truncation would
            be a real divergence in the 257..~label_divisor range.

    Returns:
        centers: (K, 2) float32 (y, x) peak coordinates (0 where invalid).
        valid: (K,) bool.
        n_peaks (when return_count): () int32 total surviving peaks.
    """
    h, w = ctr_hmp.shape[1], ctr_hmp.shape[2]
    t = jnp.where(ctr_hmp > threshold, ctr_hmp, -1.0)
    pooled = max_pool_2d(t, nms_kernel, 1, nms_kernel // 2)
    if nms_kernel % 2 == 0:
        # even kernels pool to (H+1, W+1); clip the last row/column to keep
        # the size (reference postprocess.py:63-66)
        pooled = pooled[:, :-1, :-1, :]
    keep = (t == pooled) & (t > 0)
    keep_flat = keep[0, :, :, 0].reshape(-1)

    idx = jnp.arange(h * w, dtype=jnp.int32)
    # top_k over -(flat index) of kept peaks -> ascending scanline order
    neg_big = jnp.int32(-(2**31) + 1)
    scores = jnp.where(keep_flat, -idx, neg_big)
    # thin maps (ortho-plane slices of short volumes) can have fewer pixels
    # than max_centers; clamp k and pad back so output shapes stay static
    k = min(max_centers, h * w)
    top = jax.lax.top_k(scores, k)[0]
    if k < max_centers:
        top = jnp.concatenate([top, jnp.full((max_centers - k,), neg_big, jnp.int32)])
    valid = top != neg_big
    flat_idx = jnp.where(valid, -top, 0)
    centers = jnp.stack([flat_idx // w, flat_idx % w], axis=-1).astype(jnp.float32)
    if return_count:
        return centers, valid, keep_flat.sum(dtype=jnp.int32)
    return centers, valid


def group_pixels(
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    offsets: jnp.ndarray,
    step: int = 1,
    pixel_chunk: int = 16384,
) -> jnp.ndarray:
    """Assign each pixel the id (1..K) of its nearest offset-shifted center.

    Args:
        centers: (K, 2) float (y, x) in the offsets' grid units.
        valid: (K,) bool.
        offsets: (1, H, W, 2) channel order (dy, dx), in full-resolution units.
        step: grid step (4 for the coarse-boundaries path where offsets are at
            1/4 resolution but predict full-res displacements).

    Returns:
        (1, H, W) int32 instance ids (0 only when no center is valid).
    """
    h, w = offsets.shape[1], offsets.shape[2]
    k = centers.shape[0]

    yy = (jnp.arange(h, dtype=jnp.float32) * step)[:, None]
    xx = (jnp.arange(w, dtype=jnp.float32) * step)[None, :]
    loc_y = (yy + offsets[0, :, :, 0]).reshape(-1)
    loc_x = (xx + offsets[0, :, :, 1]).reshape(-1)

    ctr_y = centers[:, 0] * step
    ctr_x = centers[:, 1] * step
    inf = jnp.float32(1e30)

    n_px = h * w
    pad = (-n_px) % pixel_chunk
    loc_y = jnp.pad(loc_y, (0, pad))
    loc_x = jnp.pad(loc_x, (0, pad))
    n_chunks = (n_px + pad) // pixel_chunk

    def chunk_argmin(carry, chunk):
        cy, cx = chunk
        d2 = (cy[:, None] - ctr_y[None, :]) ** 2 + (cx[:, None] - ctr_x[None, :]) ** 2
        d2 = jnp.where(valid[None, :], d2, inf)
        return carry, jnp.argmin(d2, axis=1).astype(jnp.int32)

    chunks_y = loc_y.reshape(n_chunks, pixel_chunk)
    chunks_x = loc_x.reshape(n_chunks, pixel_chunk)
    _, ids = jax.lax.scan(chunk_argmin, None, (chunks_y, chunks_x))
    ids = ids.reshape(-1)[:n_px] + 1

    any_valid = valid.any()
    ids = jnp.where(any_valid, ids, 0)
    return ids.reshape(1, h, w)


def get_instance_cells(
    ctr_hmp: jnp.ndarray,
    offsets: jnp.ndarray,
    coarse_boundaries: bool = True,
    upsampling: int = 1,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    max_centers: int = 256,
    return_overflow: bool = False,
    keep_coarse: bool = False,
):
    """Reference ``PanopticDeepLabRenderEngine.get_instance_cells``
    (engines.py:257): NMS + grouping (at 1/4 res when coarse) + nearest
    upsample of the id map by ``upsampling * step``.

    With ``return_overflow``, also returns the number of NMS-surviving
    centers DROPPED by the static ``max_centers`` cap (() int32 device
    scalar; 0 in the common case).

    With ``keep_coarse``, the id map is returned AT THE GROUPING GRID
    (no nearest upsample) for consumption by
    :func:`merge_semantic_and_instance_coarse` with
    ``step = upsampling * (4 if coarse_boundaries else 1)`` — the fused
    merge never materializes the full-resolution instance map."""
    step = 4 if coarse_boundaries else 1
    centers, valid, n_peaks = find_instance_center(
        ctr_hmp, threshold, nms_kernel, max_centers, return_count=True
    )
    cells = group_pixels(centers, valid, offsets, step=step)
    scale = int(upsampling * step)
    if scale > 1 and not keep_coarse:
        cells = nearest_resize(
            cells[..., None], (cells.shape[1] * scale, cells.shape[2] * scale)
        )[..., 0]
    if return_overflow:
        return cells, jnp.maximum(n_peaks - valid.sum(dtype=jnp.int32), 0)
    return cells


def _thing_mask(sem: jnp.ndarray, thing_list: Sequence[int]) -> jnp.ndarray:
    m = jnp.zeros_like(sem, dtype=bool)
    for t in thing_list:
        m = m | (sem == t)
    return m


def merge_semantic_and_instance(
    sem: jnp.ndarray,
    ins: jnp.ndarray,
    label_divisor: int,
    thing_list: Sequence[int],
    stuff_area: int,
    void_label: int,
    num_classes: int,
    max_centers: int = 256,
) -> jnp.ndarray:
    """Merge hardened semantics with the class-agnostic instance map.

    ``sem``/``ins``: (1, H, W) int32; ``ins`` is already restricted to thing
    pixels (value 0 elsewhere).  Static args: thing_list, num_classes, K.
    """
    sem = sem.astype(jnp.int32)
    ins = ins.astype(jnp.int32)
    semantic_thing = _thing_mask(sem, thing_list)
    thing_seg = ins > 0
    thing_px = thing_seg & semantic_thing

    k = max_centers
    c = num_classes
    # per-(instance, class) pixel histogram as a one-hot matmul — scatter-add
    # serializes on TPU (~4x slower) while the MXU eats this for free; bf16
    # one-hots are exact 0/1 and f32 accumulation is exact below 2^24 pixels
    ins_flat = ins.reshape(-1)
    sem_flat = sem.reshape(-1)
    thing_flat = thing_px.reshape(-1)
    oh_ins = (ins_flat[:, None] == jnp.arange(1, k + 1)[None, :]).astype(jnp.bfloat16)
    oh_sem = (
        (sem_flat[:, None] == jnp.arange(c)[None, :]) & thing_flat[:, None]
    ).astype(jnp.bfloat16)
    counts = jnp.einsum(
        "pk,pc->kc", oh_ins, oh_sem, preferred_element_type=jnp.float32
    )  # (K, C), exact integer values

    inst_size = counts.sum(axis=1)
    inst_valid = inst_size > 0
    inst_class = jnp.argmax(counts, axis=1).astype(jnp.int32)  # majority class

    # per-class sequential renumbering in ascending instance-id order
    class_onehot = jax.nn.one_hot(inst_class, c, dtype=jnp.int32) * inst_valid[:, None]
    prior_same_class = jnp.cumsum(class_onehot, axis=0) - class_onehot
    new_ids = (prior_same_class * class_onehot).sum(axis=1) + 1  # (K,)

    # per-pixel pan id via matvecs on the same one-hot (a 2M-element gather
    # from the id table costs ~20ms on TPU; this costs ~1ms).  The id is
    # computed as class * divisor + new_id from TWO small-valued matvecs:
    # TPU default matmul precision feeds bf16 into the MXU, which is exact
    # for integer values <= 256 but would round a combined id like 1001 to
    # 1000 — silently merging instances on device while CPU tests stay
    # exact.  Larger static bounds upgrade to HIGHEST (multi-pass f32).
    prec_cls = None if c <= 256 else jax.lax.Precision.HIGHEST
    prec_new = None if k <= 256 else jax.lax.Precision.HIGHEST
    pan_cls = jnp.einsum(
        "pk,k->p", oh_ins, inst_class.astype(jnp.float32),
        precision=prec_cls, preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    pan_new = jnp.einsum(
        "pk,k->p", oh_ins, new_ids.astype(jnp.float32),
        precision=prec_new, preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    pan_thing = (pan_cls * label_divisor + pan_new).reshape(sem.shape)

    pan = jnp.full_like(sem, void_label)
    # thing_px implies ins > 0, so pan_thing is always a real instance here
    pan = jnp.where(thing_px, pan_thing, pan)

    # stuff classes: paint class*divisor where area (outside things) is large
    for class_id in range(num_classes):
        if class_id in thing_list:
            continue
        stuff_mask = (sem == class_id) & (~thing_seg)
        area = stuff_mask.sum()
        pan = jnp.where(stuff_mask & (area >= stuff_area), class_id * label_divisor, pan)
    return pan


def merge_semantic_and_instance_coarse(
    sem: jnp.ndarray,
    cells_coarse: jnp.ndarray,
    label_divisor: int,
    thing_list: Sequence[int],
    stuff_area: int,
    void_label: int,
    num_classes: int,
    max_centers: int = 256,
    step: int = 4,
) -> jnp.ndarray:
    """Fused, exact equivalent of::

        cells = nearest_up(cells_coarse, step)           # block replicate
        ins = jnp.where(_thing_mask(sem, thing_list), cells, 0)
        merge_semantic_and_instance(sem, ins, ...)

    with every (pixels x K) one-hot contraction computed on the COARSE
    grouping grid (1/step resolution).  The per-(instance, class) histogram
    uses step^2-block class counts — exact because the block-replicated
    instance id is constant over each step x step block — and the per-pixel
    pan ids are computed coarse then block-replicated.  At the production
    step of 4 this cuts the merge stage's HBM traffic ~16x; merge is the
    memory-bound postprocess stage (BENCH_r03 stages_2d: postprocess MFU
    0.007 against its own roofline bound of 0.059).  Reference kernel
    being replaced: ``empanada/inference/postprocess.py:223`` (torch.mode
    loop over instances).

    Exactness: block class counts are <= step^2 <= 256 (bf16-exact); the
    one-hot einsum accumulates in f32 (exact integers < 2^24); instance
    class/id matvecs carry the same MXU-precision guards as the dense
    merge.  ``sem``: (1, H, W) hardened labels; ``cells_coarse``:
    (1, H/step, W/step) grouping ids (1..K, 0 = no center).
    """
    if step == 1 or step > 16:
        # step > 16 would push block class counts past bf16-exact 256;
        # upsample and take the dense merge (exotic upsampling factors only)
        cells = cells_coarse
        if step > 1:
            n0, hc0, wc0 = cells.shape
            cells = jnp.broadcast_to(
                cells[:, :, None, :, None], (n0, hc0, step, wc0, step)
            ).reshape(n0, hc0 * step, wc0 * step)
        ins = jnp.where(_thing_mask(sem, thing_list), cells, 0)
        return merge_semantic_and_instance(
            sem, ins, label_divisor, thing_list, stuff_area, void_label,
            num_classes, max_centers,
        )
    sem = sem.astype(jnp.int32)
    cells = cells_coarse.astype(jnp.int32)
    n, big_h, big_w = sem.shape
    hc, wc = cells.shape[1], cells.shape[2]
    assert big_h == hc * step and big_w == wc * step, (sem.shape, cells.shape, step)
    semantic_thing = _thing_mask(sem, thing_list)

    k = max_centers
    c = num_classes

    def block_up(x):  # nearest upsample by integer step = block replicate
        return jnp.broadcast_to(
            x[:, :, None, :, None], (n, hc, step, wc, step)
        ).reshape(n, big_h, big_w)

    # step^2-block class counts restricted to thing-class pixels:
    # (N, hc, wc, C), values <= step^2 (bf16-exact integers)
    sem_oh = (sem[..., None] == jnp.arange(c)) & semantic_thing[..., None]
    blockcnt = (
        sem_oh.reshape(n, hc, step, wc, step, c)
        .sum(axis=(2, 4), dtype=jnp.int32)
        .astype(jnp.bfloat16)
    )

    ins_flat = cells.reshape(-1)
    oh_ins = (ins_flat[:, None] == jnp.arange(1, k + 1)[None, :]).astype(
        jnp.bfloat16
    )  # (p, K) on the coarse grid — step^2x smaller than the dense merge's
    counts = jnp.einsum(
        "pk,pc->kc", oh_ins, blockcnt.reshape(-1, c),
        preferred_element_type=jnp.float32,
    )  # identical values to the dense merge's full-res histogram

    inst_size = counts.sum(axis=1)
    inst_valid = inst_size > 0
    inst_class = jnp.argmax(counts, axis=1).astype(jnp.int32)
    class_onehot = jax.nn.one_hot(inst_class, c, dtype=jnp.int32) * inst_valid[:, None]
    prior_same_class = jnp.cumsum(class_onehot, axis=0) - class_onehot
    new_ids = (prior_same_class * class_onehot).sum(axis=1) + 1

    # same MXU-precision guards as merge_semantic_and_instance (bf16 MXU
    # inputs are exact only for integer values <= 256)
    prec_cls = None if c <= 256 else jax.lax.Precision.HIGHEST
    prec_new = None if k <= 256 else jax.lax.Precision.HIGHEST
    pan_cls = jnp.einsum(
        "pk,k->p", oh_ins, inst_class.astype(jnp.float32),
        precision=prec_cls, preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    pan_new = jnp.einsum(
        "pk,k->p", oh_ins, new_ids.astype(jnp.float32),
        precision=prec_new, preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    pan_thing_c = (pan_cls * label_divisor + pan_new).reshape(n, hc, wc)

    thing_px = block_up(cells > 0) & semantic_thing
    pan = jnp.full_like(sem, void_label)
    pan = jnp.where(thing_px, block_up(pan_thing_c), pan)

    # stuff classes (ins is pre-masked in every caller, so thing_seg ==
    # thing_px — same semantics as the dense merge's call sites)
    for class_id in range(num_classes):
        if class_id in thing_list:
            continue
        stuff_mask = (sem == class_id) & (~thing_px)
        area = stuff_mask.sum()
        pan = jnp.where(stuff_mask & (area >= stuff_area), class_id * label_divisor, pan)
    return pan


def get_panoptic_segmentation(
    sem: jnp.ndarray,
    ctr_hmp: jnp.ndarray,
    offsets: jnp.ndarray,
    thing_list: Sequence[int],
    label_divisor: int,
    stuff_area: int,
    void_label: int,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    num_classes: int = 2,
    max_centers: int = 256,
) -> jnp.ndarray:
    """Full pipeline on hardened semantics (reference postprocess.py:298).

    Args:
        sem: (1, H, W) int hardened semantic labels.
        ctr_hmp: (1, H, W, 1); offsets: (1, H, W, 2).

    Returns:
        (1, H, W) int32 panoptic map.
    """
    semantic_thing = _thing_mask(sem, thing_list)
    centers, valid = find_instance_center(ctr_hmp, threshold, nms_kernel, max_centers)
    cells = group_pixels(centers, valid, offsets, step=1)
    ins = jnp.where(semantic_thing, cells, 0)
    return merge_semantic_and_instance(
        sem, ins, label_divisor, thing_list, stuff_area, void_label,
        num_classes, max_centers,
    )


def encode_runs_packed(pan: jnp.ndarray, max_runs: int) -> jnp.ndarray:
    """Device-side per-row run-length compaction of a panoptic map batch.

    Replaces the dense int32 device->host transfer of the 3D pipeline with a
    packed int16 buffer (~8x smaller at max_runs = W/8), decoded on the host
    by ``core.labeling.decode_runs_packed`` straight into the run-based RLE
    pipeline (the reference ships dense maps per slice,
    empanada_napari/inference.py:526-543).

    Boundary extraction is branch-free on the MXU-friendly path: run starts
    are found with a per-row ``top_k`` over (W - col) scores instead of a
    scatter, so starts come out column-ascending per row.

    Args:
        pan: (B, H, W) integer panoptic maps; values must fit UNSIGNED
             16-bit (num_classes * label_divisor + max_centers <= 65535 —
             the caller checks and falls back to dense transfer otherwise;
             the decoder reads values back with ``& 0xFFFF``).  Only run
             starts (column indices, < W) are bounded by signed int16.
        max_runs: per-row run capacity R. Rows with more runs signal
             overflow via their count; the caller falls back to dense.

    Returns:
        (B, H, 2R + 1) int16: ``[starts(R) | values(R) | count(1)]`` per
        row. Invalid slots hold start = W (sentinel) / value = 0; count is
        the TRUE number of runs in the row (may exceed R on overflow).
    """
    b, h, w = pan.shape
    col = jnp.arange(w, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((b, h, 1), bool), pan[..., 1:] != pan[..., :-1]], axis=-1
    )
    # top_k of (w - col) over boundary positions -> first R starts, ascending
    score = jnp.where(boundary, w - col, 0)
    topv, _ = jax.lax.top_k(score, max_runs)           # (B, H, R) desc
    valid = topv > 0
    starts = jnp.where(valid, w - topv, w)             # sentinel w
    vals = jnp.take_along_axis(pan, jnp.minimum(starts, w - 1), axis=-1)
    vals = jnp.where(valid, vals, 0)
    counts = boundary.sum(axis=-1, dtype=jnp.int32)    # true count (overflow check)
    return jnp.concatenate(
        [
            starts.astype(jnp.int16),
            vals.astype(jnp.int16),
            counts[..., None].astype(jnp.int16),
        ],
        axis=-1,
    )
