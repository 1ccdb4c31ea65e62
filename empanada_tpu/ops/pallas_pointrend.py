"""Fused Pallas TPU kernel for PointRend eval-mode subdivision.

The reference eval loop (empanada/models/point_rend.py:191, detectron2
PointRend) is: 2x-upsample the semantic logits, pick the K most uncertain
points, re-predict them with a small MLP over bilinearly-sampled decoder
features, scatter back.  On TPU both prior formulations are memory-bound:

- sparse (gather/scatter the K points): XLA lowers arbitrary-index
  gathers to serialized HBM dynamic-slices (~5 ms per step at K=8192,
  C=256), and top_k is a full sort (~4 ms);
- dense (run the MLP on every upsampled pixel, mask with the K-th
  uncertainty): streams multi-hundred-MB activation tensors through HBM
  (~7.5 ms for 8x256^2x256).

This kernel is the TPU-native formulation: the refine mask is a
*threshold* at the exact K-th uncertainty value (radix-select, no sort —
ops/select.py), and refinement runs densely but PER TILE, entirely in
VMEM:

  grid (batch, tile) over the upsampled plane
    - tile has no uncertain point  -> copy the upsampled logits through
      (no feature DMA, no MLP: compute and HBM traffic scale with the
      boundary area, exactly PointRend's premise)
    - else -> DMA the feature window for this tile HBM->VMEM, bilinearly
      interpolate it in-register (static-phase lerps), run the
      point-head MLP on the MXU, and blend refined logits where the
      mask is set.

Layout tricks (Mosaic rejects lane-1 reshapes like (TH,TW)->(P,1)):

- the coarse logit plane rides along as feature channel F inside a
  128-channel zero blockadded by ``pack_features`` — its bilinear
  zeros-padding interpolation is then EXACTLY the reference's
  ``point_sample(coarse)``, and the MLP consumes it by augmenting each
  weight matrix with a [wc; 0...] row block, i.e. the coarse column is
  accumulated inside the same MXU f32 accumulation as the reference's
  ``concat([x, coarse]) @ W``;
- the predictor output (1 logit) is broadcast across all 128 lanes by
  weight replication and extracted back to the (TH, TW) tile with an
  eye-mask lane reduction.

Semantics match the dense formulation in models/point_rend.py (mask is
``uncertainty >= kth`` — a tie-superset of the reference's exact-K top-k;
see PARITY.md).  Single-logit models only (num_classes == 1: MitoNet /
NucleoNet / DropNet-class nets); the flax head falls back to the XLA
paths otherwise.

Reference hot-path citations: torch.topk + point_sample + scatter_
(empanada/models/point_rend.py:109-139, 223-265).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; CPU environments run interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except ImportError:  # pragma: no cover
    pltpu = None
    _VMEM = _SMEM = None
_ANY = pl.ANY

from empanada_tpu.ops.interpolate import bilinear_resize
from empanada_tpu.ops.select import kth_smallest_nonneg

__all__ = [
    "PAD",
    "fused_step_supported",
    "fused_refine_step",
    "pack_features",
]

PAD = 16          # zero padding of the packed feature map on each side
TILE_H = 16       # output-tile rows (skip granularity: TILE_H x TILE_W px)
TILE_W = 128      # output-tile cols (lane dim)
_CCH = 128        # channel block appended for the coarse logit plane
_PCHUNK = 2048    # MLP point-chunk (bounds f32 intermediates in VMEM)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _axis_phases(sf: int, tile_out: int):
    """Static tap geometry for one axis of a 2x/4x/8x bilinear upsample.

    Output position R = i*tile_out + r samples source (unpadded) at
    (R+0.5)/sf - 0.5; in padded coords the first tap for r is
    i*(tile_out//sf) + rel[r] with rel independent of the tile index i.
    Taps repeat with phase p = r % sf, so the interleaved result is
    built from sf static-slice lerps.  Returns (ts, off, ws, phases):
    the window for tile i is padded rows [i*ts + off, i*ts + off + ws)
    and phases[p] = (first-tap offset within the window, lerp weight).
    """
    assert tile_out % sf == 0
    ts = tile_out // sf
    rel, frac = [], []
    for r in range(tile_out):
        src = (r + 0.5) / sf - 0.5
        i0 = math.floor(src)
        rel.append(i0 + PAD)
        frac.append(src - i0)
    off = (min(rel) // 8) * 8
    assert off >= 0
    ws = _round_up(max(rel) - off + 2, 8)
    assert off + ws - ts <= 2 * PAD  # window always inside the padded map
    phases = [(rel[p] - off, frac[p]) for p in range(sf)]
    for r in range(tile_out):  # phase structure sanity
        assert rel[r] - off == phases[r % sf][0] + (r // sf)
        assert abs(frac[r] - phases[r % sf][1]) < 1e-9
    return ts, off, ws, phases


def fused_step_supported(h2: int, w2: int, hc: int, wc: int, num_classes: int,
                         feature_dim: int, dtype) -> bool:
    """Whether one subdivision step (to (h2, w2) from an (hc, wc) feature
    grid) can run through the fused kernel."""
    if num_classes != 1 or dtype != jnp.bfloat16:
        return False
    if h2 % TILE_H or w2 % TILE_W:
        return False
    if h2 % hc or w2 % wc or h2 // hc != w2 // wc:
        return False
    sf = h2 // hc
    if sf not in (2, 4, 8):
        return False
    return feature_dim % 128 == 0


def pack_features(features: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
    """Pack (N, Hc, Wc, F) features + (N, Hc, Wc, 1) coarse logits into one
    zero-padded (N, Hc+2P, Wc+2P, F+128) map: channel F holds the coarse
    plane, channels F+1.. are zero.  Interpolating the packed map with
    zeros padding reproduces point_sample on both tensors at once."""
    n, hc, wc, f = features.shape
    packed = jnp.concatenate(
        [
            features,
            coarse.astype(features.dtype),
            jnp.zeros((n, hc, wc, _CCH - 1), features.dtype),
        ],
        axis=-1,
    )
    return jnp.pad(packed, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))


def _interp_chunk_pm(winb, phases_y, phases_x, ts_y, ts_x, out_dtype):
    """(WSy, WSx, C) window chunk -> (P, C) bilinear points, PHASE-MAJOR.

    Emitting points in (p_y, p_x, k_y, k_x) order makes every step a
    static slice + constant-weight lerp + leading-axis concat -- no
    interleave relayouts (which cost more than the MLP itself in the
    natural order).  The C=1 planes are pre/post-permuted to the matching
    tile-phase-major layout in XLA (``_pm_permute``).  Each lerp rounds
    to ``out_dtype``, exactly like the XLA resize's two bf16 matmuls with
    f32 accumulation (ops/interpolate.py bilinear_resize).
    """
    blocks = []
    for cy, wy in phases_y:
        s0 = winb[cy : cy + ts_y].astype(jnp.float32)
        s1 = winb[cy + 1 : cy + 1 + ts_y].astype(jnp.float32)
        yp = (s0 * (1.0 - wy) + s1 * wy).astype(out_dtype)  # (ts_y, WSx, C)
        for cx, wx in phases_x:
            t0 = yp[:, cx : cx + ts_x].astype(jnp.float32)
            t1 = yp[:, cx + 1 : cx + 1 + ts_x].astype(jnp.float32)
            blk = (t0 * (1.0 - wx) + t1 * wx).astype(out_dtype)
            blocks.append(blk.reshape(ts_y * ts_x, blk.shape[-1]))
    return jnp.concatenate(blocks, axis=0)  # (TILE_H*TILE_W, C)


def _pm_permute(x, sf):
    """(N, H2, W2) plane -> tile-phase-major layout: each (TILE_H, TILE_W)
    tile holds its points in (p_y, p_x, k_y, k_x) order, row-major."""
    n, h2, w2 = x.shape
    nty, ntx = h2 // TILE_H, w2 // TILE_W
    tsy, tsx = TILE_H // sf, TILE_W // sf
    x = x.reshape(n, nty, tsy, sf, ntx, tsx, sf)
    x = x.transpose(0, 1, 4, 3, 6, 2, 5)  # n, i, j, p_y, p_x, k_y, k_x
    x = x.reshape(n, nty, ntx, TILE_H, TILE_W).transpose(0, 1, 3, 2, 4)
    return x.reshape(n, h2, w2)


def _pm_unpermute(x, sf):
    """Inverse of _pm_permute."""
    n, h2, w2 = x.shape
    nty, ntx = h2 // TILE_H, w2 // TILE_W
    tsy, tsx = TILE_H // sf, TILE_W // sf
    x = x.reshape(n, nty, TILE_H, ntx, TILE_W).transpose(0, 1, 3, 2, 4)
    x = x.reshape(n, nty, ntx, sf, sf, tsy, tsx)
    x = x.transpose(0, 1, 5, 3, 2, 6, 4)  # n, i, k_y, p_y, j, k_x, p_x
    return x.reshape(n, h2, w2)


def _refine_kernel(cfg, thr_ref, sem_ref, feat_ref, *wrefs_out):
    """One (batch, tile) program: copy-through or DMA + MLP refine.

    VMEM discipline: Mosaic's scoped-stack allocator does not reuse
    buffers across unrolled Python loops, so both inner loops are
    ``fori_loop``s (one traced body = one bounded allocation) and the
    interpolated points live in an explicit ``xbuf`` scratch.
    """
    (num_fc, ntx, fdim, ts_y, off_y, ws_y, phases_y, ts_x, off_x, ws_x,
     phases_x, use_dma) = cfg
    wrefs = wrefs_out[: 2 * num_fc + 2]
    out_ref = wrefs_out[2 * num_fc + 2]
    xbuf = wrefs_out[2 * num_fc + 3]
    win = dma_sem = None
    if use_dma:
        win, dma_sem = wrefs_out[2 * num_fc + 4 :]

    b = pl.program_id(0)
    t = pl.program_id(1)
    i = t // ntx
    j = t % ntx
    sem_t = sem_ref[0]  # (TILE_H, TILE_W)
    thr = thr_ref[b, 0]
    any_refine = jnp.any(jnp.abs(sem_t.astype(jnp.float32)) <= thr)

    @pl.when(jnp.logical_not(any_refine))
    def _():
        out_ref[0] = sem_t

    @pl.when(any_refine)
    def _():
        # bilinear-interpolate the packed window one 128-channel chunk at
        # a time (all chunk DMAs issued up front into per-chunk slots, so
        # transfers overlap the interpolation); channels F.. carry the
        # coarse logit plane through the same interpolation.  Chunks stay
        # separate in xbuf — the first MLP layer consumes them as a
        # channel-blocked matmul accumulation.
        npts = TILE_H * TILE_W
        nchunk = (fdim + _CCH) // _CCH

        def chunk_dma(ci):
            return pltpu.make_async_copy(
                feat_ref.at[
                    b,
                    pl.ds(i * ts_y + off_y, ws_y),
                    pl.ds(j * ts_x + off_x, ws_x),
                    pl.ds(ci * _CCH, _CCH),
                ],
                win.at[ci],
                dma_sem.at[ci],
            )

        if use_dma:
            for ci in range(nchunk):
                chunk_dma(ci).start()

        def interp_body(ci, _):
            if use_dma:
                chunk_dma(ci).wait()
                winb = win[ci]
            else:  # interpret mode: read the window directly
                winb = feat_ref[
                    b,
                    pl.ds(i * ts_y + off_y, ws_y),
                    pl.ds(j * ts_x + off_x, ws_x),
                    pl.ds(ci * _CCH, _CCH),
                ]
            xbuf[ci] = _interp_chunk_pm(winb, phases_y, phases_x, ts_y, ts_x,
                                        sem_t.dtype)
            return 0

        jax.lax.fori_loop(0, nchunk, interp_body, 0)

        # point-head MLP in point chunks; the augmented weight matrices
        # accumulate the coarse column inside the MXU f32 accumulation,
        # exactly like the reference's concat([x, coarse]) @ W
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_W, TILE_W), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (TILE_W, TILE_W), 1)
        ).astype(jnp.float32)[None]
        scal_ref = wrefs[2 * num_fc + 1]
        bp = scal_ref[0, 0]
        rows = _PCHUNK // TILE_W

        def mlp_body(pi, _):
            p0 = pi * _PCHUNK
            cblock = xbuf[nchunk - 1, pl.ds(p0, _PCHUNK), :]
            h = None
            for k in range(num_fc):
                w_ref, b_ref = wrefs[2 * k : 2 * k + 2]
                if k == 0:  # channel-blocked first layer
                    d = None
                    for ci in range(nchunk):
                        dc = jax.lax.dot_general(
                            xbuf[ci, pl.ds(p0, _PCHUNK), :],
                            w_ref[ci * _CCH : (ci + 1) * _CCH, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        d = dc if d is None else d + dc
                else:
                    d = jax.lax.dot_general(
                        h, w_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                h = jnp.maximum(d.astype(sem_t.dtype) + b_ref[...], 0)
                h = jnp.concatenate([h, cblock], axis=1)
            wp_ref = wrefs[2 * num_fc]
            d = jax.lax.dot_general(
                h, wp_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (PCHUNK, 128): every lane holds the same logit
            y = d.astype(sem_t.dtype) + bp.astype(sem_t.dtype)
            y3 = y.reshape(rows, TILE_W, TILE_W).astype(jnp.float32)
            refined = jnp.sum(y3 * eye, axis=-1).astype(sem_t.dtype)

            sem_rows = sem_ref[0, pl.ds(pi * rows, rows), :]
            mask_rows = jnp.abs(sem_rows.astype(jnp.float32)) <= thr
            out_ref[0, pl.ds(pi * rows, rows), :] = jnp.where(
                mask_rows, refined, sem_rows
            )
            return 0

        jax.lax.fori_loop(0, npts // _PCHUNK, mlp_body, 0)


def fused_refine_step(
    sem: jnp.ndarray,
    feat_pack: jnp.ndarray,
    weights,
    num_points: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused subdivision step: (N, H, W, 1) logits -> (N, 2H, 2W, 1).

    ``feat_pack`` is ``pack_features(features, coarse)`` (the reference
    re-samples the original coarse prediction at every step — it rides in
    the packed channels).  ``weights`` comes from
    ``StandardPointHead.fused_weights``.
    """
    n, h, w, _ = sem.shape
    h2, w2 = 2 * h, 2 * w
    hc, wc = feat_pack.shape[1] - 2 * PAD, feat_pack.shape[2] - 2 * PAD
    fdim = feat_pack.shape[3] - _CCH
    sf = h2 // hc
    assert sf in (2, 4, 8) and h2 % TILE_H == 0 and w2 % TILE_W == 0
    # isotropy + channel-packing contracts: the phase geometry assumes the
    # same x/y scale, and the kernel tiles feat channels in 128-lane chunks
    # with the coarse block appended — violating either computes silently
    # wrong logits rather than raising downstream
    assert w2 // wc == sf, (
        f"anisotropic upsample: h-scale {sf} != w-scale {w2 // wc}"
    )
    assert fdim % 128 == 0, (
        f"feature dim {fdim} must be a multiple of 128 (lane tiling)"
    )

    up = bilinear_resize(sem, (h2, w2), align_corners=False)
    kth = kth_smallest_nonneg(
        jnp.abs(up.astype(jnp.float32)).reshape(n, h2 * w2),
        min(num_points, h2 * w2),
    )

    ts_y, off_y, ws_y, phases_y = _axis_phases(sf, TILE_H)
    ts_x, off_x, ws_x, phases_x = _axis_phases(sf, TILE_W)
    layers, (wp, wpc, bp) = weights
    num_fc = len(layers)
    ntx = w2 // TILE_W
    dt = sem.dtype

    # augmented weight matrices: [W_fine; w_coarse; 0 x (_CCH-1)] so the
    # coarse channel block multiplies through exactly
    w_augs = []
    for wf, wcol, bias in layers:
        zeros = jnp.zeros((_CCH - 1, wf.shape[1]), dt)
        w_augs.append((jnp.concatenate([wf, wcol, zeros], axis=0), bias))
    wp_aug = jnp.concatenate(
        [
            jnp.tile(wp.reshape(-1, 1), (1, TILE_W)),       # (D, 128)
            jnp.full((1, TILE_W), wpc, dt),                  # coarse row
            jnp.zeros((_CCH - 1, TILE_W), dt),
        ],
        axis=0,
    )

    use_dma = not interpret
    cfg = (num_fc, ntx, fdim, ts_y, off_y, ws_y, phases_y, ts_x, off_x, ws_x,
           phases_x, use_dma)

    tile = pl.BlockSpec((1, TILE_H, TILE_W), lambda b, t: (b, t // ntx, t % ntx),
                        memory_space=_VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (0,) * len(shape), memory_space=_VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=_SMEM),  # thr (N, 1), indexed by batch id
        tile,
        pl.BlockSpec(memory_space=_ANY) if use_dma
        else pl.BlockSpec(memory_space=_VMEM),
    ]
    args = [
        kth[:, None],  # refine where |logit| <= kth, (N, 1) f32
        _pm_permute(up.reshape(n, h2, w2), sf),
        feat_pack,
    ]
    for w_aug, bias in w_augs:
        in_specs += [full(w_aug.shape), full(bias.shape)]
        args += [w_aug, bias]
    in_specs += [
        full(wp_aug.shape),
        pl.BlockSpec(memory_space=_SMEM),  # (1, 1) f32: predictor bias
    ]
    args += [wp_aug, jnp.reshape(bp, (1, 1)).astype(jnp.float32)]

    nchunk = (fdim + _CCH) // _CCH
    scratch_shapes = [
        pltpu.VMEM((nchunk, TILE_H * TILE_W, _CCH), feat_pack.dtype),  # xbuf
    ]
    if use_dma:
        scratch_shapes += [
            pltpu.VMEM((nchunk, ws_y, ws_x, _CCH), feat_pack.dtype),
            pltpu.SemaphoreType.DMA((nchunk,)),
        ]

    compiler_params = None
    if not interpret:
        # the conservative scoped-stack estimate lands a little above the
        # 16M default; v5e VMEM has headroom
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024
        )
    out = pl.pallas_call(
        functools.partial(_refine_kernel, cfg),
        grid=(n, (h2 // TILE_H) * ntx),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2), dt),
        in_specs=in_specs,
        out_specs=tile,
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*args)
    return _pm_unpermute(out, sf).reshape(n, h2, w2, 1)
