"""Bisect the refine-path cost: DMA / interp / MLP, all tiles active."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from empanada_tpu.ops import pallas_pointrend as ppr
from empanada_tpu.utils import device_time

B, H, W, F = 8, 512, 512, 256
TH, TW = ppr.TILE_H, ppr.TILE_W
ntx = W // TW
SF = 4
rng = np.random.default_rng(0)
sem = jnp.asarray(rng.normal(0, 1, (B, H, W)), jnp.bfloat16)
feats = jnp.asarray(rng.normal(0, 1, (B, 160, 160, F + 128)), jnp.bfloat16)
w_augs = [jnp.asarray(rng.normal(0, 0.05, (F + 128 if k == 0 else 384, 256)),
                      jnp.bfloat16) for k in range(3)]
biases = [jnp.zeros((1, 256), jnp.bfloat16) for _ in range(3)]
wp = jnp.asarray(rng.normal(0, 0.05, (384, 128)), jnp.bfloat16)
scal = jnp.zeros((1, 1), jnp.float32)
thr = jnp.full((B, 1), 1e30, jnp.float32)  # all refine

ts_y, off_y, ws_y, phases_y = ppr._axis_phases(SF, TH)
ts_x, off_x, ws_x, phases_x = ppr._axis_phases(SF, TW)
NCH = (F + 128) // 128
tile = pl.BlockSpec((1, TH, TW), lambda b, t: (b, t // ntx, t % ntx),
                    memory_space=pltpu.VMEM)

def make(mode):
    def kern(thr_ref, sem_ref, feat_ref, w1, b1, w2, b2, w3, b3, wpr, sc,
             out_ref, xbuf, win, sems):
        wrefs = (w1, b1, w2, b2, w3, b3, wpr, sc)
        b = pl.program_id(0)
        t = pl.program_id(1)
        i = t // ntx
        j = t % ntx
        sem_t = sem_ref[0]
        th = thr_ref[b, 0]
        m = jnp.any(jnp.abs(sem_t.astype(jnp.float32)) <= th)

        @pl.when(jnp.logical_not(m))
        def _():
            out_ref[0] = sem_t

        @pl.when(m)
        def _():
            npts = TH * TW

            def chunk_dma(ci):
                return pltpu.make_async_copy(
                    feat_ref.at[b, pl.ds(i * ts_y + off_y, ws_y),
                                pl.ds(j * ts_x + off_x, ws_x),
                                pl.ds(ci * 128, 128)],
                    win.at[ci], sems.at[ci])

            for ci in range(NCH):
                chunk_dma(ci).start()

            def interp_body(ci, _):
                chunk_dma(ci).wait()
                if mode == "dma":
                    xbuf[ci] = jnp.broadcast_to(win[ci, 0, 0:1, :], (npts, 128))
                else:
                    xbuf[ci] = ppr._interp_chunk_pm(win[ci], phases_y, phases_x,
                                                    ts_y, ts_x, sem_t.dtype)
                return 0

            jax.lax.fori_loop(0, NCH, interp_body, 0)

            if mode in ("dma", "interp"):
                out_ref[0] = xbuf[0, pl.ds(0, TH), :]
                return

            eye = (jax.lax.broadcasted_iota(jnp.int32, (TW, TW), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (TW, TW), 1)
                   ).astype(jnp.float32)[None]
            bp = sc[0, 0]
            cblock = xbuf[NCH - 1, pl.ds(0, npts), :]
            h = None
            for k in range(3):
                w_ref, b_ref = wrefs[2 * k : 2 * k + 2]
                if k == 0:
                    d = None
                    for ci in range(NCH):
                        dc = jax.lax.dot_general(
                            xbuf[ci, pl.ds(0, npts), :],
                            w_ref[ci * 128 : (ci + 1) * 128, :],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        d = dc if d is None else d + dc
                else:
                    d = jax.lax.dot_general(h, w_ref[...], (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                h = jnp.maximum(d.astype(sem_t.dtype) + b_ref[...], 0)
                h = jnp.concatenate([h, cblock], axis=1)
            d = jax.lax.dot_general(h, wpr[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = d.astype(sem_t.dtype) + bp.astype(sem_t.dtype)
            y3 = y.reshape(npts // TW, TW, TW).astype(jnp.float32)
            out_ref[0] = jnp.sum(y3 * eye, axis=-1).astype(sem_t.dtype)

    full = lambda shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), tile,
                pl.BlockSpec(memory_space=pl.ANY)]
    for wa, bi in zip(w_augs, biases):
        in_specs += [full(wa.shape), full(bi.shape)]
    in_specs += [full(wp.shape), pl.BlockSpec(memory_space=pltpu.SMEM)]
    return jax.jit(lambda s: pl.pallas_call(
        kern,
        grid=(B, (H // TH) * ntx),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.bfloat16),
        in_specs=in_specs,
        out_specs=tile,
        scratch_shapes=[
            pltpu.VMEM((NCH, TH * TW, 128), jnp.bfloat16),
            pltpu.VMEM((NCH, ws_y, ws_x, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NCH,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024),
    )(thr, s, feats, w_augs[0], biases[0], w_augs[1], biases[1],
      w_augs[2], biases[2], wp, scal))

def perturb(a, idx):
    return (a[0] + (1e-4 * idx).astype(a[0].dtype),)

ngrid = B * (H // TH) * ntx
for mode in ["dma", "interp", "full"]:
    f = make(mode)
    dt = device_time(f, sem, iters=10, trials=3, perturb=perturb)
    print(f"all-refine mode={mode:7s} {dt*1e3:7.2f} ms  ({dt/ngrid*1e6:5.2f} us/tile)")
