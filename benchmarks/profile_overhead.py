"""Bisect pallas per-program overhead for the refine kernel structure."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from empanada_tpu.utils import device_time

B, H, W = 8, 512, 512
TH, TW = 32, 128
ntx = W // TW
rng = np.random.default_rng(0)
sem = jnp.asarray(rng.normal(0, 1, (B, H, W)), jnp.bfloat16)
thr = jnp.full((B, 1), 1e-6, jnp.float32)

tile = pl.BlockSpec((1, TH, TW), lambda b, t: (b, t // ntx, t % ntx),
                    memory_space=pltpu.VMEM)

def k_copy(sem_ref, out_ref):
    out_ref[0] = sem_ref[0]

def k_when(thr_ref, sem_ref, out_ref):
    b = pl.program_id(0)
    s = sem_ref[0]
    t = thr_ref[b, 0]
    m = jnp.any(jnp.abs(s.astype(jnp.float32)) <= t)
    @pl.when(jnp.logical_not(m))
    def _():
        out_ref[0] = s
    @pl.when(m)
    def _():
        out_ref[0] = s * 2

def k_when_scratch(thr_ref, sem_ref, out_ref, xbuf, win, sem_dma):
    k_when(thr_ref, sem_ref, out_ref)

def run(name, fn, with_thr=False, scratch=False, vmem_lim=None):
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if with_thr else []) + [tile]
    args = ([thr] if with_thr else []) + [sem]
    scratch_shapes = []
    if scratch:
        scratch_shapes = [
            pltpu.VMEM((3, TH * TW, 128), jnp.bfloat16),
            pltpu.VMEM((32, 56, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ]
    cp = pltpu.CompilerParams(vmem_limit_bytes=vmem_lim) if vmem_lim else None
    f = jax.jit(lambda *a: pl.pallas_call(
        fn,
        grid=(B, (H // TH) * ntx),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.bfloat16),
        in_specs=in_specs,
        out_specs=tile,
        scratch_shapes=scratch_shapes,
        compiler_params=cp,
    )(*a))
    def perturb(a, i):
        return a[:-1] + (a[-1] + (1e-4 * i).astype(a[-1].dtype),)
    dt = device_time(f, *args, iters=10, trials=3, perturb=perturb)
    ngrid = B * (H // TH) * ntx
    print(f"{name:34s} {dt*1e3:7.3f} ms  ({dt/ngrid*1e6:5.2f} us/program)")

run("pure tile copy", k_copy)
run("copy + when(thr)", k_when, with_thr=True)
run("copy + when + scratch allocs", k_when_scratch, with_thr=True, scratch=True)
run("copy + when + scratch + 40M lim", k_when_scratch, with_thr=True, scratch=True,
    vmem_lim=40 * 1024 * 1024)

# --- add weight inputs and ANY feat input ---
F = 256
feats = jnp.asarray(rng.normal(0, 1, (B, 160, 160, F + 128)), jnp.bfloat16)
w_augs = [jnp.asarray(rng.normal(0, 0.05, (384, 256)), jnp.bfloat16) for _ in range(3)]
biases = [jnp.zeros((1, 256), jnp.bfloat16) for _ in range(3)]
wp = jnp.asarray(rng.normal(0, 0.05, (384, 128)), jnp.bfloat16)
scal = jnp.zeros((1, 1), jnp.float32)

def k_full_skip(thr_ref, sem_ref, feat_ref, w1, b1, w2, b2, w3, b3, wpr, sc,
                out_ref, xbuf, win, dma_sem):
    b = pl.program_id(0)
    s = sem_ref[0]
    t = thr_ref[b, 0]
    m = jnp.any(jnp.abs(s.astype(jnp.float32)) <= t)
    @pl.when(jnp.logical_not(m))
    def _():
        out_ref[0] = s
    @pl.when(m)
    def _():
        out_ref[0] = s * 2

def run2(name, fn):
    full = lambda shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), tile,
                pl.BlockSpec(memory_space=pl.ANY)]
    for wa, bi in zip(w_augs, biases):
        in_specs += [full(wa.shape), full(bi.shape)]
    in_specs += [full(wp.shape), pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [thr, sem, feats]
    for wa, bi in zip(w_augs, biases):
        args += [wa, bi]
    args += [wp, scal]
    f = jax.jit(lambda *a: pl.pallas_call(
        fn,
        grid=(B, (H // TH) * ntx),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.bfloat16),
        in_specs=in_specs,
        out_specs=tile,
        scratch_shapes=[
            pltpu.VMEM((3, TH * TW, 128), jnp.bfloat16),
            pltpu.VMEM((32, 56, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024),
    )(*a))
    def perturb(a, i):
        return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype)) + a[2:]
    dt = device_time(f, *args, iters=10, trials=3, perturb=perturb)
    ngrid = B * (H // TH) * ntx
    print(f"{name:34s} {dt*1e3:7.3f} ms  ({dt/ngrid*1e6:5.2f} us/program)")

run2("skip + all weight inputs", k_full_skip)

# --- real refine body present, runtime-false gate ---
from empanada_tpu.ops import pallas_pointrend as ppr

def k_realbody_skip(thr_ref, sem_ref, feat_ref, w1, b1, w2, b2, w3, b3, wpr, sc,
                    out_ref, xbuf, win, dma_sem):
    cfg = (3, ntx, F, 8, 32, ppr._axis_phases(4, TH)[2], 32, 56,
           ppr._axis_phases(4, TW)[2], True)
    ppr._refine_kernel(cfg, thr_ref, sem_ref, feat_ref, w1, b1, w2, b2, w3, b3,
                       wpr, sc, out_ref, xbuf, win, dma_sem)

thr = jnp.full((B, 1), -1.0, jnp.float32)  # |l| <= -1 never true -> all skip
run2("REAL body, all tiles skip", k_realbody_skip)
thr = jnp.full((B, 1), 1e30, jnp.float32)  # all tiles refine
run2("REAL body, all tiles refine", k_realbody_skip)
