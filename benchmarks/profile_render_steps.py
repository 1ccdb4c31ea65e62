"""Decompose PointRend render cost by subdivision step at 512^2 x B8.

Full-model forward timed at render_steps = 0/1/2 isolates the marginal cost
of each subdivision step (step 1: dense 256^2 refine; step 2: sparse K=8192
gather/scatter at 512^2), plus the standalone cost of the step-2 building
blocks (uncertainty resize, radix select, packed gather, scatter).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.models import create_model
from empanada_tpu.utils import device_time

H = W = 512
B = 8

model = create_model(
    "PanopticDeepLabPR", encoder="resnet50", num_classes=1, stage4_stride=16,
    decoder_channels=256, low_level_stages=(1,), low_level_channels_project=(32,),
    ins_decoder=True, subdivision_num_points=8192, dtype=jnp.bfloat16,
    fused_render="never",
)
sample = jnp.zeros((1, H, W, 1), jnp.float32)
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0)}, sample, train=False
)

rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(0, 1, (B, H, W, 1)), jnp.float32)


def p_img(a, i):
    return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype))


def full(steps):
    def fn(v, x):
        return model.apply(v, x, train=False, render_steps=steps,
                           interpolate_ins=False)
    return fn


base = None
for steps in (0, 1, 2):
    dt = device_time(jax.jit(full(steps)), variables, images, iters=10,
                     trials=3, perturb=p_img)
    marg = "" if base is None else f"   (step {steps} marginal {1e3*(dt-base):6.2f} ms)"
    print(f"render_steps={steps}: {dt*1e3:7.2f} ms/batch{marg}")
    base = dt

# step-2 building blocks in isolation
from empanada_tpu.ops.interpolate import bilinear_resize, point_sample_packed
from empanada_tpu.models.point_rend import (
    calculate_uncertainty, get_uncertain_point_coords_on_grid,
)

sem256 = jnp.asarray(rng.normal(0, 1, (B, 256, 256, 1)), jnp.bfloat16)
feats = jnp.asarray(rng.normal(0, 1, (B, 128, 128, 257)), jnp.bfloat16)
K = 8192


def p0(a, i):
    return ((a[0] + (1e-4 * i).astype(a[0].dtype),) + a[1:])


def up_unc(s):
    x = bilinear_resize(s, (512, 512), align_corners=False)
    return x, calculate_uncertainty(x)


def sel(s):
    x, u = up_unc(s)
    return get_uncertain_point_coords_on_grid(u, K)


def gath(s):
    x, u = up_unc(s)
    idx, coords = get_uncertain_point_coords_on_grid(u, K)
    return point_sample_packed(feats, coords)


def scat(s):
    x, u = up_unc(s)
    idx, coords = get_uncertain_point_coords_on_grid(u, K)
    flat = x.reshape(B, -1, 1)
    upd = jnp.zeros((B, K, 1), x.dtype)
    out = jax.vmap(lambda f, i, p: f.at[i].set(p))(flat, idx, upd)
    return out


for name, fn in [("up+uncertainty 512^2", up_unc), ("  + top-K select", sel),
                 ("  + packed gather K=8192", gath), ("  + scatter", scat)]:
    dt = device_time(jax.jit(fn), sem256, iters=10, trials=3, perturb=p0)
    print(f"{name:28s} {dt*1e3:7.2f} ms")
