"""Micro-profile PointRend render internals at 512^2 x B8."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.ops.interpolate import bilinear_resize, point_sample
from empanada_tpu.models.point_rend import (
    calculate_uncertainty, get_uncertain_point_coords_on_grid,
)
from empanada_tpu.utils import device_time

B = 8
rng = np.random.default_rng(0)
# coarse logits at 1/4 res of 512 -> 128^2, features 128^2 x 256 (decoder out)
coarse = jnp.asarray(rng.normal(0, 1, (B, 128, 128, 1)), jnp.bfloat16)
feats = jnp.asarray(rng.normal(0, 1, (B, 128, 128, 256)), jnp.bfloat16)
NUM_POINTS = 8192


def tk(x):
    u = calculate_uncertainty(bilinear_resize(x, (512, 512), align_corners=False))
    return jax.lax.top_k(u.reshape(B, -1), NUM_POINTS)[1]

def tk_approx(x):
    u = calculate_uncertainty(bilinear_resize(x, (512, 512), align_corners=False))
    return jax.lax.approx_max_k(u.reshape(B, -1), NUM_POINTS)[1]

def resize_feats(f):
    return bilinear_resize(f, (256, 256), align_corners=False, zeros_padding=True)

def gather_feats(f):
    idx = jnp.arange(B * NUM_POINTS).reshape(B, NUM_POINTS) % (512 * 512)
    xs = (1.0 / 512) * (0.5 + (idx % 512).astype(jnp.float32))
    ys = (1.0 / 512) * (0.5 + (idx // 512).astype(jnp.float32))
    coords = jnp.stack([xs, ys], axis=-1)
    return point_sample(f, coords)

def mlp_dense_256(f):
    # emulate 3-layer fc_dim-256 MLP on the dense 256^2 grid
    x = resize_feats(f)
    w = jnp.ones((257, 256), jnp.bfloat16) * 0.01
    c = jnp.ones(x.shape[:-1] + (1,), jnp.bfloat16)
    h = jnp.concatenate([x, c], -1)
    for _ in range(3):
        h = jnp.maximum(h @ w, 0)
        h = jnp.concatenate([h, c], -1)
    return h @ jnp.ones((257, 1), jnp.bfloat16)

def perturb1(a, k):
    return (a[0] + (1e-4 * k).astype(a[0].dtype),)

for name, fn, args in [
    ("top_k 8192-of-262144 (incl resize+|u|)", tk, (coarse,)),
    ("approx_max_k same", tk_approx, (coarse,)),
    ("bilinear resize feats 128->256 (256ch)", resize_feats, (feats,)),
    ("point_sample 8192pts of 256ch feats", gather_feats, (feats,)),
    ("dense MLP at 256^2 (incl resize)", mlp_dense_256, (feats,)),
]:
    dt = device_time(jax.jit(fn), *args, iters=10, trials=3, perturb=perturb1)
    print(f"{name:45s} {dt*1e3:7.2f} ms/batch")
