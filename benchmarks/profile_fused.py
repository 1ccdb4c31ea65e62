"""Isolate fused_refine_step cost: copy-through vs full refine vs XLA parts."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.models.point_rend import StandardPointHead
from empanada_tpu.ops import pallas_pointrend as ppr
from empanada_tpu.ops.interpolate import bilinear_resize
from empanada_tpu.ops.select import kth_smallest_nonneg
from empanada_tpu.utils import device_time

B, HC, F = 8, 128, 256
rng = np.random.default_rng(0)
coarse = jnp.asarray(rng.normal(0, 1.5, (B, HC, HC, 1)), jnp.bfloat16)
feats = jnp.asarray(rng.normal(0, 1, (B, HC, HC, F)), jnp.bfloat16)
head = StandardPointHead(num_classes=1, fc_dim=256, num_fc=3, dtype=jnp.bfloat16)
params = head.init(jax.random.key(0), jnp.zeros((1, 4, F), jnp.bfloat16),
                   jnp.zeros((1, 4, 1), jnp.bfloat16))
wts = head.apply(params, F, method=head.fused_weights)
pack = ppr.pack_features(feats, coarse)

sem256 = jnp.asarray(rng.normal(0, 1.5, (B, 256, 256, 1)), jnp.bfloat16)

def step(sem, k):
    return ppr.fused_refine_step(sem, pack, wts, k)

def perturb(a, i):
    return (a[0] + (1e-4 * i).astype(a[0].dtype),) + a[1:]

for name, k in [("K=8192 (3%)", 8192), ("K=1 (skip-all-ish)", 1),
                ("K=all (refine everything)", 512 * 512)]:
    f = jax.jit(lambda s: step(s, k))
    dt = device_time(f, sem256, iters=10, trials=3, perturb=perturb)
    print(f"step 256->512 {name:28s} {dt*1e3:7.2f} ms/batch")

# XLA-side pieces
up = lambda s: bilinear_resize(s, (512, 512), align_corners=False)
dt = device_time(jax.jit(up), sem256, iters=10, trials=3, perturb=perturb)
print(f"bilinear upsample sem C=1        {dt*1e3:7.2f} ms/batch")

kth = lambda s: kth_smallest_nonneg(
    jnp.abs(up(s).astype(jnp.float32)).reshape(B, -1), 8192)
dt = device_time(jax.jit(kth), sem256, iters=10, trials=3, perturb=perturb)
print(f"upsample + kth radix select      {dt*1e3:7.2f} ms/batch")
