"""Fixed per-step costs of the fused render path, overhead-cancelled timer."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from empanada_tpu.models.point_rend import StandardPointHead
from empanada_tpu.ops import pallas_pointrend as ppr
from empanada_tpu.ops.interpolate import bilinear_resize
from empanada_tpu.ops.select import kth_smallest_nonneg
from empanada_tpu.utils import device_time

B, HC, F = 8, 128, 256
rng = np.random.default_rng(0)

# bimodal blob-like logits: smooth field * gain
field = np.stack([gaussian_filter(rng.normal(0, 1, (256, 256)), 10) for _ in range(B)])
field = field / field.std() * 30.0
sem256 = jnp.asarray(field[..., None], jnp.bfloat16)

coarse = jnp.asarray(field[:, ::2, ::2][..., None] , jnp.bfloat16)
feats = jnp.asarray(rng.normal(0, 1, (B, HC, HC, F)), jnp.bfloat16)
head = StandardPointHead(num_classes=1, fc_dim=256, num_fc=3, dtype=jnp.bfloat16)
params = head.init(jax.random.key(0), jnp.zeros((1, 4, F), jnp.bfloat16),
                   jnp.zeros((1, 4, 1), jnp.bfloat16))
wts = head.apply(params, F, method=head.fused_weights)
pack = ppr.pack_features(feats, coarse)

# active-tile fraction at K=8192
up = bilinear_resize(sem256, (512, 512), align_corners=False)
kth = kth_smallest_nonneg(jnp.abs(up.astype(jnp.float32)).reshape(B, -1), 8192)
mask = (jnp.abs(up.astype(jnp.float32))[..., 0] <= kth[:, None, None])
tiles = mask.reshape(B, 512 // ppr.TILE_H, ppr.TILE_H, 512 // ppr.TILE_W, ppr.TILE_W)
active = jnp.any(tiles, axis=(2, 4))
print(f"refined px/image: {float(mask.sum())/B:.0f}, active tiles: "
      f"{float(active.mean()):.3f} of {active.shape[1]*active.shape[2]}")

def perturb(a, i):
    return (a[0] + (1e-4 * i).astype(a[0].dtype),) + a[1:]

fns = {
    "upsample 256->512 C=1": lambda s: bilinear_resize(s, (512, 512), align_corners=False),
    "kth radix select": lambda s: kth_smallest_nonneg(
        jnp.abs(bilinear_resize(s, (512, 512), align_corners=False)
                .astype(jnp.float32)).reshape(B, -1), 8192),
    "pm_permute+unpermute": lambda s: ppr._pm_unpermute(
        ppr._pm_permute(bilinear_resize(s, (512, 512), align_corners=False)
                        .reshape(B, 512, 512), 4), 4),
    "full fused step": lambda s: ppr.fused_refine_step(s, pack, wts, 8192),
}
for name, f in fns.items():
    dt = device_time(jax.jit(f), sem256, iters=10, trials=3, perturb=perturb)
    print(f"{name:26s} {dt*1e3:7.3f} ms/batch")
