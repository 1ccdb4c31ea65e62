"""Gather formulations for PointRend point_sample (8x8192 pts, 256ch)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.ops.interpolate import point_sample
from empanada_tpu.utils import device_time

B, HC, F, P = 8, 128, 256, 8192
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.normal(0, 1, (B, HC, HC, F)), jnp.bfloat16)
coords = jnp.asarray(rng.random((B, P, 2)), jnp.float32)


def cur(feats, coords):
    return point_sample(feats, coords)


def sliced(feats, coords):
    """lax.gather with (2,2,C) slices + in-register bilinear."""
    h = w = HC
    px = ((coords[..., 0] * 2 - 1 + 1) * w - 1) / 2
    py = ((coords[..., 1] * 2 - 1 + 1) * h - 1) / 2
    ix0 = jnp.clip(jnp.floor(px).astype(jnp.int32), -1, w - 1)
    iy0 = jnp.clip(jnp.floor(py).astype(jnp.int32), -1, h - 1)
    # pad so the 2x2 slice at (iy0, ix0) is always in range; zeros padding
    fp = jnp.pad(feats, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def one(fimg, iy, ix):
        starts = jnp.stack([iy + 1, ix + 1], axis=-1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(fimg, starts, dnums, (2, 2, F))

    win = jax.vmap(one)(fp, iy0, ix0)  # (B, P, 2, 2, F)
    wx = (px - jnp.floor(px)).astype(feats.dtype)[..., None]
    wy = (py - jnp.floor(py)).astype(feats.dtype)[..., None]
    top = win[:, :, 0, 0] * (1 - wx) + win[:, :, 0, 1] * wx
    bot = win[:, :, 1, 0] * (1 - wx) + win[:, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


a = jax.jit(cur)(feats, coords)
b = jax.jit(sliced)(feats, coords)
print("maxdiff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))

def pert(ar, i):
    return (ar[0] + (1e-4 * i).astype(ar[0].dtype), ar[1])

for name, f in [("4-tap flat gathers (current)", cur), ("(2,2,C)-slice gather", sliced)]:
    dt = device_time(jax.jit(f), feats, coords, iters=10, trials=3, perturb=pert)
    print(f"{name:30s} {dt*1e3:7.2f} ms")
