"""C=1 2x bilinear upsample formulations, 8x(256,256)->(512,512) bf16."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.ops.interpolate import bilinear_resize
from empanada_tpu.utils import device_time

B = 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (B, 256, 256, 1)), jnp.bfloat16)


def einsum_resize(x):
    return bilinear_resize(x, (512, 512), align_corners=False)


def interleave_resize(x):
    """2x upsample via phase lerps + stack/reshape (align_corners=False).

    out[2k]   = 0.25*in[k-1] + 0.75*in[k]   (edge-clamped)
    out[2k+1] = 0.75*in[k]   + 0.25*in[k+1]
    """
    def up1(v, axis):
        n = v.shape[axis]
        idx = lambda s, e: jax.lax.slice_in_dim(v, s, e, axis=axis)
        prev = jnp.concatenate([idx(0, 1), idx(0, n - 1)], axis=axis)
        nxt = jnp.concatenate([idx(1, n), idx(n - 1, n)], axis=axis)
        f = v.astype(jnp.float32)
        e0 = (0.25 * prev.astype(jnp.float32) + 0.75 * f).astype(v.dtype)
        e1 = (0.75 * f + 0.25 * nxt.astype(jnp.float32)).astype(v.dtype)
        st = jnp.stack([e0, e1], axis=axis + 1)
        shape = list(v.shape)
        shape[axis] = 2 * n
        return st.reshape(shape)

    return up1(up1(x, 1), 2)


a = jax.jit(einsum_resize)(x)
b = jax.jit(interleave_resize)(x)
print("max diff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))

def perturb(args, i):
    return (args[0] + (1e-4 * i).astype(args[0].dtype),)

for name, fn in [("einsum matmul resize", einsum_resize),
                 ("phase-interleave resize", interleave_resize)]:
    dt = device_time(jax.jit(fn), x, iters=10, trials=3, perturb=perturb)
    print(f"{name:28s} {dt*1e3:7.3f} ms/batch")

x3 = x.reshape(B, 256, 256)

def interleave_resize3(x):
    def up1(v, axis):
        n = v.shape[axis]
        idx = lambda s, e: jax.lax.slice_in_dim(v, s, e, axis=axis)
        prev = jnp.concatenate([idx(0, 1), idx(0, n - 1)], axis=axis)
        nxt = jnp.concatenate([idx(1, n), idx(n - 1, n)], axis=axis)
        f = v.astype(jnp.float32)
        e0 = (0.25 * prev.astype(jnp.float32) + 0.75 * f).astype(v.dtype)
        e1 = (0.75 * f + 0.25 * nxt.astype(jnp.float32)).astype(v.dtype)
        st = jnp.stack([e0, e1], axis=axis + 1)
        shape = list(v.shape)
        shape[axis] = 2 * n
        return st.reshape(shape)
    return up1(up1(x, 1), 2)

def einsum_resize3(x):
    ah = jnp.asarray(np.asarray(jax.jit(lambda: None)() or 0)) if False else None
    from empanada_tpu.ops.interpolate import _resize_matrix
    a1 = jnp.asarray(_resize_matrix(256, 512, False), jnp.bfloat16)
    t = jnp.einsum("oh,nhw->now", a1, x)
    return jnp.einsum("ow,nhw->nho", a1, t)

dt = device_time(jax.jit(interleave_resize3), x3, iters=10, trials=3, perturb=perturb)
print(f"{'interleave on (N,H,W)':28s} {dt*1e3:7.3f} ms/batch")
dt = device_time(jax.jit(einsum_resize3), x3, iters=10, trials=3, perturb=perturb)
print(f"{'einsum on (N,H,W)':28s} {dt*1e3:7.3f} ms/batch")

dt = device_time(jax.jit(lambda v: v + 1), x3, iters=10, trials=3, perturb=perturb)
print(f"{'floor: x+1 on (8,256,256)':28s} {dt*1e3:7.3f} ms/batch")
big = jnp.zeros((8, 512, 512), jnp.bfloat16)
dt = device_time(jax.jit(lambda v: v + 1), big, iters=10, trials=3, perturb=perturb)
print(f"{'floor: x+1 on (8,512,512)':28s} {dt*1e3:7.3f} ms/batch")
