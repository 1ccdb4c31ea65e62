"""int8 execution A/B on representative resnet50 conv shapes (VERDICT r1
item 7).

Variants per conv:
  bf16      — current path: bf16 weights x bf16 acts (MXU bf16 peak)
  w8        — int8 weights dequantized in-graph (HBM weight reads shrink 2x
              vs bf16; compute still bf16)
  int8      — dynamic per-tensor act quant + int8 x int8 -> int32 conv
              (MXU int8 peak is 2x bf16 on v5e) + rescale

The reference computes int8 on CPU via fbgemm
(/root/reference/empanada/models/quantization/panoptic_deeplab.py:17-20);
this measures the TPU analog to decide whether an int8 execution path
should exist beyond int8 storage.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from empanada_tpu.utils import device_time

# (label, N, H, W, Cin, Cout, k, stride) — resnet50 os16 hot shapes at 512^2
SHAPES = [
    ("stage1_3x3", 8, 128, 128, 64, 64, 3, 1),
    ("stage2_3x3", 8, 64, 64, 128, 128, 3, 1),
    ("stage3_3x3", 8, 32, 32, 256, 256, 3, 1),
    ("stage3_1x1", 8, 32, 32, 1024, 256, 1, 1),
    ("stage4_3x3d", 8, 32, 32, 512, 512, 3, 1),
]


def conv(x, w, stride, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}")
    for label, n, h, w_, cin, cout, k, s in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (n, h, w_, cin)), jnp.bfloat16)
        wgt = rng.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32)
        w_bf16 = jnp.asarray(wgt, jnp.bfloat16)
        scale = np.abs(wgt).max(axis=(0, 1, 2), keepdims=True) / 127.0
        w_i8 = jnp.asarray(np.round(wgt / scale).clip(-127, 127), jnp.int8)
        w_scale = jnp.asarray(scale, jnp.bfloat16)

        @jax.jit
        def f_bf16(x, w):
            return conv(x, w, s)

        @jax.jit
        def f_w8(x, w8, sc):
            return conv(x, w8.astype(jnp.bfloat16) * sc, s)

        @jax.jit
        def f_int8(x, w8, sc):
            a = jnp.max(jnp.abs(x)) / 127.0
            xq = jnp.round(x.astype(jnp.float32) / a.astype(jnp.float32))
            xq = jnp.clip(xq, -127, 127).astype(jnp.int8)
            acc = conv(xq, w8, s, preferred=jnp.int32)
            return acc.astype(jnp.bfloat16) * (a.astype(jnp.bfloat16) * sc)

        def perturb(a, k):
            return ((a[0] + (1e-4 * k).astype(a[0].dtype)),) + a[1:]

        t_bf = device_time(f_bf16, x, w_bf16, iters=20, trials=3, perturb=perturb)
        t_w8 = device_time(f_w8, x, w_i8, w_scale, iters=20, trials=3, perturb=perturb)
        t_i8 = device_time(f_int8, x, w_i8, w_scale, iters=20, trials=3, perturb=perturb)

        flops = 2 * n * (h // s) * (w_ // s) * cin * cout * k * k
        print(f"{label:13s} bf16 {t_bf*1e6:8.1f}us ({flops/t_bf/1e12:6.1f} TF) | "
              f"w8 {t_w8*1e6:8.1f}us | int8 {t_i8*1e6:8.1f}us "
              f"({flops/t_i8/1e12:6.1f} TOPS-eq)")


if __name__ == "__main__":
    main()
