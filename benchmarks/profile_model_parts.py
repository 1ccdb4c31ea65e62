"""Decompose MitoNet_v1-arch forward: encoder / decoders / heads / up4."""
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

def enc(v, x):
    return model.apply(v, x, train=False,
                       method=lambda m, x, train: m._encoder(x, train))

pyr = jax.jit(enc)(variables, images)
print("pyramid:", [tuple(p.shape) for p in pyr])

def encdec(v, x):
    return model.apply(v, x, train=False,
                       method=lambda m, x, train: m._encode_decode(x, train))

def semdec(v, pyr):
    return model.apply(v, pyr, train=False,
                       method=lambda m, p, train: m.semantic_decoder(p, train))

def heads_only(v, sx, ix):
    return model.apply(
        v, sx, ix, train=False,
        method=lambda m, a, b, train: m._apply_heads(a, b, train, 0, False))

sx, ix = jax.jit(encdec)(variables, images)

def full(v, x):
    return model.apply(v, x, train=False, render_steps=0, interpolate_ins=False)

def p_img(a, i):
    return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype))

def p_pyr(a, i):
    return (a[0], [p + (1e-4 * i).astype(p.dtype) for p in a[1]])

def p_two(a, i):
    return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype), a[2])

for name, fn, args, pert in [
    ("encoder (resnet50 os16)", enc, (variables, images), p_img),
    ("encoder+both decoders", encdec, (variables, images), p_img),
    ("semantic decoder only", semdec, (variables, pyr), p_pyr),
    ("heads + up4 (given feats)", heads_only, (variables, sx, ix), p_two),
    ("full fwd render_steps=0", full, (variables, images), p_img),
]:
    dt = device_time(jax.jit(fn), *args, iters=10, trials=3, perturb=pert)
    print(f"{name:28s} {dt*1e3:7.2f} ms/batch")
