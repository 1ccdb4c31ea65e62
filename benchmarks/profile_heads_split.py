"""Heads-stage split at 512^2 x B8: encoder+decoders vs +3 heads vs full
render_steps=0 forward.  Round-5 finding: the apparent ~4 ms 'heads gap' in
the r4 prefix attribution was a decoders-prefix underestimate (jitter); the
three heads cost ~1.4 ms (sem_head_only DCEs the instance decoder, which is
how the split isolates it)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from empanada_tpu.models import create_model
from empanada_tpu.utils import device_time

H = W = 512; B = 8
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(0, 1, (B, H, W, 1)), jnp.float32)
def p_img(a, i): return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype))

model = create_model(
    "PanopticDeepLabPR", encoder="resnet50", num_classes=1, stage4_stride=16,
    decoder_channels=256, low_level_stages=(1,), low_level_channels_project=(32,),
    ins_decoder=True, subdivision_num_points=8192, dtype=jnp.bfloat16)
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0)}, jnp.zeros((1,H,W,1), jnp.float32), train=False)

def encdec(v, x):
    return model.apply(v, x, train=False,
                       method=lambda m, x, train: m._encode_decode(x, train))

def heads_only(v, x):
    def m_fn(m, x, train):
        s, i = m._encode_decode(x, train)
        sem = m.semantic_head(s, train)
        ctr = m.ins_center(i, train)
        off = m.ins_xy(i, train)
        return sem, ctr, off
    return model.apply(v, x, train=False, method=m_fn)

def sem_head_only(v, x):
    def m_fn(m, x, train):
        s, i = m._encode_decode(x, train)
        return m.semantic_head(s, train)
    return model.apply(v, x, train=False, method=m_fn)

def step0(v, x):
    return model.apply(v, x, train=False, render_steps=0, interpolate_ins=False)

for name, fn in [("encdec", encdec), ("sem_head", sem_head_only),
                 ("3 heads", heads_only), ("step0(full)", step0)]:
    dt = device_time(jax.jit(fn), variables, images, iters=8, trials=3, perturb=p_img)
    print(f"{name:12s} {dt*1e3:7.2f} ms")
