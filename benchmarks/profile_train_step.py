"""Training-step throughput: MitoNet_v1 arch, PanopticLoss, AdamW, bf16.

Reference training runs single-GPU torch AMP (empanada_napari/train.py);
this measures our jitted train step on one TPU chip at the reference's
default finetune crop (256^2).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.models import create_model
from empanada_tpu.train.losses import PanopticLoss
from empanada_tpu.train.state import (
    adamw_with_decay_mask, create_train_state, make_train_step, onecycle_schedule)
from empanada_tpu.utils import device_time

H = W = 256
B = 16

model = create_model(
    "PanopticDeepLabPR", encoder="resnet50", num_classes=1, stage4_stride=16,
    decoder_channels=256, low_level_stages=(1,), low_level_channels_project=(32,),
    ins_decoder=True, subdivision_num_points=8192, dtype=jnp.bfloat16,
)
tx = adamw_with_decay_mask(onecycle_schedule(3e-3, 1000), weight_decay=0.1)
state = create_train_state(model, jax.random.key(0),
                           jnp.zeros((1, H, W, 1), jnp.float32), tx)
criterion = PanopticLoss()
step = make_train_step(criterion)

rng = np.random.default_rng(0)
batch = {
    "image": jnp.asarray(rng.normal(0, 1, (B, H, W, 1)), jnp.float32),
    "sem": jnp.asarray(rng.integers(0, 2, (B, H, W)), jnp.int32),
    "ctr_hmp": jnp.asarray(rng.random((B, H, W, 1)), jnp.float32),
    "offsets": jnp.asarray(rng.normal(0, 5, (B, H, W, 2)), jnp.float32),
}
key = jax.random.key(1)

step = make_train_step(criterion, donate=False)
state2, metrics = step(state, batch, key)
print("one step OK, aux:", {k: round(float(v), 3) for k, v in metrics.items()})

def fn(state, image):
    b = dict(batch)
    b["image"] = image
    s2, m = step(state, b, key)
    return sum(m.values())

def pert(a, i):
    return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype))

dt = device_time(jax.jit(fn), state, batch["image"], iters=10, trials=3, perturb=pert)
imgs_s = B / dt
print(f"train step {dt*1e3:.1f} ms/batch -> {imgs_s:.1f} img/s ({imgs_s*H*W/1e6:.1f} Mpx/s) at 256^2 x {B} bf16")
