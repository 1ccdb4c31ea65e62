"""Multi-model panoptic throughput: NucleoNet+DropNet-arch 2D inference.

BASELINE.md lists "NucleoNet+DropNet multi-model panoptic" among the configs
to benchmark.  Both published models are PanopticDeepLabPR/resnet50 (configs/
NucleoNet_base_v2.yaml, DropNet_base_v1.yaml), so the workload is the SAME
jitted pipeline applied with two weight sets per slice batch plus the host
combine (api.combine_panoptic_maps).  Reported number = megavoxels/sec/chip
of COMBINED output (each voxel passes through the device twice — the raw
device work is 2x the reported rate).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.api.inference import combine_panoptic_maps
from empanada_tpu.models import create_model
from empanada_tpu.ops import postprocess as pp
from empanada_tpu.utils import device_time

H = W = 512
B = 8

KW = dict(
    encoder="resnet50", num_classes=1, stage4_stride=16, decoder_channels=256,
    low_level_stages=(1,), low_level_channels_project=(32,), ins_decoder=True,
    subdivision_num_points=8192,
)

model = create_model("PanopticDeepLabPR", dtype=jnp.bfloat16, **KW)
sample = jnp.zeros((1, H, W, 1), jnp.float32)
var_a = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0)}, sample, train=False)
var_b = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(1)}, sample, train=False)

thing_list = (1,)


def post_one(sem_l, ctr, off):
    sem = pp.logits_to_prob(sem_l[None].astype(jnp.float32))
    cells = pp.get_instance_cells(
        ctr[None].astype(jnp.float32), off[None].astype(jnp.float32),
        coarse_boundaries=True, upsampling=1,
        threshold=0.1, nms_kernel=7, max_centers=256,
    )
    sem_h = pp.harden_seg(sem, 0.5)
    ins = jnp.where(pp._thing_mask(sem_h, thing_list), cells, 0)
    pan = pp.merge_semantic_and_instance(
        sem_h, ins, 1000, thing_list, 64, 0, num_classes=2, max_centers=256)
    return pan[0]


@jax.jit
def two_model_batch(va, vb, images):
    out_a = model.apply(va, images, train=False, render_steps=2,
                        interpolate_ins=False)
    out_b = model.apply(vb, images, train=False, render_steps=2,
                        interpolate_ins=False)
    pan_a = jax.vmap(post_one)(out_a["sem_logits"], out_a["ctr_hmp"],
                               out_a["offsets"])
    pan_b = jax.vmap(post_one)(out_b["sem_logits"], out_b["ctr_hmp"],
                               out_b["offsets"])
    return pan_a, pan_b


rng = np.random.default_rng(0)
from scipy.ndimage import gaussian_filter
raw = rng.normal(0, 1, (B, H, W, 1))
raw = np.stack([gaussian_filter(im, (12, 12, 0)) for im in raw])
raw = (raw - raw.mean()) / (raw.std() + 1e-6)
images = jnp.asarray(raw, jnp.float32)

dt = device_time(two_model_batch, var_a, var_b, images, iters=8, trials=3,
                 perturb=lambda a, i: (a[0], a[1],
                                       a[2] + (1e-4 * i).astype(a[2].dtype)))
mvox = B * H * W / dt / 1e6
print(f"device two-model pipeline: {dt*1e3:.1f} ms/batch  "
      f"{mvox:.1f} Mvox/s combined-output ({2*mvox:.1f} Mvox/s device work)")

# host combine tax
pa, pb = jax.device_get(two_model_batch(var_a, var_b, images))
cfg_a = {"model_name": "NucleoNet", "class_names": {1: "nuclei"}, "labels": [1]}
cfg_b = {"model_name": "DropNet", "class_names": {1: "droplet"}, "labels": [1]}
t0 = time.perf_counter()
for k in range(B):
    combined, names = combine_panoptic_maps([pa[k], pb[k]], [cfg_a, cfg_b])
t_comb = (time.perf_counter() - t0) / B
print(f"host combine: {t_comb*1e3:.2f} ms/slice "
      f"({H*W/t_comb/1e6:.0f} Mvox/s, overlapped with device in practice)")
