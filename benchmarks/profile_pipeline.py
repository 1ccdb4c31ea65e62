"""Break down device time: model fwd (fused vs XLA render) / postprocess."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from empanada_tpu.models import create_model
from empanada_tpu.ops import postprocess as pp
from empanada_tpu.utils import device_time

H = W = 512
B = 8

def build(fused):
    model = create_model(
        "PanopticDeepLabPR", encoder="resnet50", num_classes=1, stage4_stride=16,
        decoder_channels=256, low_level_stages=(1,), low_level_channels_project=(32,),
        ins_decoder=True, subdivision_num_points=8192, dtype=jnp.bfloat16,
        fused_render=fused,
    )
    sample = jnp.zeros((1, H, W, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, sample, train=False
    )
    return model, variables

rng = np.random.default_rng(0)
# blob-like inputs (reference test fixtures use seeded Gaussian blobs:
# tests/conftest.py image_2d) — realistic spatial coherence for the
# boundary-adaptive render path; pure noise is pathological for PointRend
from scipy.ndimage import gaussian_filter
imgs = rng.normal(0, 1, (B, H, W, 1))
imgs = np.stack([gaussian_filter(im, (12, 12, 0)) for im in imgs])
imgs = (imgs - imgs.mean()) / (imgs.std() + 1e-6)
images = jnp.asarray(imgs, jnp.float32)

thing_list = (1,)

def make_pipeline(model):
    def post_one(sem_l, ctr, off):
        sem = pp.logits_to_prob(sem_l[None].astype(jnp.float32))
        cells = pp.get_instance_cells(
            ctr[None].astype(jnp.float32), off[None].astype(jnp.float32),
            coarse_boundaries=True, upsampling=1,
            threshold=0.1, nms_kernel=7, max_centers=256,
        )
        sem_h = pp.harden_seg(sem, 0.5)
        ins = jnp.where(pp._thing_mask(sem_h, thing_list), cells, 0)
        return pp.merge_semantic_and_instance(
            sem_h, ins, 1000, thing_list, 64, 0, num_classes=2, max_centers=256
        )[0]

    def fwd(variables, images):
        return model.apply(variables, images, train=False, render_steps=2,
                           interpolate_ins=False)

    def pipeline(variables, images):
        out = fwd(variables, images)
        return jax.vmap(post_one)(out["sem_logits"], out["ctr_hmp"], out["offsets"])

    return fwd, pipeline

for fused in ["never", "auto", "always"]:
    model, variables = build(fused)
    fwd, pipeline = make_pipeline(model)
    dt_f = device_time(jax.jit(fwd), variables, images, iters=10, trials=3)
    dt_p = device_time(jax.jit(pipeline), variables, images, iters=10, trials=3)
    print(f"[fused={fused:5s}] model fwd: {dt_f*1e3:6.2f} ms  full pipeline: "
          f"{dt_p*1e3:6.2f} ms -> {B*H*W/dt_p/1e6:6.1f} Mvox/s")

# --- trained-like logit magnitudes: scale the semantic head so logits are
# confidently bimodal away from boundaries (what trained models produce);
# measure the active-tile fraction and fused-render gain in that regime
import flax

def scale_sem_head(variables, gain=8.0):
    v = flax.core.unfreeze(variables) if hasattr(flax.core, "unfreeze") else dict(variables)
    import jax
    params = v["params"]
    def scale_tree(t):
        return jax.tree.map(lambda a: a * gain, t)
    params["semantic_head"] = scale_tree(params["semantic_head"])
    if "semantic_pr" in params:
        ph = params["semantic_pr"]["point_head"]
        ph["predictor"] = scale_tree(ph["predictor"])
    return v

for fused in ["never", "auto"]:
    model, variables = build(fused)
    variables = scale_sem_head(variables)
    fwd, pipeline = make_pipeline(model)
    out = jax.jit(fwd)(variables, images)
    sl = np.asarray(out["sem_logits"], np.float32)
    frac_uncertain = float((np.abs(sl) < np.quantile(np.abs(sl), 8192/ (512*512))).mean())
    dt_f = device_time(jax.jit(fwd), variables, images, iters=10, trials=3)
    dt_p = device_time(jax.jit(pipeline), variables, images, iters=10, trials=3)
    print(f"[gain8 fused={fused:5s}] |logit| p50={np.median(np.abs(sl)):.2f} "
          f"fwd: {dt_f*1e3:6.2f} ms  pipeline: {dt_p*1e3:6.2f} ms -> "
          f"{B*512*512/dt_p/1e6:6.1f} Mvox/s")
