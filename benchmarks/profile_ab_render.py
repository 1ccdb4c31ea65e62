"""Interleaved A/B of render modes on the bench pipeline (drift-robust)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

import bench
from empanada_tpu.utils import device_time

variants = {}
for mode in ["never", "always"]:
    import empanada_tpu.models as M
    orig = bench.build
    def build_mode(m=mode):
        import bench as bb
        from empanada_tpu.models import create_model
        from empanada_tpu.ops import postprocess as pp
        model = create_model(
            "PanopticDeepLabPR", encoder="resnet50", num_classes=1,
            stage4_stride=16, decoder_channels=256, low_level_stages=(1,),
            low_level_channels_project=(32,), ins_decoder=True,
            subdivision_num_points=8192, dtype=jnp.bfloat16, fused_render=m)
        sample = jnp.zeros((1, bench.H, bench.W, 1), jnp.float32)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0)}, sample, train=False)
        thing_list = (1,)
        def post_one(sem_l, ctr, off):
            sem = pp.logits_to_prob(sem_l[None].astype(jnp.float32))
            cells = pp.get_instance_cells(
                ctr[None].astype(jnp.float32), off[None].astype(jnp.float32),
                coarse_boundaries=True, upsampling=1,
                threshold=0.1, nms_kernel=7, max_centers=256)
            sem_h = pp.harden_seg(sem, 0.5)
            ins = jnp.where(pp._thing_mask(sem_h, thing_list), cells, 0)
            return pp.merge_semantic_and_instance(
                sem_h, ins, 1000, thing_list, 64, 0, num_classes=2,
                max_centers=256)[0]
        @jax.jit
        def pipeline(variables, images):
            out = model.apply(variables, images, train=False, render_steps=2,
                              interpolate_ins=False)
            return jax.vmap(post_one)(out["sem_logits"], out["ctr_hmp"],
                                      out["offsets"])
        return pipeline, variables
    variants[mode] = build_mode()

rng = np.random.default_rng(0)
raw = rng.normal(0, 1, (bench.BATCH, bench.H, bench.W, 1))
raw = np.stack([gaussian_filter(im, (12, 12, 0)) for im in raw])
raw = (raw - raw.mean()) / (raw.std() + 1e-6)
images = jnp.asarray(raw, jnp.float32)

# interleaved trials
results = {m: [] for m in variants}
for rep in range(5):
    for m, (pipe, v) in variants.items():
        dt = device_time(pipe, v, images, iters=10, trials=1)
        results[m].append(dt * 1e3)
for m, ts in results.items():
    med = float(np.median(ts))
    print(f"{m:6s} trials(ms): {[round(t,2) for t in ts]}  median {med:.2f} "
          f"-> {bench.BATCH*bench.H*bench.W/med/1e3:.1f} Mvox/s")
