"""Multi-pass stage-level profile of the 3D pipeline (round-4 iteration aid).

Runs MultiChipEngine3d.infer_on_axis over the bench fixture several times,
printing per-pass wall, throughput, and the full StageTimer report, with
A/B toggles for the round-4 overlap machinery (drain thread, parallel seg
build).  The dev tunnel's RPC tax is bursty — multiple passes in one
process separate real regressions from transfer noise.

Usage: python benchmarks/profile_3d_stages.py [--passes 4] [--sync-drain]
       [--build-workers N] [--batch N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from empanada_tpu.models import create_model
from empanada_tpu.parallel import MultiChipEngine3d
from empanada_tpu.utils import StageTimer

p = argparse.ArgumentParser()
p.add_argument("--passes", type=int, default=4)
p.add_argument("--sync-drain", action="store_true")
p.add_argument("--build-workers", type=int, default=None)
p.add_argument("--batch", type=int, default=None)
p.add_argument("--hw", type=int, default=512)
p.add_argument("--depth", type=int, default=64)
args = p.parse_args()

D, H, W = args.depth, args.hw, args.hw
rng = np.random.default_rng(0)
field = gaussian_filter(rng.normal(0, 1, (D, H, W)), (2, 8, 8))
field /= field.std()
volume = ((field > 0.6) * 110 + 90 + rng.normal(0, 6, (D, H, W))).clip(0, 255).astype(np.uint8)

model = create_model(
    "PanopticDeepLabPR", encoder="resnet50", num_classes=1, stage4_stride=16,
    decoder_channels=256, low_level_stages=(1,), low_level_channels_project=(32,),
    ins_decoder=True, subdivision_num_points=8192, dtype=jnp.bfloat16,
)
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0)}, jnp.zeros((1, H, W, 1), jnp.float32), train=False)

config = {
    "model_name": "bench", "class_names": {1: "mito"}, "labels": [1],
    "thing_list": [1], "norms": {"mean": 0.57, "std": 0.12},
    "padding_factor": 128, "description": "",
}
engine = MultiChipEngine3d(
    config, label_divisor=1000, median_kernel_size=3, batch_size=args.batch,
    max_centers=512, compute_dtype=jnp.bfloat16,
    model_and_variables=(model, variables),
)
if args.sync_drain:
    engine.drain_async = False
if args.build_workers is not None:
    engine.seg_build_workers = args.build_workers

t0 = time.perf_counter()
engine.infer_on_axis(volume[:8], "xy")
print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)

for i in range(args.passes):
    timer = StageTimer()
    t0 = time.perf_counter()
    _, trackers = engine.infer_on_axis(volume, "xy", timer=timer)
    dt = time.perf_counter() - t0
    rep = timer.report()
    stages = {k: round(v["total_s"], 3) for k, v in sorted(rep.items())}
    n_inst = sum(len(t.instances) for t in trackers)
    print(f"pass {i}: {dt:.2f}s  {D*H*W/dt/1e6:.2f} Mvox/s  "
          f"batch={engine.last_batch_size} inst={n_inst}", flush=True)
    print(f"  stages: {stages}", flush=True)
