"""Host-side critical path of the 3D pipeline, component by component.

Round-4 steady state (profile_3d_stages.py) shows the stream wall is set by
the drainer/matcher chain, not the device: fetch 0.37s + decode+enqueue
0.90s (drainer thread) ~ matcher 0.80s (matcher thread) per 64-slice pass.
This script reproduces the BENCH fixture's actual per-slice postprocess
outputs (CPU forward, same weights), then times each host component in
isolation and cProfiles the matcher to find the hot lines.

Run with JAX_PLATFORMS=cpu (forward is slow but identical).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from empanada_tpu.models import create_model
from empanada_tpu.parallel import MultiChipEngine3d
from empanada_tpu.core.labeling import decode_runs_packed
from empanada_tpu.stitch.patterns import (
    apply_matchers, backward_matching, build_rle_seg, create_matchers,
)

D, H, W = int(os.environ.get("DEPTH", 16)), 512, 512
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
    config, label_divisor=1000, median_kernel_size=3, batch_size=None,
    max_centers=512, compute_dtype=jnp.bfloat16,
    model_and_variables=(model, variables),
)

# capture the per-slice packed buffers the drainer would see
captured = []          # ("runs", decoded, w) or dense np
packed_bufs = []       # raw (2R+1,) int16 rows for decode timing

import empanada_tpu.parallel.data_parallel as dp

orig_decode = decode_runs_packed

t0 = time.perf_counter()
b = engine._resolve_batch(volume.shape, 0)
mr = engine._max_runs(W)
render_steps = 2
sem_prev = None
n_batches = -(-D // b)
sems = []
for j in range(n_batches):
    sl = volume[j * b:(j + 1) * b]
    if sl.shape[0] < b:
        sl = np.concatenate([sl, np.repeat(sl[-1:], b - sl.shape[0], 0)])
    images = jnp.asarray(sl[..., None])
    sem, ctr, off = engine._forward(engine.variables, images,
                                    jnp.float32(255.0), render_steps=2,
                                    normalize=True)
    sems.append((sem, ctr, off))
print(f"forward done: {time.perf_counter()-t0:.1f}s ({n_batches} batches of {b})")

mid = engine.mid
K = -(-mid // b)
for j in range(n_batches):
    ctx = tuple(sems[min(max(j + i - K, 0), n_batches - 1)][0]
                for i in range(2 * K + 1))
    _, ctr, off = sems[j]
    start, stop = j * b, min((j + 1) * b, D)
    idxs = np.arange(start, stop)
    win_idx = np.clip(idxs[:, None] + np.arange(-mid, mid + 1)[None, :], 0, D - 1)
    use_median = (idxs >= mid) & (idxs < D - mid)
    if stop - start < b:
        pad = b - (stop - start)
        win_idx = np.concatenate([win_idx, np.repeat(win_idx[-1:], pad, 0)])
        use_median = np.concatenate([use_median, np.zeros(pad, bool)])
    base = j - K
    win_local = (win_idx // b - base) * b + win_idx % b
    pans_dev, packed, n_over = engine._post_batch(
        ctx, ctr, off, jnp.asarray(win_local), jnp.asarray(use_median),
        upsampling=1, crop=(H, W), max_runs=mr,
    )
    packed_np = np.asarray(packed)[: stop - start]
    for bi, row_buf in enumerate(packed_np):
        packed_bufs.append(np.array(row_buf))
        decoded = decode_runs_packed(row_buf, W)
        captured.append(("runs", decoded, W) if decoded is not None
                        else np.asarray(pans_dev)[bi].astype(np.int64))
print(f"captured {len(captured)} slices "
      f"({sum(1 for c in captured if isinstance(c, tuple))} packed)")
nruns = [len(c[1][0]) if isinstance(c, tuple) else -1 for c in captured]
print(f"runs/slice: min {min(nruns)} max {max(nruns)} mean {np.mean(nruns):.0f}")

# --- component timings (serial, per-slice) ---
t0 = time.perf_counter()
for buf in packed_bufs:
    decode_runs_packed(buf, W)
t_decode = time.perf_counter() - t0

t0 = time.perf_counter()
rle_segs = [build_rle_seg(c, [1], 1000, [1], True) for c in captured]
t_build = time.perf_counter() - t0
ninst = [len(s[1]["starts"]) if isinstance(s[1], dict) and "starts" in s[1]
         else len(s[1]) for s in (None,)] if False else None
print(f"instances/slice: mean "
      f"{np.mean([len(next(iter(s.values()))) for s in rle_segs]):.0f}")

matchers = create_matchers([1], 1000, 0.25, 0.25)
t0 = time.perf_counter()
matched = [apply_matchers(dict(s), matchers) for s in rle_segs]
t_match = time.perf_counter() - t0

t0 = time.perf_counter()
for _ in backward_matching(matched, matchers, D):
    pass
t_back = time.perf_counter() - t0

print(f"decode  : {t_decode:.3f}s ({t_decode/D*1000:.2f} ms/slice)")
print(f"build   : {t_build:.3f}s ({t_build/D*1000:.2f} ms/slice)")
print(f"match   : {t_match:.3f}s ({t_match/D*1000:.2f} ms/slice)")
print(f"backward: {t_back:.3f}s ({t_back/D*1000:.2f} ms/slice)")

# --- cProfile the matcher (fresh matchers, same inputs) ---
import cProfile
import pstats

matchers = create_matchers([1], 1000, 0.25, 0.25)
pr = cProfile.Profile()
pr.enable()
for s in rle_segs:
    apply_matchers(dict(s), matchers)
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
