"""Host-side stitching throughput: 64x512x512 synthetic instance volume.

The 3D pipeline's host stages (pan_seg -> RLE -> cross-slice matching ->
trackers -> filters -> fill).  This is the ceiling once device compute is
co-located (no tunnel): device fwd+postprocess runs ~56 Mvox/s/chip, so
host stitching must keep up or the chip starves.

History at SIGMA=9 (unloaded host): 21 Mvox/s (round 1) -> 45 (flat
struct-of-arrays rep through matcher/tracker, native extract_runs) ->
94 (k-way vote kernel, threaded pair intersections).  Outputs identical
throughout.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.ndimage import gaussian_filter, label as cc_label

from empanada_tpu.stitch.patterns import (
    apply_matchers, backward_matching, create_axis_trackers, create_matchers,
    finish_tracking, update_trackers, fill_panoptic_volume, apply_filters)
from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg

D, H, W = 64, 512, 512
LABEL_DIVISOR = 1000
rng = np.random.default_rng(0)

# synthetic blob instance volume: ~EM-like density
import os
sig = float(os.environ.get("SIGMA", 9))
field = gaussian_filter(rng.normal(0, 1, (D, H, W)), (3, sig, sig))
field /= field.std()
fg = field > 0.8
lab, n = cc_label(fg)
print(f"synthetic volume: {n} 3D instances, fg {fg.mean():.3f}")

# per-slice pan_segs (class 1 things)
pan_slices = (lab > 0).astype(np.int32) * LABEL_DIVISOR + lab.astype(np.int32)

t0 = time.perf_counter()
rle_stack = []
matchers = create_matchers([1], LABEL_DIVISOR, 0.25, 0.25)
t_rle = t_match = 0.0
for z in range(D):
    ta = time.perf_counter()
    rle_seg = pan_seg_to_rle_seg(pan_slices[z], [1], LABEL_DIVISOR, [1], force_connected=True)
    tb = time.perf_counter()
    rle_seg = apply_matchers(rle_seg, matchers)
    tc = time.perf_counter()
    t_rle += tb - ta
    t_match += tc - tb
    rle_stack.append(rle_seg)
t1 = time.perf_counter()

trackers = create_axis_trackers(["xy"], {1: "mito"}, LABEL_DIVISOR, (D, H, W))
tb0 = time.perf_counter()
for z, rle_seg in backward_matching(rle_stack, matchers, D):
    update_trackers(rle_seg, z, trackers["xy"])
finish_tracking(trackers["xy"])
tb1 = time.perf_counter()

for tr in trackers["xy"]:
    apply_filters(tr, [{"name": "remove_small_objects", "min_size": 100}])
tf1 = time.perf_counter()

vol = np.zeros((D, H, W), np.uint32)
fill_panoptic_volume(vol, trackers["xy"])
tv1 = time.perf_counter()

total = tv1 - t0
mvox = D * H * W / total / 1e6
print(f"fwd pass: rle {t_rle:.2f}s match {t_match:.2f}s | backward+track {tb1-tb0:.2f}s "
      f"| filters {tf1-tb1:.2f}s | fill {tv1-tf1:.2f}s")
print(f"TOTAL host stitching {total:.2f}s -> {mvox:.1f} Mvox/s")
n_out = len(np.unique(vol)) - 1
print(f"instances out: {n_out} (3D cc truth: {n})")
