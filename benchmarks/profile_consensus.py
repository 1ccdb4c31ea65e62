"""Ortho-plane consensus host throughput on a synthetic 3-axis volume."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.ndimage import gaussian_filter, label as cc_label

from empanada_tpu.stitch.consensus import merge_objects_from_trackers
from empanada_tpu.stitch.patterns import (
    apply_matchers, backward_matching, create_axis_trackers, create_matchers,
    finish_tracking, update_trackers)
from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg
from empanada_tpu.core.masks import take

D = H = W = 256
LABEL_DIVISOR = 1000
rng = np.random.default_rng(0)
sig = float(os.environ.get("SIGMA", 6))
field = gaussian_filter(rng.normal(0, 1, (D, H, W)), (sig, sig, sig))
field /= field.std()
fg = field > 0.8
lab, n = cc_label(fg)
pan = (lab > 0).astype(np.int32) * LABEL_DIVISOR + lab.astype(np.int32)
print(f"volume {D}^3, {n} instances, fg {fg.mean():.3f}")

t0 = time.perf_counter()
trackers = create_axis_trackers(["xy", "xz", "yz"], {1: "mito"}, LABEL_DIVISOR,
                                (D, H, W))
for ax_i, axis in enumerate(["xy", "xz", "yz"]):
    matchers = create_matchers([1], LABEL_DIVISOR, 0.25, 0.25)
    stack = []
    for z in range(pan.shape[ax_i]):
        rle_seg = pan_seg_to_rle_seg(take(pan, z, ax_i), [1], LABEL_DIVISOR, [1],
                                     force_connected=True)
        stack.append(apply_matchers(rle_seg, matchers))
    for z, rle_seg in backward_matching(stack, matchers, pan.shape[ax_i]):
        update_trackers(rle_seg, z, trackers[axis])
    finish_tracking(trackers[axis])
t1 = time.perf_counter()

class_trackers = [trackers[ax][0] for ax in ["xy", "xz", "yz"]]
n_per_axis = [len(t.instances) for t in class_trackers]
print(f"per-axis instance counts: {n_per_axis}, tracking {t1-t0:.2f}s")

t2 = time.perf_counter()
consensus = merge_objects_from_trackers(
    class_trackers, pixel_vote_thr=2, cluster_iou_thr=0.75)
t3 = time.perf_counter()
print(f"consensus merge: {t3-t2:.2f}s -> {len(consensus)} instances "
      f"(cc truth {n})")
print(f"TOTAL {t3-t0:.2f}s -> {D*H*W*3/(t3-t0)/1e6:.1f} Mvox/s (3 axes)")
