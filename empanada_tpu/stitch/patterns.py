"""Orchestration vocabulary for 3D stitched inference (reference
``empanada/inference/patterns.py``).

The reference overlaps GPU inference with CPU RLE/matching via a
``multiprocessing`` matcher process fed through an ``mp.Queue``.  Here the
device side is JAX, whose dispatch is already asynchronous — a plain
``threading.Thread`` + ``queue.Queue`` gives the same overlap (the host
matcher crunches RLEs while XLA runs the next slice) without process spawn,
pickling, or the reference's fragile spawn-context issues (multigpu.py:228).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from empanada_tpu.core import numpy_fill_instances
from empanada_tpu.core.chunked import ChunkedArray, chunked_fill_instances
from empanada_tpu.stitch import filters as filters_mod
from empanada_tpu.stitch.consensus import (
    merge_objects_from_trackers,
    merge_semantic_from_trackers,
)
from empanada_tpu.stitch.matcher import RLEMatcher
from empanada_tpu.stitch.rle_seg import (
    packed_to_flat_seg,
    packed_to_rle_seg,
    pan_seg_to_rle_seg,
    runs_to_flat_seg,
    runs_to_rle_seg,
)
from empanada_tpu.stitch.tracker import InstanceTracker

__all__ = [
    "create_matchers",
    "create_axis_trackers",
    "apply_matchers",
    "MatcherWorker",
    "forward_matching",
    "backward_matching",
    "update_trackers",
    "finish_tracking",
    "apply_filters",
    "get_axis_trackers_by_class",
    "create_instance_consensus",
    "create_semantic_consensus",
    "fill_volume",
    "fill_panoptic_volume",
]

FINISH = "finish"


def create_matchers(thing_list, label_divisor, merge_iou_thr, merge_ioa_thr):
    return [
        RLEMatcher(tc, label_divisor, merge_iou_thr, merge_ioa_thr)
        for tc in thing_list
    ]


def create_axis_trackers(axes, class_labels, label_divisor, shape):
    return {
        axis_name: [
            InstanceTracker(class_id, label_divisor, shape, axis_name)
            for class_id in class_labels
        ]
        for axis_name in axes
    }


def apply_matchers(rle_seg: dict, matchers) -> dict:
    for matcher in matchers:
        class_id = matcher.class_id
        if not matcher.has_target():
            matcher.initialize_target(rle_seg[class_id])
        else:
            rle_seg[class_id] = matcher(rle_seg[class_id])
    return rle_seg


def apply_matchers_flat(flat_seg: dict, matchers) -> dict:
    """apply_matchers on the flat wire (``{class_id: FlatInstances}``) — no
    nested dict materialization on the sequential matcher thread."""
    for matcher in matchers:
        class_id = matcher.class_id
        if not matcher.has_target():
            matcher.initialize_target_flat(flat_seg[class_id])
        else:
            flat_seg[class_id] = matcher.match_flat(flat_seg[class_id])
    return flat_seg


def build_rle_seg(pan_seg, labels, label_divisor, thing_list,
                  force_connected: bool = True):
    """Construct a per-slice rle_seg from a dense pan_seg array, a
    device-compacted ``("runs", (values, rows, cs, ce), width)`` tuple, or a
    raw packed buffer ``("packed", row_buf, width)`` (the drainer hands the
    device bytes straight through; decode+CC+grouping happen in ONE
    GIL-released native call, csrc packed_build_flat).

    This is the order-independent half of forward matching (per-slice
    connected components + RLE grouping) — safe to run concurrently across
    slices; only ``apply_matchers`` must see slices in order."""
    if isinstance(pan_seg, tuple) and pan_seg[0] == "packed":
        _, row_buf, width = pan_seg
        rle_seg = packed_to_rle_seg(
            row_buf, width, labels, label_divisor, thing_list,
            force_connected=force_connected,
        )
        # None = packed-capacity overflow; callers pre-screen counts and
        # send the dense map instead, so this is defensive
        if rle_seg is None:
            raise ValueError("packed slice overflowed its run capacity")
        return rle_seg
    if isinstance(pan_seg, tuple) and pan_seg[0] == "runs":
        _, (values, rows, cs, ce), width = pan_seg
        return runs_to_rle_seg(
            values, rows, cs, ce, width,
            labels, label_divisor, thing_list, force_connected=force_connected,
        )
    return pan_seg_to_rle_seg(
        np.asarray(pan_seg), labels, label_divisor, thing_list,
        force_connected=force_connected,
    )


def build_flat_seg(pan_seg, labels, label_divisor, thing_list,
                   force_connected: bool = True) -> dict:
    """build_rle_seg stopping at the flat wire (``{class_id:
    FlatInstances}``) — what MatcherWorker streams internally; the nested
    dict only materializes at serialization boundaries (checkpoints)."""
    from empanada_tpu.core.labeling import extract_runs

    if isinstance(pan_seg, tuple) and pan_seg[0] == "packed":
        _, row_buf, width = pan_seg
        flat_seg = packed_to_flat_seg(
            row_buf, width, labels, label_divisor, thing_list,
            force_connected=force_connected,
        )
        if flat_seg is None:
            raise ValueError("packed slice overflowed its run capacity")
        return flat_seg
    if isinstance(pan_seg, tuple) and pan_seg[0] == "runs":
        _, (values, rows, cs, ce), width = pan_seg
        return runs_to_flat_seg(
            values, rows, cs, ce, width,
            labels, label_divisor, thing_list, force_connected=force_connected,
        )
    pan_seg = np.asarray(pan_seg)
    values, rows, cs, ce = extract_runs(pan_seg)
    return runs_to_flat_seg(
        values, rows, cs, ce, pan_seg.shape[1],
        labels, label_divisor, thing_list, force_connected=force_connected,
    )


def forward_matching(matchers, in_queue, rle_stack, labels, label_divisor,
                     thing_list, force_connected: bool = True, stats=None):
    """Consumer loop: dense pan_seg -> RLE -> forward match -> stack.

    Accepts numpy pan_segs from ``in_queue``; ``None`` items are skipped
    (median queue filling); the ``FINISH`` sentinel ends the loop.  A
    device-compacted slice arrives as ``("runs", (values, rows, cs, ce),
    width)`` (see ops.postprocess.encode_runs_packed) and skips the dense
    extract_runs pass.  A ``concurrent.futures.Future`` item resolves to a
    ``(rle_seg, build_seconds)`` pair from a parallel seg-build pool
    (MatcherWorker); its exception (if any) re-raises here.

    ``stats`` (optional dict) accumulates ``busy_s``: seconds spent
    processing items in THIS loop, excluding queue waits — the sequential
    host-matcher cost even when it runs concurrently with device compute.
    Pool-built slices add their construction time under ``build_s``.
    """
    import time
    from concurrent.futures import Future

    while True:
        pan_seg = in_queue.get()
        if pan_seg is None:
            continue
        if isinstance(pan_seg, str):
            break
        if isinstance(pan_seg, Future):
            rle_seg, dt = pan_seg.result()
            if stats is not None:
                stats["build_s"] = stats.get("build_s", 0.0) + dt
            t0 = time.perf_counter()
        else:
            t0 = time.perf_counter()
            rle_seg = build_flat_seg(pan_seg, labels, label_divisor,
                                     thing_list, force_connected)
        rle_seg = apply_matchers_flat(rle_seg, matchers)
        rle_stack.append(rle_seg)
        if stats is not None:
            stats["busy_s"] = stats.get("busy_s", 0.0) + time.perf_counter() - t0
    return rle_stack


class MatcherWorker:
    """Thread running forward_matching concurrently with device inference.

    Slice-order matching is inherently sequential, but per-slice rle_seg
    construction (connected components + RLE grouping — the expensive half
    at EM instance densities) is not: ``put`` farms construction out to a
    small thread pool and enqueues ordered futures, so the matcher loop
    only pays ``apply_matchers`` per slice.  The C++ kernels underneath
    (extract_runs, union-find CC) release the GIL, so pool workers scale.

    A failure inside the thread (e.g. a device error surfacing at the
    ``np.asarray`` fetch of an enqueued device map) must not deadlock the
    producer: the worker keeps draining the bounded queue after an error so
    ``put`` never blocks forever, and ``finish`` re-raises the exception."""

    def __init__(self, matchers, labels, label_divisor, thing_list,
                 maxsize: int = 8, force_connected: bool = True,
                 build_workers: int | None = None):
        import os

        self.queue = queue.Queue(maxsize=maxsize)
        self.rle_stack = []
        self.error = None
        # busy_s: sequential matcher-loop cost; build_s: summed parallel
        # seg-construction cost (wall overlap makes these non-additive)
        self.stats = {"busy_s": 0.0, "build_s": 0.0}
        if build_workers is None:
            # <= 3-core hosts: a pool is pure queue/context-switch overhead
            # (no parallelism to win); build inline in the matcher loop.
            # The C++ build kernel releases the GIL either way, so on real
            # multi-core TPU hosts the pool scales across cores.
            build_workers = min(3, max(0, (os.cpu_count() or 4) - 3))
        self._pool = None
        if build_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=build_workers,
                thread_name_prefix="segbuild",
            )
        self._build_args = (labels, label_divisor, thing_list, force_connected)
        self._thread = threading.Thread(target=self._run, args=(
            matchers, labels, label_divisor, thing_list, force_connected),
            daemon=True)
        self._thread.start()

    def _run(self, matchers, labels, label_divisor, thing_list, force_connected):
        try:
            forward_matching(
                matchers, self.queue, self.rle_stack, labels, label_divisor,
                thing_list, force_connected, stats=self.stats,
            )
        except BaseException as exc:  # noqa: BLE001 — re-raised in finish()
            self.error = exc
            # keep consuming so the producer's bounded put never blocks
            while True:
                item = self.queue.get()
                if isinstance(item, str):
                    break

    def _build(self, pan_seg):
        import time

        labels, label_divisor, thing_list, force_connected = self._build_args
        t0 = time.perf_counter()
        rle_seg = build_flat_seg(pan_seg, labels, label_divisor, thing_list,
                                 force_connected)
        return rle_seg, time.perf_counter() - t0

    def put(self, pan_seg):
        if self._pool is not None and pan_seg is not None \
                and not isinstance(pan_seg, str):
            self.queue.put(self._pool.submit(self._build, pan_seg))
        else:
            self.queue.put(pan_seg)

    def finish(self):
        self.queue.put(FINISH)
        self._thread.join()
        if self._pool is not None:
            self._pool.shutdown(wait=False)
        if self.error is not None:
            raise RuntimeError("matcher worker failed") from self.error
        return self.rle_stack


def backward_matching(rle_stack, matchers, axis_len: int):
    """Generator: reverse pass with assign_new=False, yielding
    (index, matched rle_seg) per plane.

    Stack entries may mix wire dicts (checkpoint-loaded slices) and flat
    segs (MatcherWorker output) per class; matching runs on the flat forms
    and yields whatever each entry holds — consumers (update_trackers)
    accept both."""
    from empanada_tpu.core.labeling import FlatInstances

    for matcher in matchers:
        matcher.reset_target()
        matcher.assign_new = False

    for rev_idx in range(axis_len - 1, -1, -1):
        rle_seg = rle_stack[rev_idx]
        for matcher in matchers:
            class_id = matcher.class_id
            entry = rle_seg[class_id]
            flat = (entry if isinstance(entry, FlatInstances)
                    else FlatInstances.from_dict(entry))
            if not matcher.has_target():
                matcher.initialize_target_flat(flat)
            else:
                rle_seg[class_id] = matcher.match_flat(flat)
        yield rev_idx, rle_seg


def update_trackers(rle_seg, index, trackers):
    for tracker in trackers:
        tracker.update(rle_seg[tracker.class_id], index)


def finish_tracking(trackers):
    for tracker in trackers:
        tracker.finish()


def apply_filters(tracker, filters_list):
    """Name-dispatched in-place tracker filters (patterns.py:141)."""
    if filters_list is not None:
        for filt in filters_list:
            name = filt["name"]
            kwargs = {k: v for k, v in filt.items() if k != "name"}
            getattr(filters_mod, name)(tracker, **kwargs)


def get_axis_trackers_by_class(trackers: dict, class_id: int):
    return [
        tracker
        for axis_trackers in trackers.values()
        for tracker in axis_trackers
        if tracker.class_id == class_id
    ]


def create_instance_consensus(
    class_trackers, pixel_vote_thr: int = 2, cluster_iou_thr: float = 0.75, bypass: bool = False
) -> InstanceTracker:
    class_id = class_trackers[0].class_id
    label_divisor = class_trackers[0].label_divisor
    shape = class_trackers[0].shape3d
    consensus_tracker = InstanceTracker(class_id, label_divisor, shape, "xy")
    consensus_tracker.instances = merge_objects_from_trackers(
        class_trackers, pixel_vote_thr, cluster_iou_thr, bypass
    )
    consensus_tracker.finished = True
    return consensus_tracker


def create_semantic_consensus(class_trackers, pixel_vote_thr: int = 2) -> InstanceTracker:
    class_id = class_trackers[0].class_id
    label_divisor = class_trackers[0].label_divisor
    shape = class_trackers[0].shape3d
    consensus_tracker = InstanceTracker(class_id, label_divisor, shape, "xy")
    consensus_tracker.instances = merge_semantic_from_trackers(class_trackers, pixel_vote_thr)
    consensus_tracker.finished = True
    return consensus_tracker


def fill_volume(volume, instances, processes: int = 4):
    """Fill a numpy array or ChunkedArray with RLE instances, in-place."""
    if isinstance(volume, np.ndarray):
        numpy_fill_instances(volume, instances)
    elif isinstance(volume, ChunkedArray):
        chunked_fill_instances(volume, instances, processes)
    else:
        raise TypeError(f"Unknown volume type of {type(volume)}")


def fill_panoptic_volume(volume, trackers, processes: int = 4):
    for tracker in trackers:
        fill_volume(volume, tracker.instances, processes)
