"""Crash-safe checkpoint/resume for long 3D inference sweeps.

The forward pass of ``Engine3d.infer_on_axis`` streams device slices
through the matcher thread for minutes-to-hours on production volumes; a
crash (preemption, OOM, a dropped device link) loses everything.  This
module persists the forward-matched RLE stack periodically — a packed,
pickle-free ``.npz`` — so a rerun continues from the last checkpoint:

- the median window is re-primed by re-running the device on the
  ``median_kernel//2`` slices preceding the resume point (their outputs
  are discarded), so every kept slice sees the same full median window an
  uninterrupted run would have;
- the cross-slice matcher state is reconstructed exactly (last matched
  slice as target + the global next-label watermark), so instance ids
  continue instead of restarting.

Together these make the resumed result bit-identical to an uninterrupted
run (tests/test_checkpoint_resume.py).  The reference has no analog: its
inference loops are all-or-nothing (empanada_napari/inference.py:526).
"""

from __future__ import annotations

import json
import os

import numpy as np

from empanada_tpu.core.labeling import FlatInstances

__all__ = [
    "ForwardCheckpoint",
    "save_forward_state",
    "load_forward_state",
    "axis_tracker_paths",
    "volume_fingerprint",
]

_FORMAT = "empanada_tpu-forward-v1"


def axis_tracker_paths(checkpoint_dir: str, axis_name: str, labels) -> list:
    return [
        os.path.join(checkpoint_dir, f"trackers_{axis_name}_{int(label)}.json")
        for label in labels
    ]


def axis_tracker_meta_path(checkpoint_dir: str, axis_name: str) -> str:
    return os.path.join(checkpoint_dir, f"trackers_{axis_name}.meta.json")


def volume_fingerprint(volume) -> str:
    """Cheap content fingerprint: shape, dtype, and a strided voxel sample
    hashed together.  Guards resume against a checkpoint dir left over
    from a DIFFERENT volume of the same shape (full-volume hashing would
    cost a complete read of arbitrarily large chunked stores)."""
    import hashlib

    shape = tuple(int(s) for s in volume.shape)
    h = hashlib.sha1()
    h.update(repr((shape, str(np.dtype(volume.dtype)))).encode())
    for z in sorted({0, shape[0] // 2, shape[0] - 1}):
        plane = volume[z]  # chunked stores: plain plane reads only
        if hasattr(plane, "compute"):
            plane = plane.compute()
        plane = np.asarray(plane)
        sub = plane[:: max(1, plane.shape[0] // 64), :: max(1, plane.shape[1] // 64)]
        h.update(np.ascontiguousarray(sub).tobytes())
    return h.hexdigest()


def save_forward_state(path: str, rle_stack: list, meta: dict) -> None:
    """Atomically persist a forward-matched RLE stack.

    ``rle_stack[z]`` is the wire-format dict ``{class_id: {label: {box,
    starts, runs}}}`` for absolute slice ``z``.  Packing is fully
    columnar: one (slice, class) group table plus flat per-instance
    label/box/run arrays — no pickle, loadable with
    ``allow_pickle=False``.
    """
    g_slice, g_class, g_inst_end = [], [], []
    labels_cat, boxes_cat, run_counts = [], [], []
    starts_parts, runs_parts = [], []
    n_inst = 0
    for z, rle_seg in enumerate(rle_stack):
        for class_id, insts in rle_seg.items():
            # MatcherWorker streams the flat wire; loaded slices are dicts
            flat = (insts if isinstance(insts, FlatInstances)
                    else FlatInstances.from_dict(insts))
            g_slice.append(z)
            g_class.append(int(class_id))
            n_inst += len(flat)
            g_inst_end.append(n_inst)
            if len(flat):
                labels_cat.append(flat.labels)
                boxes_cat.append(flat.boxes)
                run_counts.append(np.diff(flat.offsets))
                starts_parts.append(flat.starts)
                runs_parts.append(flat.runs)

    def cat(parts, width=None):
        if parts:
            return np.concatenate(parts)
        shape = (0,) if width is None else (0, width)
        return np.empty(shape, dtype=np.int64)

    payload = {
        "format": np.array(_FORMAT),
        "meta": np.array(json.dumps(meta)),
        "n_slices": np.int64(len(rle_stack)),
        "g_slice": np.asarray(g_slice, np.int64),
        "g_class": np.asarray(g_class, np.int64),
        "g_inst_end": np.asarray(g_inst_end, np.int64),
        "inst_label": cat(labels_cat),
        "inst_box": cat(boxes_cat, width=4),
        "inst_run_count": cat(run_counts),
        "rle_starts": cat(starts_parts),
        "rle_runs": cat(runs_parts),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)


def load_forward_state(path: str):
    """Inverse of save_forward_state: returns ``(rle_stack, meta)``.

    Reconstructed dicts carry their FlatInstances form, exactly like
    ``runs_to_regions`` output, so the matcher fast path stays warm."""
    with np.load(path, allow_pickle=False) as z:
        if str(z["format"]) != _FORMAT:
            raise ValueError(f"{path}: not a {_FORMAT} checkpoint")
        meta = json.loads(str(z["meta"]))
        n_slices = int(z["n_slices"])
        g_slice = z["g_slice"]
        g_class = z["g_class"]
        g_inst_end = z["g_inst_end"]
        inst_label = z["inst_label"]
        inst_box = z["inst_box"]
        run_offsets = np.concatenate(
            [[0], np.cumsum(z["inst_run_count"], dtype=np.int64)]
        )
        rle_starts = z["rle_starts"]
        rle_runs = z["rle_runs"]

    rle_stack = [{} for _ in range(n_slices)]
    g_inst_start = np.concatenate([[0], g_inst_end[:-1]])
    for gi in range(len(g_slice)):
        i0, i1 = int(g_inst_start[gi]), int(g_inst_end[gi])
        if i0 == i1:
            flat = FlatInstances.empty()
        else:
            r0 = int(run_offsets[i0])
            r1 = int(run_offsets[i1])
            flat = FlatInstances(
                inst_label[i0:i1],
                inst_box[i0:i1],
                run_offsets[i0 : i1 + 1] - r0,
                rle_starts[r0:r1],
                rle_runs[r0:r1],
            )
        rle_stack[int(g_slice[gi])][int(g_class[gi])] = flat.to_dict()
    return rle_stack, meta


class ForwardCheckpoint:
    """Segmented forward-state persistence for one axis.

    Each periodic save appends ONE segment file
    (``forward_<axis>.<k>.npz``) covering only the newly completed slices,
    so checkpoint cost is O(new slices) instead of re-serializing the
    cumulative stack — on multi-thousand-slice volumes the latter grows
    quadratically and stalls the device dispatch loop.  Segments are
    written atomically (tmp + os.replace); load validates each segment's
    run fingerprint and slice contiguity."""

    def __init__(self, checkpoint_dir: str, axis_name: str, meta: dict):
        self.dir = checkpoint_dir
        self.axis = axis_name
        self.meta = meta
        self._next_segment = 0
        self._z_end = 0

    def _segment_path(self, k: int) -> str:
        return os.path.join(self.dir, f"forward_{self.axis}.{k:05d}.npz")

    def _existing_segments(self) -> list:
        out = []
        k = 0
        while os.path.exists(self._segment_path(k)):
            out.append(self._segment_path(k))
            k += 1
        return out

    def exists(self) -> bool:
        return os.path.exists(self._segment_path(0))

    def load(self) -> list:
        """Load and validate all segments; returns the contiguous rle_stack
        (slices 0..z_done).  Raises on config mismatch or a gap."""
        stack = []
        for k, path in enumerate(self._existing_segments()):
            seg, meta = load_forward_state(path)
            z_start = meta.pop("_z_start")
            check_meta(meta, self.meta, path)
            if z_start != len(stack):
                raise ValueError(
                    f"{path}: segment starts at slice {z_start}, expected "
                    f"{len(stack)} — checkpoint dir holds mixed runs; "
                    "delete it and rerun"
                )
            stack.extend(seg)
            self._next_segment = k + 1
        self._z_end = len(stack)
        return stack

    def append(self, new_slices: list) -> None:
        """Persist the next ``len(new_slices)`` completed slices."""
        if not new_slices:
            return
        meta = dict(self.meta)
        meta["_z_start"] = self._z_end
        save_forward_state(
            self._segment_path(self._next_segment), new_slices, meta
        )
        self._next_segment += 1
        self._z_end += len(new_slices)

    def remove(self) -> None:
        for path in self._existing_segments():
            os.remove(path)


def save_axis_trackers(checkpoint_dir: str, axis_name: str, trackers,
                       meta: dict) -> None:
    """Persist a completed axis's finished trackers plus the run
    fingerprint that authorizes reusing them on resume.  The meta sidecar
    is written LAST (all writes atomic), so a crash mid-save can never
    leave a dir that passes the resume guard with partial data."""
    labels = [t.class_id for t in trackers]
    for tracker, path in zip(
        trackers, axis_tracker_paths(checkpoint_dir, axis_name, labels)
    ):
        tracker.write_to_json(path)
    meta_path = axis_tracker_meta_path(checkpoint_dir, axis_name)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)


def load_axis_trackers(checkpoint_dir: str, axis_name: str, meta: dict,
                       make_trackers):
    """Load a completed axis's trackers, or None when absent.  Raises when
    present but written by a different run configuration/volume."""
    meta_path = axis_tracker_meta_path(checkpoint_dir, axis_name)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        saved_meta = json.load(f)
    check_meta(saved_meta, meta, meta_path)
    trackers = make_trackers()
    paths = axis_tracker_paths(
        checkpoint_dir, axis_name, [t.class_id for t in trackers]
    )
    if not all(os.path.exists(p) for p in paths):
        raise ValueError(
            f"{checkpoint_dir}: trackers meta exists for axis {axis_name} "
            "but tracker files are missing — delete the checkpoint dir"
        )
    for tracker, path in zip(trackers, paths):
        tracker.load_from_json(path)
    return trackers


def check_meta(meta: dict, expected: dict, path: str) -> None:
    """Refuse to resume when the run configuration changed."""
    mismatched = {
        k: (meta.get(k), v) for k, v in expected.items() if meta.get(k) != v
    }
    if mismatched:
        raise ValueError(
            f"{path}: checkpoint was written by a different run "
            f"configuration; mismatched fields: {mismatched}. "
            "Delete the checkpoint or rerun with the original settings."
        )


def prime_matchers(matchers, rle_stack: list) -> None:
    """Reconstruct matcher state as if ``rle_stack`` had just been matched:
    the last slice becomes each matcher's target and ``next_label``
    resumes at the global per-class watermark (max assigned label across
    ALL slices — an instance that appeared then vanished must not get its
    id reused)."""
    if not rle_stack:
        return
    last = rle_stack[-1]
    for matcher in matchers:
        cid = matcher.class_id
        watermark = matcher.class_id * matcher.label_divisor + 1
        for rle_seg in rle_stack:
            insts = rle_seg.get(cid)
            if insts:
                watermark = max(watermark, max(insts.keys()) + 1)
        matcher.update_target(last.get(cid, {}))
        matcher.next_label = watermark
