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
    "save_forward_state",
    "load_forward_state",
    "forward_checkpoint_path",
    "axis_tracker_paths",
]

_FORMAT = "empanada_tpu-forward-v1"


def forward_checkpoint_path(checkpoint_dir: str, axis_name: str) -> str:
    return os.path.join(checkpoint_dir, f"forward_{axis_name}.npz")


def axis_tracker_paths(checkpoint_dir: str, axis_name: str, labels) -> list:
    return [
        os.path.join(checkpoint_dir, f"trackers_{axis_name}_{int(label)}.json")
        for label in labels
    ]


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
            flat = FlatInstances.from_dict(insts)
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
