"""Dense panoptic map <-> per-class RLE instance records.

Reference ``empanada/inference/rle.py``: the nested dict format
``{class_id: {instance_id: {box, starts, runs}}}`` is the wire format between
device postprocessing and all host stitching (matching, tracking, consensus,
filling).

The conversion here is run-based and single-pass (see core.labeling): one
scan extracts all runs, connected components are computed over runs, and
boxes/RLEs are grouped per label — the reference's per-class dense copy +
cc3d relabel + regionprops + per-region rle_encode is collapsed into run
arithmetic.
"""

from __future__ import annotations

import numpy as np

from empanada_tpu.core import string_to_rle
from empanada_tpu.core.labeling import (
    FlatInstances,
    connected_components_runs,
    decode_runs_packed,
    extract_runs,
    runs_to_flat,
)

__all__ = [
    "pan_seg_to_rle_seg",
    "runs_to_rle_seg",
    "runs_to_flat_seg",
    "packed_to_rle_seg",
    "packed_to_flat_seg",
    "rle_seg_to_pan_seg",
    "unpack_rle_attrs",
]


def pan_seg_to_rle_seg(
    pan_seg: np.ndarray,
    labels,
    label_divisor: int,
    thing_list,
    force_connected: bool = True,
) -> dict:
    """Convert a dense (h, w) panoptic map to per-class RLE instance dicts.

    When ``force_connected`` and the class is a thing class, instances are
    relabeled as connected components (8-connectivity, components numbered
    from ``class_id * label_divisor + 1`` in scanline order).
    """
    values, rows, cs, ce = extract_runs(pan_seg)
    return runs_to_rle_seg(
        values, rows, cs, ce, pan_seg.shape[1],
        labels, label_divisor, thing_list, force_connected,
    )


def runs_to_rle_seg(
    values: np.ndarray,
    rows: np.ndarray,
    cs: np.ndarray,
    ce: np.ndarray,
    width: int,
    labels,
    label_divisor: int,
    thing_list,
    force_connected: bool = True,
) -> dict:
    """pan_seg_to_rle_seg on pre-extracted runs (the device-compaction path:
    ``ops.postprocess.encode_runs_packed`` + ``core.decode_runs_packed``
    produce these directly, so the dense map never crosses the link)."""
    return {
        label: flat.to_dict()
        for label, flat in runs_to_flat_seg(
            values, rows, cs, ce, width, labels, label_divisor, thing_list,
            force_connected,
        ).items()
    }


def runs_to_flat_seg(
    values, rows, cs, ce, width: int,
    labels, label_divisor: int, thing_list,
    force_connected: bool = True,
) -> dict:
    """runs_to_rle_seg stopping at the flat form: ``{class_id:
    FlatInstances}`` — the 3D pipeline's internal wire, which skips nested
    dict materialization entirely on the matcher hot loop."""
    w = width
    try:
        from empanada_tpu.core import native

        fast = native.available()
    except ImportError:
        fast = False

    flat_seg = {}
    for label in labels:
        min_id = label * label_divisor
        max_id = min_id + label_divisor
        fc = force_connected and label in thing_list

        if fast:
            # fused filter + CC + group + canonicalize in one GIL-released
            # native call (csrc runs_build_flat) — bit-identical to the
            # numpy chain below (tests/test_native_fuzz.py)
            flat = FlatInstances(*native.runs_build_flat(
                values, rows, cs, ce, w, min_id, max_id, fc))
        else:
            sel = (values >= min_id) & (values < max_id)
            v = values[sel]
            r = rows[sel]
            s = cs[sel]
            e = ce[sel]
            if fc and len(v) > 0:
                comp = connected_components_runs(v, r, s, e, connectivity=8)
                v = comp + min_id
            flat = runs_to_flat(v, r, s, e, w)
        if fc and len(flat) >= label_divisor:
            _raise_cc_overflow(label, len(flat), label_divisor)
        flat_seg[label] = flat

    return flat_seg


def _raise_cc_overflow(label, n, label_divisor):
    # the reference silently spills ids into the next class's window here
    # (its cc relabel has no bound check); fail loudly instead — silent
    # class reassignment is worse
    raise ValueError(
        f"class {label}: {n} connected components exceed "
        f"label_divisor={label_divisor}; raise the label divisor"
    )


def packed_to_rle_seg(
    row_buf: np.ndarray,
    width: int,
    labels,
    label_divisor: int,
    thing_list,
    force_connected: bool = True,
):
    """runs_to_rle_seg straight off a device-packed per-slice buffer
    (ops.postprocess.encode_runs_packed layout) — the decode never
    materializes Python-side run arrays when the native lib is present.

    Returns the rle_seg dict, or None when any row overflowed its packed
    run capacity (caller falls back to the dense map path)."""
    flat_seg = packed_to_flat_seg(row_buf, width, labels, label_divisor,
                                  thing_list, force_connected)
    if flat_seg is None:
        return None
    return {label: flat.to_dict() for label, flat in flat_seg.items()}


def packed_to_flat_seg(
    row_buf: np.ndarray,
    width: int,
    labels,
    label_divisor: int,
    thing_list,
    force_connected: bool = True,
):
    """packed_to_rle_seg stopping at the flat form (``{class_id:
    FlatInstances}``), or None on packed-capacity overflow."""
    try:
        from empanada_tpu.core import native

        fast = native.available()
    except ImportError:
        fast = False

    if fast:
        flat_seg = {}
        for label in labels:
            min_id = label * label_divisor
            fc = force_connected and label in thing_list
            out = native.packed_build_flat(
                row_buf, width, min_id, min_id + label_divisor, fc)
            if out == "overflow":
                return None
            flat = FlatInstances(*out)
            if fc and len(flat) >= label_divisor:
                _raise_cc_overflow(label, len(flat), label_divisor)
            flat_seg[label] = flat
        return flat_seg

    decoded = decode_runs_packed(row_buf, width)
    if decoded is None:
        return None
    v, r, s, e = decoded
    return runs_to_flat_seg(v, r, s, e, width, labels, label_divisor,
                            thing_list, force_connected)


def rle_seg_to_pan_seg(rle_seg: dict, shape) -> np.ndarray:
    """Paint the nested RLE dict back into a dense uint32 map."""
    pan_seg = np.zeros(int(np.prod(shape)), dtype=np.uint32)

    try:
        from empanada_tpu.core import native

        fast = native.available()
    except ImportError:
        fast = False

    for instance_attrs in rle_seg.values():
        for object_id, attrs in instance_attrs.items():
            starts = np.asarray(attrs["starts"], dtype=np.int64)
            runs = np.asarray(attrs["runs"], dtype=np.int64)
            if len(starts) == 0:
                continue
            if fast:
                native.fill_ranges(
                    pan_seg, np.stack([starts, starts + runs], axis=1), object_id
                )
            else:
                for s, r in zip(starts, runs):
                    pan_seg[s : s + r] = object_id

    return pan_seg.reshape(shape)


def unpack_rle_attrs(instance_rle_seg: dict):
    """Unpack one class's instance dict into parallel arrays/lists
    (reference rle.py:120)."""
    labels = []
    boxes = []
    starts = []
    runs = []
    for label, attrs in instance_rle_seg.items():
        labels.append(int(label))
        boxes.append(attrs["box"])
        if "rle" in attrs:
            s, r = string_to_rle(attrs["rle"])
            starts.append(s)
            runs.append(r)
        else:
            starts.append(np.asarray(attrs["starts"]))
            runs.append(np.asarray(attrs["runs"]))
    return np.array(labels), np.array(boxes), starts, runs
