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
    connected_components_runs,
    extract_runs,
    runs_to_regions,
)

__all__ = [
    "pan_seg_to_rle_seg",
    "runs_to_rle_seg",
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
    w = width
    rle_seg = {}
    for label in labels:
        min_id = label * label_divisor
        max_id = min_id + label_divisor
        sel = (values >= min_id) & (values < max_id)
        v = values[sel]
        r = rows[sel]
        s = cs[sel]
        e = ce[sel]

        if force_connected and label in thing_list and len(v) > 0:
            comp = connected_components_runs(v, r, s, e, connectivity=8)
            if int(comp.max(initial=0)) >= label_divisor:
                # the reference silently spills ids into the next class's
                # window here (its cc relabel has no bound check); fail
                # loudly instead — silent class reassignment is worse
                raise ValueError(
                    f"class {label}: {int(comp.max())} connected components "
                    f"exceed label_divisor={label_divisor}; raise the "
                    "label divisor"
                )
            v = comp + min_id

        rle_seg[label] = runs_to_regions(v, r, s, e, width=w)

    return rle_seg


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
