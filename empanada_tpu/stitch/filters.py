"""In-place tracker filters (reference ``empanada/inference/filters.py``):
small-object and pancake removal operate directly on RLEs; morphological
cleanup (erode/dilate/fill-holes) round-trips through a dense volume.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from empanada_tpu.core.labeling import extract_runs, runs_to_regions
from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg, rle_seg_to_pan_seg

__all__ = [
    "remove_small_objects",
    "remove_pancakes",
    "erode",
    "dilate",
    "fill_holes_in_segmentation",
]


def remove_small_objects(object_tracker, min_size: int = 64):
    """Delete instances with fewer than ``min_size`` voxels (filters.py:22)."""
    for instance_id in list(object_tracker.instances.keys()):
        size = int(np.asarray(object_tracker.instances[instance_id]["runs"]).sum())
        if size < min_size:
            del object_tracker.instances[instance_id]


def remove_pancakes(object_tracker, min_span: int = 4):
    """Delete instances whose 3D box extent is < min_span on any axis
    (filters.py:38)."""
    for instance_id in list(object_tracker.instances.keys()):
        box = object_tracker.instances[instance_id]["box"]
        spans = (box[3] - box[0], box[4] - box[1], box[5] - box[2])
        if any(span < min_span for span in spans):
            del object_tracker.instances[instance_id]


def _tracker_to_dense(object_tracker, volume_shape):
    return rle_seg_to_pan_seg({0: object_tracker.instances}, volume_shape)


def regions_3d(mask: np.ndarray) -> dict:
    """Exact per-label {box3d, flat starts, runs} records of a (d, h, w)
    volume, computed from row-runs of the (d*h, w) view (runs never wrap
    rows there, so 3D boxes fall out of run extents)."""
    d, h, w = mask.shape
    v, r, cs, ce = extract_runs(mask.reshape(d * h, w))
    if len(v) == 0:
        return {}
    z = r // h
    y = r % h

    order = np.argsort(v, kind="stable")
    v, r, cs, ce, z, y = v[order], r[order], cs[order], ce[order], z[order], y[order]
    group_idx = np.flatnonzero(np.concatenate([[True], v[1:] != v[:-1]]))
    labels = v[group_idx]
    bounds = np.concatenate([group_idx, [len(v)]])

    z1 = np.minimum.reduceat(z, group_idx)
    z2 = np.maximum.reduceat(z, group_idx) + 1
    y1 = np.minimum.reduceat(y, group_idx)
    y2 = np.maximum.reduceat(y, group_idx) + 1
    x1 = np.minimum.reduceat(cs, group_idx)
    x2 = np.maximum.reduceat(ce, group_idx)

    starts_flat = r * w + cs
    lens = ce - cs

    out = {}
    for k, label in enumerate(labels):
        sl = slice(bounds[k], bounds[k + 1])
        s, l = starts_flat[sl], lens[sl]
        if len(s) > 1:  # canonical merge of flat-adjacent runs
            touch = s[1:] == s[:-1] + l[:-1]
            if touch.any():
                keep = np.flatnonzero(np.concatenate([[True], ~touch]))
                ends = s + l
                merged_ends = np.maximum.reduceat(ends, keep)
                s = s[keep]
                l = merged_ends - s
        out[int(label)] = {
            "box": (int(z1[k]), int(y1[k]), int(x1[k]), int(z2[k]), int(y2[k]), int(x2[k])),
            "starts": s,
            "runs": l,
        }
    return out


def _force_connected_relabel(mask, labels, label_divisor, thing_list):
    """Per-class connected-component relabel of a dense label map — the
    reference re-runs its cc relabel after every morphology round trip
    (filters.py:158-176 via its pan_seg_to_rle_seg copy), so instances
    split by erosion become separate ids.  Components are relabeled
    per original instance within its bbox (multilabel cc: different ids
    never merge), numbered sequentially from class_id * divisor + 1."""
    max_id = int(mask.max(initial=0))
    if max_id == 0:
        return mask
    out = mask.copy()
    structure = np.ones((3,) * mask.ndim, dtype=bool)  # cc3d-default 8/26-conn
    objs = ndimage.find_objects(mask, max_label=max_id)
    for label in labels:
        if label not in thing_list:
            continue
        lo = label * label_divisor
        hi = min((label + 1) * label_divisor, max_id + 1)
        class_end = (label + 1) * label_divisor
        next_id = lo + 1
        for val in range(lo, hi):
            sl = objs[val - 1] if val >= 1 else None
            if sl is None:
                continue
            binary = mask[sl] == val
            cc, n = ndimage.label(binary, structure=structure)
            view = out[sl]
            for comp in range(1, n + 1):
                if next_id >= class_end:
                    # same loud failure as runs_to_rle_seg (rle_seg.py):
                    # spilling ids into the next class's window silently
                    # reassigns fragments to the wrong class
                    raise ValueError(
                        f"class {label}: connected components exceed "
                        f"label_divisor={label_divisor}; raise the label "
                        "divisor"
                    )
                view[cc == comp] = next_id
                next_id += 1
    return out


def _dense_to_tracker_instances(mask, labels, label_divisor, thing_list):
    """Re-encode a dense label volume into instance records, re-enforcing
    per-class connected components first (reference filter semantics)."""
    mask = _force_connected_relabel(mask, labels, label_divisor, thing_list)
    if mask.ndim == 2:
        v, r, cs, ce = extract_runs(mask)
        return runs_to_regions(v, r, cs, ce, width=mask.shape[-1])
    return regions_3d(mask)


def _struct(ndim):
    # 3x3 cross / 6-connected ball: skimage's default erosion/dilation footprint
    return ndimage.generate_binary_structure(ndim, 1)


def erode(object_tracker, volume_shape, labels, label_divisor, thing_list, iterations=1):
    mask = _tracker_to_dense(object_tracker, volume_shape)
    for _ in range(iterations):
        mask = ndimage.grey_erosion(mask, footprint=_struct(mask.ndim))
    object_tracker.instances = _dense_to_tracker_instances(
        mask, labels, label_divisor, thing_list
    )
    return object_tracker


def dilate(object_tracker, volume_shape, labels, label_divisor, thing_list, iterations=1):
    mask = _tracker_to_dense(object_tracker, volume_shape)
    for _ in range(iterations):
        mask = ndimage.grey_dilation(mask, footprint=_struct(mask.ndim))
    object_tracker.instances = _dense_to_tracker_instances(
        mask, labels, label_divisor, thing_list
    )
    return object_tracker


def fill_holes_in_segmentation(object_tracker, volume_shape, labels, label_divisor, thing_list):
    """Per-slice, per-instance binary hole filling within the instance bbox
    (filters.py:175)."""
    mask_3d = _tracker_to_dense(object_tracker, volume_shape)
    if mask_3d.ndim == 3:
        slices = mask_3d
    else:
        slices = mask_3d[None]

    for idx in range(len(slices)):
        sl = slices[idx]
        v, r, cs, ce = extract_runs(sl)
        regions = runs_to_regions(v, r, cs, ce, width=sl.shape[-1])
        for label, attrs in regions.items():
            if label <= 0:
                continue
            y1, x1, y2, x2 = attrs["box"]
            crop = sl[y1:y2, x1:x2]
            filled = ndimage.binary_fill_holes(crop == label)
            # claim only BACKGROUND pixels: an instance living inside this
            # instance's hole must survive.  (The reference instead
            # union-fills the bbox and overwrites it wholesale with
            # rp.label, clobbering neighbors inside the bbox —
            # filters.py:201-203; divergence documented in PARITY.md.)
            crop[filled & (crop == 0)] = label

    object_tracker.instances = _dense_to_tracker_instances(
        mask_3d, labels, label_divisor, thing_list
    )
    return object_tracker
