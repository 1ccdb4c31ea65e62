"""Instance matching across slices (reference
``empanada/inference/matcher.py``).

``rle_matcher`` computes pairwise IoU between two RLE instance sets (box
screening first, then RLE intersection without densifying) and solves the
assignment with scipy's Hungarian algorithm.  ``RLEMatcher`` is the stateful
cross-slice tracker: matched instances inherit the target's label, unmatched
ones with IoA >= merge_ioa_thr are absorbed (false-split repair), others get
a fresh label (forward pass) or keep their own (backward pass).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

from empanada_tpu.core import (
    overlapping_box_pairs,
    crop_and_binarize,
    mask_ioa,
    mask_iou,
    merge_boxes,
    merge_rles,
    rle_ioa,
    rle_iou,
)
from empanada_tpu.core.labeling import (
    FlatInstances,
    RleDict,
    extract_runs,
    flat_matches_dict,
    runs_to_regions,
)

__all__ = ["fast_matcher", "rle_matcher", "rle_matcher_flat", "RLEMatcher", "merge_attrs"]


def merge_attrs(rle_attr1: dict, rle_attr2: dict) -> dict:
    """Merge two instances' boxes and run length encodings (matcher.py:14)."""
    out = {"box": merge_boxes(rle_attr1["box"], rle_attr2["box"])}
    starts, runs = merge_rles(
        rle_attr1["starts"], rle_attr1["runs"], rle_attr2["starts"], rle_attr2["runs"]
    )
    out["starts"] = starts
    out["runs"] = runs
    return out


def _merge_groups(groups: dict) -> dict:
    """Resolve {label: [attrs...]} into {label: merged attrs}.

    All multi-member groups go through ONE native batched union
    (core.native.batch_range_union) — the per-group numpy path costs
    ~100 us/group, which dominated host stitching at EM densities.
    """
    out = {}
    multi = []
    for lbl, attrs in groups.items():
        if len(attrs) == 1:
            out[lbl] = attrs[0]
        else:
            multi.append((lbl, attrs))
    if not multi:
        return out

    from empanada_tpu.core import native

    if not native.available():
        for lbl, attrs in multi:
            out[lbl] = merge_attrs_many(attrs)
        return {lbl: out[lbl] for lbl in groups}

    members = [a for _, attrs in multi for a in attrs]
    lens = np.fromiter((len(a["starts"]) for a in members), dtype=np.int64,
                       count=len(members))
    s_flat = (
        np.concatenate([np.asarray(a["starts"], np.int64) for a in members])
        if members else np.empty(0, np.int64)
    )
    r_flat = (
        np.concatenate([np.asarray(a["runs"], np.int64) for a in members])
        if members else np.empty(0, np.int64)
    )
    ranges = np.stack([s_flat, s_flat + r_flat], axis=1)
    sizes = np.fromiter((len(attrs) for _, attrs in multi), dtype=np.int64,
                        count=len(multi))
    # member lengths grouped per label -> flat offsets per GROUP
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    member_csum = np.concatenate([[0], np.cumsum(lens)])
    group_offsets = member_csum[bounds]

    merged, out_offsets = native.batch_range_union(ranges, group_offsets)

    boxes = np.asarray([a["box"] for a in members])
    for gi, (lbl, _) in enumerate(multi):
        seg = merged[out_offsets[gi] : out_offsets[gi + 1]]
        out[lbl] = {
            "box": _bounding_box(boxes[bounds[gi] : bounds[gi + 1]]),
            "starts": seg[:, 0].copy(),
            "runs": (seg[:, 1] - seg[:, 0]).copy(),
        }
    # preserve the input's first-occurrence insertion order — downstream
    # consumers paint overlapping instances in dict iteration order
    rd = RleDict((lbl, out[lbl]) for lbl in groups)
    # attach the flat form eagerly: every matcher output is read again as
    # flat (as the next target, and once more in the backward pass)
    rd._flat = FlatInstances.from_dict(rd)
    return rd


def _bounding_box(boxes: np.ndarray) -> tuple:
    """Smallest box enclosing all rows of an (n, 2*nd) box array."""
    nd = boxes.shape[1] // 2
    return tuple(
        int(v) for v in np.concatenate([boxes[:, :nd].min(0), boxes[:, nd:].max(0)])
    )


def merge_attrs_many(attrs_list) -> dict:
    """Merge k instances in one pass: vectorized box bound + one
    concat-sort range union for the whole group (equivalent to folding
    merge_attrs pairwise, k-1 fewer calls)."""
    from empanada_tpu.core.ranges import join_ranges, ranges_to_rle

    box = _bounding_box(np.asarray([a["box"] for a in attrs_list]))
    ranges = [
        np.stack(
            [np.asarray(a["starts"]), np.asarray(a["starts"]) + np.asarray(a["runs"])],
            axis=1,
        )
        for a in attrs_list
    ]
    rle = ranges_to_rle(join_ranges(ranges))
    return {"box": box, "starts": rle[:, 0], "runs": rle[:, 1]}


def _empty_result(labels1, labels2, return_iou, return_ioa):
    empty = np.array([])
    out = ((empty, empty), (labels1, labels2), empty)
    if return_iou:
        out = out + (empty,)
    if return_ioa:
        out = out + (empty,)
    return out


def _regions_of_dense(instance_seg: np.ndarray):
    v, r, cs, ce = extract_runs(instance_seg)
    return runs_to_regions(v, r, cs, ce, width=instance_seg.shape[-1])


def fast_matcher(
    target_instance_seg: np.ndarray,
    match_instance_seg: np.ndarray,
    iou_thr: float = 0.5,
    return_iou: bool = False,
    return_ioa: bool = False,
):
    """Hungarian matching on dense instance maps (matcher.py:30)."""
    regions1 = _regions_of_dense(target_instance_seg)
    regions2 = _regions_of_dense(match_instance_seg)
    labels1 = np.array(sorted(regions1))
    labels2 = np.array(sorted(regions2))

    if len(labels1) == 0 or len(labels2) == 0:
        return _empty_result(labels1, labels2, return_iou, return_ioa)

    boxes1 = np.array([regions1[l]["box"] for l in labels1])
    boxes2 = np.array([regions2[l]["box"] for l in labels2])

    iou_matrix = np.zeros((len(labels1), len(labels2)), dtype=np.float32)
    ioa_matrix = np.zeros_like(iou_matrix) if return_ioa else None

    box_matches = overlapping_box_pairs(boxes1, boxes2)
    for r1, r2 in box_matches:
        l1, l2 = labels1[r1], labels2[r2]
        box = merge_boxes(boxes1[r1], boxes2[r2])
        m1 = crop_and_binarize(target_instance_seg, box, l1)
        m2 = crop_and_binarize(match_instance_seg, box, l2)
        iou_matrix[r1, r2] = mask_iou(m1, m2)
        if return_ioa:
            ioa_matrix[r1, r2] = mask_ioa(m1, m2)

    return _assign(
        iou_matrix, ioa_matrix, labels1, labels2, iou_thr, return_iou, return_ioa
    )


def rle_matcher(
    target_instance_rles: dict,
    match_instance_rles: dict,
    iou_thr: float = 0.5,
    return_iou: bool = False,
    return_ioa: bool = False,
):
    """Hungarian matching directly on RLEs (matcher.py:136)."""
    tf = FlatInstances.from_dict(target_instance_rles)
    mf = FlatInstances.from_dict(match_instance_rles)
    return rle_matcher_flat(tf, mf, iou_thr, return_iou, return_ioa)


def rle_matcher_flat(
    tf: FlatInstances,
    mf: FlatInstances,
    iou_thr: float = 0.5,
    return_iou: bool = False,
    return_ioa: bool = False,
):
    """rle_matcher on FlatInstances (no per-instance array churn)."""
    if len(tf) == 0 or len(mf) == 0:
        return _empty_result(tf.labels, mf.labels, return_iou, return_ioa)

    iou_matrix = np.zeros((len(tf), len(mf)), dtype=float)
    ioa_matrix = np.zeros_like(iou_matrix) if return_ioa else None

    box_matches = overlapping_box_pairs(tf.boxes, mf.boxes)
    if len(box_matches):
        inters = _batch_intersections_flat(tf, mf, box_matches)
        r1 = box_matches[:, 0]
        r2 = box_matches[:, 1]
        union = tf.areas[r1] + mf.areas[r2] - inters
        iou_matrix[r1, r2] = np.where(union > 0, inters / np.maximum(union, 1), 0.0)
        if return_ioa:
            a2 = mf.areas[r2]
            ioa_matrix[r1, r2] = np.where(a2 > 0, inters / np.maximum(a2, 1), 0.0)

    return _assign(
        iou_matrix, ioa_matrix, tf.labels, mf.labels, iou_thr, return_iou, return_ioa
    )


def _batch_intersections_flat(tf: FlatInstances, mf: FlatInstances, box_matches):
    """Pairwise RLE intersections for box-screened pairs from flat forms
    (two big concats instead of ~2k small per-instance ones)."""
    try:
        from empanada_tpu.core import native

        fast = native.available()
    except ImportError:
        fast = False

    if fast:
        s_flat = np.concatenate([tf.starts, mf.starts])
        e_flat = np.concatenate([tf.starts + tf.runs, mf.starts + mf.runs])
        flat = np.stack([s_flat, e_flat], axis=1)
        offsets = np.concatenate([tf.offsets, tf.offsets[-1] + mf.offsets[1:]])
        pairs = box_matches.copy()
        pairs[:, 1] += len(tf)
        return native.batch_pair_intersection(flat, offsets, pairs)

    to, mo = tf.offsets, mf.offsets
    return np.array(
        [
            rle_iou(
                tf.starts[to[r1] : to[r1 + 1]], tf.runs[to[r1] : to[r1 + 1]],
                mf.starts[mo[r2] : mo[r2 + 1]], mf.runs[mo[r2] : mo[r2 + 1]],
                return_intersection=True,
            )[1]
            for r1, r2 in box_matches
        ],
        dtype=np.int64,
    )


def _instance_areas(runs_list) -> np.ndarray:
    """Per-instance voxel counts without a Python loop of .sum()s."""
    if not len(runs_list):
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(r) for r in runs_list), dtype=np.int64,
                       count=len(runs_list))
    if lens.sum() == 0:
        return np.zeros(len(runs_list), dtype=np.int64)
    flat = np.concatenate([np.asarray(r, dtype=np.int64) for r in runs_list])
    out = np.zeros(len(runs_list), dtype=np.int64)
    nz = lens > 0
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    sums = np.add.reduceat(flat, starts[nz])
    out[nz] = sums
    return out


def _batch_intersections(target_starts, target_runs, match_starts, match_runs,
                         box_matches, max_threads: int = 0):
    """Pairwise RLE intersections for all box-screened pairs, in one native
    call (a per-pair Python loop costs seconds at thousands of instances).
    ``max_threads=1`` disables native threading (callers already in a pool)."""
    try:
        from empanada_tpu.core import native

        fast = native.available()
    except ImportError:
        fast = False

    if fast:
        starts_all = target_starts + match_starts
        runs_all = target_runs + match_runs
        lens = np.fromiter((len(s) for s in starts_all), dtype=np.int64,
                           count=len(starts_all))
        offsets = np.concatenate([[0], np.cumsum(lens)])
        s_flat = (
            np.concatenate([np.asarray(s, np.int64) for s in starts_all])
            if len(starts_all) else np.empty(0, np.int64)
        )
        r_flat = (
            np.concatenate([np.asarray(r, np.int64) for r in runs_all])
            if len(runs_all) else np.empty(0, np.int64)
        )
        flat = np.stack([s_flat, s_flat + r_flat], axis=1)
        pairs = box_matches.copy()
        pairs[:, 1] += len(target_starts)
        return native.batch_pair_intersection(flat, offsets, pairs, max_threads)

    return np.array(
        [
            rle_iou(
                target_starts[r1], target_runs[r1], match_starts[r2], match_runs[r2],
                return_intersection=True,
            )[1]
            for r1, r2 in box_matches
        ],
        dtype=np.int64,
    )


def _sparse_assignment(iou_matrix):
    """Maximize total IoU, exploiting near-block-diagonal structure.

    Box screening leaves each instance overlapping only a handful of
    candidates, so the bipartite graph of nonzero entries splits into many
    tiny connected components.  Solving the assignment per component is
    exactly equivalent to the dense solve (cross-component entries are all
    zero, so they never contribute to the maximum) but costs O(sum k_i^3)
    instead of O(n^3) — milliseconds instead of seconds at thousands of
    instances per slice.
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components

    n1, n2 = iou_matrix.shape
    rows, cols = np.nonzero(iou_matrix)
    adj = csr_matrix(
        (np.ones(2 * len(rows), dtype=np.int8),
         (np.concatenate([rows, cols + n1]), np.concatenate([cols + n1, rows]))),
        shape=(n1 + n2, n1 + n2),
    )
    n_comp, comp = connected_components(adj, directed=False)

    out_rows, out_cols = [], []
    for c in range(n_comp):
        members = np.flatnonzero(comp == c)
        r = members[members < n1]
        k = members[members >= n1] - n1
        if len(r) == 0 or len(k) == 0:
            continue
        sub_r, sub_c = linear_sum_assignment(iou_matrix[np.ix_(r, k)], maximize=True)
        out_rows.append(r[sub_r])
        out_cols.append(k[sub_c])
    if not out_rows:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_rows), np.concatenate(out_cols)


def _assign(iou_matrix, ioa_matrix, labels1, labels2, iou_thr, return_iou, return_ioa):
    if min(iou_matrix.shape) > 256 and iou_thr:
        match_rows, match_cols = _sparse_assignment(iou_matrix)
    else:
        match_rows, match_cols = linear_sum_assignment(iou_matrix, maximize=True)
    if iou_thr is not None:
        keep = iou_matrix[match_rows, match_cols] >= iou_thr
        match_rows = match_rows[keep]
        match_cols = match_cols[keep]

    matched_labels = (labels1[match_rows], labels2[match_cols])
    all_labels = [labels1, labels2]
    matched_ious = iou_matrix[(match_rows, match_cols)]

    output = (matched_labels, all_labels, matched_ious)
    if return_iou:
        output = output + (iou_matrix,)
    if return_ioa:
        output = output + (ioa_matrix,)
    return output


class RLEMatcher:
    """Stateful cross-slice instance matcher (matcher.py:234)."""

    def __init__(
        self,
        class_id: int,
        label_divisor: int,
        merge_iou_thr: float = 0.25,
        merge_ioa_thr: float = 0.25,
        assign_new: bool = True,
        **kwargs,
    ):
        self.class_id = class_id
        self.label_divisor = label_divisor
        self.merge_iou_thr = merge_iou_thr
        self.merge_ioa_thr = merge_ioa_thr
        self.assign_new = assign_new
        self.next_label = (class_id * label_divisor) + 1
        self.target_rle = None
        self._target_flat = None

    def initialize_target(self, target_instance_rles: dict):
        self.target_rle = target_instance_rles
        self._target_flat = None
        objs = list(target_instance_rles.keys())
        if objs:
            self.next_label = max(objs) + 1

    def update_target(self, instance_rles: dict):
        self.target_rle = instance_rles
        self._target_flat = None

    def __call__(self, match_instance_rle: dict, update_target: bool = True) -> dict:
        assert self.target_rle is not None, "Initialize target rle before running!"

        tf = self._target_flat
        if tf is None or not flat_matches_dict(tf, self.target_rle):
            tf = FlatInstances.from_dict(self.target_rle)
        mf = FlatInstances.from_dict(match_instance_rle)

        matched_labels, all_labels, _, ioa_matrix = rle_matcher_flat(
            tf, mf, self.merge_iou_thr, return_ioa=True
        )
        target_labels, match_labels = all_labels
        label_matches = {ml: tl for tl, ml in zip(matched_labels[0], matched_labels[1])}

        # per-column IoA decisions vectorized once (a per-instance
        # column .max()/.argmax() loop costs ~50 ms/pass at EM densities)
        if ioa_matrix is not None and ioa_matrix.size:
            col_max = ioa_matrix.max(axis=0).tolist()
            col_arg = ioa_matrix.argmax(axis=0).tolist()
        else:
            col_max = [0.0] * len(match_instance_rle)
            col_arg = [0] * len(match_instance_rle)

        # group instances by destination label first, then merge each
        # collision group in ONE pass (incremental pairwise merge_attrs
        # cost ~70 us/call of numpy+ctypes overhead and dominated the
        # host matcher at EM instance densities)
        groups: dict = {}
        collisions = False
        for i, (ml, mattrs) in enumerate(match_instance_rle.items()):
            if ml in label_matches:
                new_label = label_matches[ml]
            else:
                if col_max[i] >= self.merge_ioa_thr:
                    # false split: absorb into the most-overlapping target
                    new_label = target_labels[col_arg[i]]
                elif self.assign_new:
                    new_label = self.next_label
                    self.next_label += 1
                else:
                    new_label = ml
            if new_label in groups:
                collisions = True
                groups[new_label].append(mattrs)
            else:
                groups[new_label] = [mattrs]

        if not collisions:
            # relabel-only: reuse the match flat arrays verbatim (group
            # order == match iteration order when every group is a
            # singleton), skipping all merge work
            matched_rles = RleDict(
                (lbl, attrs[0]) for lbl, attrs in groups.items()
            )
            matched_rles._flat = FlatInstances(
                np.fromiter(groups.keys(), dtype=np.int64, count=len(groups)),
                mf.boxes, mf.offsets, mf.starts, mf.runs,
            )
            matched_rles._flat._areas = mf._areas
        else:
            matched_rles = _merge_groups(groups)

        if update_target:
            self.update_target(matched_rles)
            self._target_flat = getattr(matched_rles, "_flat", None)

        return matched_rles
