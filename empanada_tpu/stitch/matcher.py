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


def _merge_collisions(mf: FlatInstances, new_labels, uniq, first_idx,
                      inverse) -> FlatInstances:
    """Merge collision groups straight from the flat form, returning a
    FlatInstances (callers build the wire dict only when they need it).

    ``new_labels[i]`` is instance i's destination label; ``uniq/first_idx/
    inverse`` come from ``np.unique(new_labels, ...)``.  Output order is
    first occurrence (downstream consumers paint overlapping instances in
    dict iteration order).  One native batched union covers ALL groups —
    single-member groups round-trip unchanged because an instance's runs
    are already canonical (sorted, disjoint).
    """
    from empanada_tpu.core import native

    # group order = first appearance in match iteration order
    rank_order = np.argsort(first_idx)            # unique idx -> ordered rank
    grp_rank = np.empty(len(uniq), dtype=np.int64)
    grp_rank[rank_order] = np.arange(len(uniq))
    member_rank = grp_rank[inverse]               # per member
    member_order = np.argsort(member_rank, kind="stable")
    labels_ordered = uniq[rank_order].astype(np.int64, copy=False)
    sizes = np.bincount(member_rank, minlength=len(uniq))

    if not native.available():
        # numpy fallback: per-group merge (k-way union)
        off = mf.offsets
        out = RleDict()
        for gi, lbl in enumerate(labels_ordered.tolist()):
            members = member_order[
                int(sizes[:gi].sum()): int(sizes[: gi + 1].sum())]
            attrs = [
                {"box": tuple(mf.boxes[k].tolist()),
                 "starts": mf.starts[off[k]: off[k + 1]],
                 "runs": mf.runs[off[k]: off[k + 1]]}
                for k in members.tolist()
            ]
            out[lbl] = attrs[0] if len(attrs) == 1 else merge_attrs_many(attrs)
        return FlatInstances.from_dict(out)

    member_bounds = np.concatenate([[0], np.cumsum(sizes)])
    if mf.boxes.shape[1] == 4:
        # one native call: per-group segment gather + range union + box
        # reduce (the numpy chain below costs ~10 array ops per slice)
        res = native.merge_groups_flat(
            mf.starts, mf.runs, mf.offsets, mf.boxes, member_order,
            member_bounds,
        )
        if res is not None:
            out_starts, out_runs, out_offsets, gboxes = res
            return FlatInstances(labels_ordered, gboxes, out_offsets,
                                 out_starts, out_runs)

    # gather member run segments in group order (vectorized variable-length
    # segment gather)
    lens = np.diff(mf.offsets)
    seg_starts = mf.offsets[:-1][member_order]
    seg_lens = lens[member_order]
    total = int(seg_lens.sum())
    out_off_members = np.concatenate([[0], np.cumsum(seg_lens)])
    idx = (np.arange(total)
           - np.repeat(out_off_members[:-1], seg_lens)
           + np.repeat(seg_starts, seg_lens))
    s = mf.starts[idx]
    ranges = np.stack([s, s + mf.runs[idx]], axis=1)

    group_offsets = out_off_members[member_bounds]
    merged, out_offsets = native.batch_range_union(ranges, group_offsets)

    # per-group enclosing boxes via reduceat (no per-group Python calls)
    boxes_m = mf.boxes[member_order]
    nd = boxes_m.shape[1] // 2
    starts_at = member_bounds[:-1]
    gboxes = np.concatenate(
        [np.minimum.reduceat(boxes_m[:, :nd], starts_at, axis=0),
         np.maximum.reduceat(boxes_m[:, nd:], starts_at, axis=0)],
        axis=1,
    )

    return FlatInstances(
        labels_ordered, gboxes, out_offsets,
        np.ascontiguousarray(merged[:, 0]),
        np.ascontiguousarray(merged[:, 1] - merged[:, 0]),
    )


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
    vals = iou_matrix[rows, cols]
    adj = csr_matrix(
        (np.ones(2 * len(rows), dtype=np.int8),
         (np.concatenate([rows, cols + n1]), np.concatenate([cols + n1, rows]))),
        shape=(n1 + n2, n1 + n2),
    )
    n_comp, comp = connected_components(adj, directed=False)

    # components where one side has a single node need no Hungarian solve:
    # at most one pair can be used, so the max-value edge IS the optimal
    # assignment — and that's the vast majority of components at EM
    # densities (vectorized here; the Python LSA loop cost ~7 ms/slice)
    rows_per = np.bincount(comp[:n1], minlength=n_comp)
    cols_per = np.bincount(comp[n1:], minlength=n_comp)
    edge_comp = comp[rows]
    order_cv = np.lexsort((vals, edge_comp))   # by comp, then value asc
    e_bounds = np.searchsorted(edge_comp[order_cv], np.arange(n_comp + 1))
    has_edge = e_bounds[1:] > e_bounds[:-1]
    best_edge = np.full(n_comp, -1, dtype=np.int64)
    best_edge[has_edge] = order_cv[e_bounds[1:][has_edge] - 1]
    single = (np.minimum(rows_per, cols_per) == 1) & has_edge

    out_rows = [rows[best_edge[single]]]
    out_cols = [cols[best_edge[single]]]

    multi = np.flatnonzero((rows_per > 1) & (cols_per > 1))
    if len(multi):
        order = np.argsort(comp, kind="stable")
        bounds = np.searchsorted(comp[order], np.arange(n_comp + 1))
        for c in multi:
            members = order[bounds[c]: bounds[c + 1]]
            r = members[members < n1]
            k = members[members >= n1] - n1
            sub_r, sub_c = linear_sum_assignment(
                iou_matrix[np.ix_(r, k)], maximize=True)
            out_rows.append(r[sub_r])
            out_cols.append(k[sub_c])
    return np.concatenate(out_rows), np.concatenate(out_cols)


def _uf_components(n: int, erows, ecols):
    """Union-find over an edge list; per-node component ids 0..k-1."""
    parent = list(range(n))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(erows.tolist(), ecols.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(n)), np.int64, count=n)
    _, comp = np.unique(roots, return_inverse=True)
    return comp.astype(np.int64, copy=False)


def _assign_edges(n1, n2, erows, ecols, evals, iou_thr):
    """Exact max-IoU assignment straight from the box-screened edge list —
    the dense Hungarian decomposed over bipartite connected components
    (zero cross-component entries never contribute to the maximum), without
    materializing the n1 x n2 matrix or a scipy csgraph.  Returns
    (match_rows, match_cols) after the ``iou_thr`` filter.

    This is the RLEMatcher hot path: at EM densities (~365 inst/slice) the
    dense-matrix route (alloc + np.nonzero + csr + csgraph) costs ~2 ms per
    slice on the sequential matcher thread; this is ~0.3 ms."""
    keep = evals > 0
    erows, ecols, evals = erows[keep], ecols[keep], evals[keep]
    if len(erows) == 0:
        e = np.empty(0, np.int64)
        return e, e
    comp = _uf_components(n1 + n2, erows, ecols + n1)
    n_comp = int(comp.max()) + 1
    rows_per = np.bincount(comp[:n1], minlength=n_comp)
    cols_per = np.bincount(comp[n1:], minlength=n_comp)

    edge_comp = comp[erows]
    order_cv = np.lexsort((evals, edge_comp))   # by comp, then value asc
    e_bounds = np.searchsorted(edge_comp[order_cv], np.arange(n_comp + 1))
    has_edge = e_bounds[1:] > e_bounds[:-1]
    best_edge = np.full(n_comp, -1, dtype=np.int64)
    best_edge[has_edge] = order_cv[e_bounds[1:][has_edge] - 1]
    # one-sided components: at most one pair can be used, so the max-value
    # edge IS the optimal assignment (the vast majority at EM densities)
    single = (np.minimum(rows_per, cols_per) == 1) & has_edge

    out_rows = [erows[best_edge[single]]]
    out_cols = [ecols[best_edge[single]]]
    out_vals = [evals[best_edge[single]]]

    multi = np.flatnonzero((rows_per > 1) & (cols_per > 1))
    if len(multi):
        order_e = np.argsort(edge_comp, kind="stable")
        eb = np.searchsorted(edge_comp[order_e], np.arange(n_comp + 1))
        node_order = np.argsort(comp, kind="stable")
        nb = np.searchsorted(comp[node_order], np.arange(n_comp + 1))
        for c in multi:
            members = node_order[nb[c]: nb[c + 1]]
            r = members[members < n1]
            k = members[members >= n1] - n1
            es = order_e[eb[c]: eb[c + 1]]
            sub = np.zeros((len(r), len(k)))
            sub[np.searchsorted(r, erows[es]),
                np.searchsorted(k, ecols[es])] = evals[es]
            sr, sc = linear_sum_assignment(sub, maximize=True)
            out_rows.append(r[sr])
            out_cols.append(k[sc])
            out_vals.append(sub[sr, sc])

    mr = np.concatenate(out_rows)
    mc = np.concatenate(out_cols)
    mv = np.concatenate(out_vals)
    if iou_thr is not None:
        sel = mv >= iou_thr
        mr, mc = mr[sel], mc[sel]
    return mr, mc


# native matcher-core gate: the C++ box screen is the quadratic row-major
# test, so bound the pair product (an EM-density 512^2 slice pair is ~130k)
_CORE_MAX_PAIRS = 1 << 19


def _solve_spill(spill, spill_vals, iou_thr):
    """Exact Hungarian resolution of the components the native core spilled
    (both sides > 1 member) — identical math to _assign_edges' multi branch:
    per component, a dense submatrix over the sorted member sets, an exact
    max-assignment solve, then the IoU threshold filter.  The native
    shortest-augmenting-path solver handles it in one call (same algorithm
    family as scipy; exact agreement fuzz-gated in tests/test_native_fuzz);
    scipy per component is the fallback."""
    try:
        from empanada_tpu.core import native

        res = native.solve_spill(spill, spill_vals, iou_thr)
        if res is not None:
            return res
    except ImportError:
        pass
    out_r, out_c = [np.empty(0, np.int64)], [np.empty(0, np.int64)]
    for c in np.unique(spill[:, 0]):
        es = np.flatnonzero(spill[:, 0] == c)
        r = np.unique(spill[es, 1])
        k = np.unique(spill[es, 2])
        sub = np.zeros((len(r), len(k)))
        sub[np.searchsorted(r, spill[es, 1]),
            np.searchsorted(k, spill[es, 2])] = spill_vals[es]
        sr, sc = linear_sum_assignment(sub, maximize=True)
        keep = sub[sr, sc] >= iou_thr
        out_r.append(r[sr][keep])
        out_c.append(k[sc][keep])
    return np.concatenate(out_r), np.concatenate(out_c)


def _col_max_arg(n2, erows, ecols, evals):
    """Per-column (max, argmax-row) of an edge-sparse matrix — equal to
    dense ``.max(axis=0)`` / ``.argmax(axis=0)`` over screened pairs,
    including first-row-on-ties argmax semantics."""
    col_max = np.zeros(n2)
    col_arg = np.zeros(n2, dtype=np.int64)
    if len(ecols):
        # within (col, value) ties, rows descending -> the LAST entry per
        # column group carries the smallest row, matching dense argmax
        order = np.lexsort((-erows, evals, ecols))
        b = np.searchsorted(ecols[order], np.arange(n2 + 1))
        has = b[1:] > b[:-1]
        last = order[b[1:][has] - 1]
        col_max[has] = evals[last]
        col_arg[has] = erows[last]
    return col_max, col_arg


def _assign(iou_matrix, ioa_matrix, labels1, labels2, iou_thr, return_iou, return_ioa):
    # box screening leaves ~1 candidate/instance, so component decomposition
    # (exactly equivalent to the dense solve — zero cross-component entries
    # never contribute) beats dense Hungarian well below the old >256 cut:
    # at the bench fixture's 365 inst/slice it saves ~1 ms/slice on the
    # matcher thread's critical path
    if min(iou_matrix.shape) > 32 and iou_thr:
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

    def initialize_target_flat(self, flat: "FlatInstances"):
        """Flat-wire initialize (no dict materialization on the hot loop)."""
        self.target_rle = None
        self._target_flat = flat
        if len(flat):
            self.next_label = int(flat.labels.max()) + 1

    def update_target(self, instance_rles: dict):
        self.target_rle = instance_rles
        self._target_flat = None

    def reset_target(self):
        self.target_rle = None
        self._target_flat = None

    def has_target(self) -> bool:
        return self.target_rle is not None or self._target_flat is not None

    def _target_as_flat(self):
        tf = self._target_flat
        if self.target_rle is not None and (
                tf is None or not flat_matches_dict(tf, self.target_rle)):
            # dict is authoritative when present (external code may have
            # mutated it); re-derive and cache
            tf = FlatInstances.from_dict(self.target_rle)
            self._target_flat = tf
        return tf

    def match_flat(self, mf: "FlatInstances",
                   update_target: bool = True) -> "FlatInstances":
        """Flat-in/flat-out matching — the 3D pipeline's sequential hot
        path.  Assignment and the IoA absorb decisions run on the
        box-screened EDGE LIST (``_assign_edges``/``_col_max_arg``), and the
        output FlatInstances is handed to the next stage without building
        the nested wire dict (``__call__`` wraps this for dict consumers)."""
        tf = self._target_as_flat()
        assert tf is not None, "Initialize target rle before running!"

        n2 = len(mf)
        if len(tf) == 0 or n2 == 0:
            mr = mc = np.empty(0, np.int64)
            col_max = np.zeros(n2)
            col_arg = np.zeros(n2, np.int64)
        else:
            core = None
            if len(tf) * n2 <= _CORE_MAX_PAIRS:
                try:
                    from empanada_tpu.core import native

                    if native.available():
                        # one native call covers box screen + intersections
                        # + IoU edges + components + single-candidate
                        # assignment + IoA column stats — the ~0.7 ms/pair
                        # numpy chain below costs more in interpreter
                        # overhead than math at ortho slice sizes
                        core = native.match_flat_core(
                            tf, mf, self.merge_iou_thr)
                except ImportError:
                    core = None
            if core is not None:
                matched_row, col_max, col_arg, spill, spill_vals = core
                mc = np.flatnonzero(matched_row >= 0)
                mr = matched_row[mc]
                if len(spill):
                    mr2, mc2 = _solve_spill(spill, spill_vals,
                                            self.merge_iou_thr)
                    mr = np.concatenate([mr, mr2])
                    mc = np.concatenate([mc, mc2])
            else:
                box_matches = overlapping_box_pairs(tf.boxes, mf.boxes)
                if len(box_matches):
                    inters = _batch_intersections_flat(tf, mf, box_matches)
                    r1 = box_matches[:, 0]
                    r2 = box_matches[:, 1]
                    union = tf.areas[r1] + mf.areas[r2] - inters
                    iou = np.where(union > 0, inters / np.maximum(union, 1), 0.0)
                    a2 = mf.areas[r2]
                    ioa = np.where(a2 > 0, inters / np.maximum(a2, 1), 0.0)
                else:
                    r1 = r2 = np.empty(0, np.int64)
                    iou = ioa = np.empty(0)
                mr, mc = _assign_edges(len(tf), n2, r1, r2, iou,
                                       self.merge_iou_thr)
                col_max, col_arg = _col_max_arg(n2, r1, r2, ioa)

        new_labels = np.empty(n2, dtype=np.int64)
        is_matched = np.zeros(n2, dtype=bool)
        is_matched[mc] = True
        new_labels[mc] = tf.labels[mr]
        # false split: absorb unmatched instances into the most-overlapping
        # target when IoA clears the threshold
        absorb = ~is_matched & (col_max >= self.merge_ioa_thr)
        new_labels[absorb] = tf.labels[col_arg[absorb]]
        fresh = ~is_matched & ~absorb
        n_fresh = int(fresh.sum())
        if self.assign_new:
            new_labels[fresh] = self.next_label + np.arange(n_fresh)
            self.next_label += n_fresh
        else:
            new_labels[fresh] = mf.labels[fresh]

        uniq, first_idx, inverse = np.unique(
            new_labels, return_index=True, return_inverse=True
        )
        if len(uniq) == len(new_labels):
            # relabel-only (no collisions): reuse the match flat arrays
            # verbatim, skipping all merge work
            out = FlatInstances(new_labels, mf.boxes, mf.offsets,
                                mf.starts, mf.runs)
            out._areas = mf._areas
        else:
            # collision groups merged in ONE batched native union over ALL
            # groups (single-member groups pass through: their runs are
            # already canonical), with boxes reduced per group — no
            # per-group Python loop
            out = _merge_collisions(mf, new_labels, uniq, first_idx, inverse)

        if update_target:
            self.target_rle = None
            self._target_flat = out
        return out

    def __call__(self, match_instance_rle: dict, update_target: bool = True) -> dict:
        assert self.has_target(), "Initialize target rle before running!"
        mf = FlatInstances.from_dict(match_instance_rle)
        out_flat = self.match_flat(mf, update_target=update_target)
        matched_rles = out_flat.to_dict()
        if update_target:
            # dict consumers keep seeing a dict target (old contract)
            self.target_rle = matched_rles
            self._target_flat = out_flat
        return matched_rles
