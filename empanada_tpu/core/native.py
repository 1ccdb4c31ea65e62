"""ctypes bindings to the native C++ kernel library (libempanada_core.so).

Builds from ``empanada_tpu/csrc/core_kernels.cpp`` via the Makefile there.
Every binding has a pure numpy/Python fallback in its calling module, so the
framework works without the shared library (just slower on the host paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libempanada_core.so")
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        # try a one-shot build; never fail hard
        try:
            subprocess.run(
                ["make", "-C", _SRC_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.cc_runs.argtypes = [i64p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int, i64p]
    lib.cc_runs.restype = None

    lib.range_intersection.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.range_intersection.restype = ctypes.c_int64

    lib.vote_ranges.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.vote_ranges.restype = ctypes.c_int64

    lib.vote_sorted_sets.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.vote_sorted_sets.restype = ctypes.c_int64

    lib.batch_pair_intersection.argtypes = [
        i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.batch_pair_intersection.restype = None

    lib.fill_ranges_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), i64p, ctypes.c_int64, ctypes.c_int32]
    lib.fill_ranges_i32.restype = None
    lib.fill_ranges_i64.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64]
    lib.fill_ranges_i64.restype = None
    lib.fill_ranges_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), i64p, ctypes.c_int64, ctypes.c_uint32]
    lib.fill_ranges_u32.restype = None

    lib.mask_watershed.argtypes = [
        u8p, ctypes.c_int64, i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.mask_watershed.restype = None

    lib.gray_watershed.argtypes = [
        ctypes.POINTER(ctypes.c_float), u8p, ctypes.c_int64,
        i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.gray_watershed.restype = None

    lib.chunk_split_ranges.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.chunk_split_ranges.restype = ctypes.c_int64

    lib.box_overlap_pairs.argtypes = [
        i64p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
        i64p, ctypes.c_int64]
    lib.box_overlap_pairs.restype = ctypes.c_int64

    lib.range_union.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.range_union.restype = ctypes.c_int64

    lib.batch_range_union.argtypes = [i64p, i64p, ctypes.c_int64, i64p, i64p]
    lib.batch_range_union.restype = ctypes.c_int64

    lib.extract_runs_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, i64p, i64p, i64p, i64p]
    lib.extract_runs_i32.restype = ctypes.c_int64
    lib.extract_runs_i64.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, i64p, i64p]
    lib.extract_runs_i64.restype = ctypes.c_int64

    lib.runs_build_flat.argtypes = [
        i64p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        i64p, i64p, i64p, i64p, i64p, i64p]
    lib.runs_build_flat.restype = ctypes.c_int64
    lib.packed_build_flat.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, i64p, i64p, i64p, i64p, i64p, i64p]
    lib.packed_build_flat.restype = ctypes.c_int64

    # hot per-slice bindings take raw void pointers: .ctypes.data is a
    # plain int (~10x cheaper than a data_as POINTER cast, and the matcher
    # makes ~9 of these per slice pair)
    vp = ctypes.c_void_p
    lib.match_flat_core.argtypes = [
        vp, vp, vp, vp, vp, ctypes.c_int64,   # target flat
        vp, vp, vp, vp, vp, ctypes.c_int64,   # match flat
        ctypes.c_double,                       # iou_thr
        vp, vp, vp,                            # matched_row/col stats
        vp, vp, ctypes.c_int64]                # spill
    lib.match_flat_core.restype = ctypes.c_int64

    lib.solve_spill.argtypes = [
        vp, vp, ctypes.c_int64, ctypes.c_double, vp, vp]
    lib.solve_spill.restype = ctypes.c_int64

    lib.merge_groups_flat.argtypes = [
        vp, vp, vp, vp, vp, vp, ctypes.c_int64, vp, vp, vp, vp]
    lib.merge_groups_flat.restype = ctypes.c_int64

    lib.match_sweep.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        vp, vp, vp, vp, vp, vp]
    lib.match_sweep.restype = ctypes.c_int64

    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_i64(a):
    # fast path: the stitching layer passes conforming arrays ~always, and
    # np.ascontiguousarray costs ~6 us even when it is a no-op
    if isinstance(a, np.ndarray) and a.dtype == np.int64 and a.flags.c_contiguous:
        return a
    return np.ascontiguousarray(a, dtype=np.int64)


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def connected_components_runs(values, rows, col_starts, col_ends, connectivity=8):
    lib = _load()
    values = _as_i64(values)
    rows = _as_i64(rows)
    col_starts = _as_i64(col_starts)
    col_ends = _as_i64(col_ends)
    n = len(values)
    out = np.empty(n, dtype=np.int64)
    lib.cc_runs(
        _i64p(values), _i64p(rows), _i64p(col_starts), _i64p(col_ends),
        n, int(connectivity), _i64p(out),
    )
    return out


def range_intersection(ranges_a, ranges_b) -> int:
    lib = _load()
    a = _as_i64(ranges_a).reshape(-1, 2)
    b = _as_i64(ranges_b).reshape(-1, 2)
    return int(lib.range_intersection(_i64p(a), len(a), _i64p(b), len(b)))


def batch_pair_intersection(ranges_flat, row_offsets, pairs, max_threads: int = 0) -> np.ndarray:
    """ranges_flat (R, 2) int64; row_offsets (n_inst+1,); pairs (k, 2).

    ``max_threads``: 0 = auto; pass 1 from inside a thread pool to avoid
    oversubscription."""
    lib = _load()
    r = _as_i64(ranges_flat).reshape(-1, 2)
    ro = _as_i64(row_offsets)
    p = _as_i64(pairs).reshape(-1, 2)
    out = np.empty(len(p), dtype=np.int64)
    lib.batch_pair_intersection(
        _i64p(r), _i64p(ro), _i64p(p), len(p), int(max_threads), _i64p(out)
    )
    return out


def vote_ranges(ranges, vote_thr: int) -> np.ndarray:
    lib = _load()
    r = _as_i64(ranges).reshape(-1, 2)
    # stable sort by start (the kernel sorts events internally, but callers
    # expect sorted disjoint output which the sweep produces)
    out = np.empty_like(r).reshape(-1, 2)
    n_out = lib.vote_ranges(_i64p(r), len(r), int(vote_thr), _i64p(out))
    return out[:n_out].copy()


def fill_ranges(flat: np.ndarray, ranges, value):
    lib = _load()
    r = _as_i64(ranges).reshape(-1, 2)
    if flat.dtype == np.int32:
        lib.fill_ranges_i32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _i64p(r), len(r),
            ctypes.c_int32(int(value)))
    elif flat.dtype == np.uint32:
        lib.fill_ranges_u32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), _i64p(r), len(r),
            ctypes.c_uint32(int(value)))
    elif flat.dtype == np.int64:
        lib.fill_ranges_i64(_i64p(flat), _i64p(r), len(r), ctypes.c_int64(int(value)))
    else:
        raise TypeError(f"unsupported fill dtype {flat.dtype}")


def mask_watershed(mask_flat: np.ndarray, marker_locations, neighborhood, output_flat: np.ndarray):
    lib = _load()
    mask_flat = np.ascontiguousarray(mask_flat, dtype=np.uint8)
    ml = _as_i64(marker_locations)
    nb = _as_i64(neighborhood)
    assert output_flat.dtype == np.int64 and output_flat.flags.c_contiguous
    lib.mask_watershed(
        mask_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(mask_flat),
        _i64p(ml), len(ml), _i64p(nb), len(nb), _i64p(output_flat),
    )


def gray_watershed(
    image_flat: np.ndarray, mask_flat: np.ndarray, marker_locations, neighborhood,
    output_flat: np.ndarray,
):
    lib = _load()
    image_flat = np.ascontiguousarray(image_flat, dtype=np.float32)
    mask_flat = np.ascontiguousarray(mask_flat, dtype=np.uint8)
    ml = _as_i64(marker_locations)
    nb = _as_i64(neighborhood)
    assert output_flat.dtype == np.int64 and output_flat.flags.c_contiguous
    lib.gray_watershed(
        image_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(mask_flat),
        _i64p(ml), len(ml), _i64p(nb), len(nb), _i64p(output_flat),
    )


def range_union(ranges_a, ranges_b) -> np.ndarray:
    """Union of two sorted disjoint (k, 2) range sets -> sorted disjoint
    (m, 2) ranges (linear two-pointer merge, csrc range_union)."""
    lib = _load()
    a = _as_i64(ranges_a).reshape(-1, 2)
    b = _as_i64(ranges_b).reshape(-1, 2)
    out = np.empty((len(a) + len(b), 2), dtype=np.int64)
    n_out = lib.range_union(_i64p(a), len(a), _i64p(b), len(b), _i64p(out))
    return out[:n_out].copy()


def batch_range_union(ranges, group_offsets):
    """Per-group union of grouped (R, 2) ranges (csrc batch_range_union).
    Returns (out_ranges (M, 2), out_offsets (G+1,))."""
    lib = _load()
    r = _as_i64(ranges).reshape(-1, 2)
    go = _as_i64(group_offsets)
    out = np.empty_like(r)
    oo = np.empty_like(go)
    lib.batch_range_union(_i64p(r), _i64p(go), len(go) - 1, _i64p(out), _i64p(oo))
    return out[: oo[-1]].copy(), oo


def box_overlap_pairs(boxes1, boxes2=None) -> np.ndarray:
    """(k, 2) ordered index pairs with positive box intersection, via the
    output-sensitive C++ sweep (see csrc box_overlap_pairs).  Pairs come
    back sorted lexicographically, matching the dense nonzero() order."""
    lib = _load()
    b1 = _as_i64(boxes1)
    b2 = b1 if boxes2 is None else _as_i64(boxes2)
    nd = b1.shape[1] // 2
    cap = max(65536, 8 * max(len(b1), len(b2)))
    while True:
        out = np.empty((cap, 2), dtype=np.int64)
        n_out = lib.box_overlap_pairs(
            _i64p(b1), len(b1), _i64p(b2), len(b2), nd, _i64p(out), cap
        )
        if n_out >= 0:
            pairs = out[:n_out]
            order = np.lexsort((pairs[:, 1], pairs[:, 0]))
            return pairs[order].copy()
        cap *= 4


def chunk_split_ranges(ranges, modulo: int, divisor: int) -> np.ndarray:
    lib = _load()
    r = _as_i64(ranges).reshape(-1, 2)
    # capacity estimate: a range splits at divisor boundaries AND at every
    # modulo wrap (when chunk dims don't divide the array shape each wrap
    # adds a piece the divisor quotient alone misses) — grow on overflow
    # instead of failing, the kernel reports -1
    lens = (r[:, 1] - r[:, 0]) if len(r) else np.zeros(0, dtype=np.int64)
    cap = int(
        2 * len(r) + (lens // max(divisor, 1)).sum()
        + (lens // max(modulo, 1)).sum() + 8
    )
    while True:
        out = np.empty((cap, 2), dtype=np.int64)
        n_out = lib.chunk_split_ranges(
            _i64p(r), len(r), int(modulo), int(divisor), _i64p(out), cap
        )
        if n_out >= 0:
            return out[:n_out].copy()
        cap *= 4


def extract_runs(seg: np.ndarray):
    """Single-pass horizontal run extraction from a dense 2D label map.

    Returns (values, rows, col_starts, col_ends) int64 arrays of the nonzero
    runs, or None when the dtype is unsupported (caller falls back to the
    numpy formulation in core.labeling.extract_runs).
    """
    lib = _load()
    if lib is None:
        return None
    orig = np.ascontiguousarray(seg)
    seg = orig
    if seg.dtype == np.uint32:
        # reinterpret without a copy; values >= 2^31 read as negative and
        # make the kernel return -1, upgrading to the int64 path below —
        # so the hot path pays no max() pre-scan
        seg = seg.view(np.int32)
    if seg.dtype == np.int32:
        fn = lib.extract_runs_i32
        ptr = seg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    elif seg.dtype == np.int64:
        fn = lib.extract_runs_i64
        ptr = _i64p(seg)
    else:
        return None
    h, w = seg.shape
    # EM-density maps carry ~10 runs/row; start with a small buffer and
    # retry at the h*w worst case on overflow instead of always
    # allocating 32 bytes/pixel of scratch
    cap = min(h * w, max(4096, h * 32))
    while True:
        values = np.empty(cap, dtype=np.int64)
        rows = np.empty(cap, dtype=np.int64)
        cs = np.empty(cap, dtype=np.int64)
        ce = np.empty(cap, dtype=np.int64)
        n = fn(ptr, h, w, cap, _i64p(values), _i64p(rows), _i64p(cs), _i64p(ce))
        if n == -1:
            # negative int32 (or uint32 >= 2^31 reinterpret): int64 handles
            # both with numpy-path semantics
            seg = orig.astype(np.int64)
            fn = lib.extract_runs_i64
            ptr = _i64p(seg)
            continue
        if n == -2:
            cap = h * w
            continue
        # copy out so the cap-sized scratch is not pinned by the views
        return values[:n].copy(), rows[:n].copy(), cs[:n].copy(), ce[:n].copy()


def _flat_outputs(cap_runs):
    labels = np.empty(cap_runs, dtype=np.int64)
    boxes = np.empty((cap_runs, 4), dtype=np.int64)
    offsets = np.empty(cap_runs + 1, dtype=np.int64)
    starts = np.empty(cap_runs, dtype=np.int64)
    runs = np.empty(cap_runs, dtype=np.int64)
    return labels, boxes, offsets, starts, runs


def runs_build_flat(values, rows, col_starts, col_ends, width: int,
                    min_id: int, max_id: int, force_connected: bool,
                    connectivity: int = 8):
    """Fused class-window filter + (optional) CC + instance grouping +
    RLE canonicalization over pre-extracted runs (csrc runs_build_flat).
    Returns (labels, boxes, offsets, starts, runs) arrays — the
    FlatInstances fields — or None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    values = _as_i64(values)
    rows = _as_i64(rows)
    col_starts = _as_i64(col_starts)
    col_ends = _as_i64(col_ends)
    n = len(values)
    labels, boxes, offsets, starts, runs = _flat_outputs(max(n, 1))
    n_inst = np.zeros(1, dtype=np.int64)
    n_out = lib.runs_build_flat(
        _i64p(values), _i64p(rows), _i64p(col_starts), _i64p(col_ends),
        n, int(width), int(min_id), int(max_id), int(force_connected),
        int(connectivity), _i64p(labels), _i64p(boxes), _i64p(offsets),
        _i64p(starts), _i64p(runs), _i64p(n_inst),
    )
    k = int(n_inst[0])
    return (labels[:k].copy(), boxes[:k].copy(), offsets[: k + 1].copy(),
            starts[:n_out].copy(), runs[:n_out].copy())


def packed_build_flat(row_buf: np.ndarray, width: int, min_id: int,
                      max_id: int, force_connected: bool,
                      connectivity: int = 8):
    """runs_build_flat straight off a device-packed per-slice buffer
    (ops.postprocess.encode_runs_packed layout: (H, 2R+1) int16 rows of
    [starts | values | count]).  Returns the FlatInstances field tuple,
    None when native is unavailable, or the string "overflow" when any
    row exceeded its R-run capacity (caller falls back to the dense map,
    same contract as core.labeling.decode_runs_packed)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(row_buf, dtype=np.int16)
    h, twr = buf.shape
    rcap = (twr - 1) // 2
    cap = max(int(h * rcap), 1)
    labels, boxes, offsets, starts, runs = _flat_outputs(cap)
    n_inst = np.zeros(1, dtype=np.int64)
    n_out = lib.packed_build_flat(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), h, rcap,
        int(width), int(min_id), int(max_id), int(force_connected),
        int(connectivity), _i64p(labels), _i64p(boxes), _i64p(offsets),
        _i64p(starts), _i64p(runs), _i64p(n_inst),
    )
    if n_out == -1:
        return "overflow"
    k = int(n_inst[0])
    return (labels[:k].copy(), boxes[:k].copy(), offsets[: k + 1].copy(),
            starts[:n_out].copy(), runs[:n_out].copy())


def match_flat_core(tf, mf, iou_thr: float):
    """One-call matcher core for two FlatInstances-shaped tuples
    (csrc match_flat_core): box screen + RLE intersections + IoU edges +
    union-find + single-candidate assignment + per-column IoA stats.

    ``tf``/``mf``: objects with .boxes (n,4) int64 half-open, .offsets,
    .starts, .runs, .areas int64 arrays.  Returns
    (matched_row (n2) int64 with -1 for cols not matched here,
     col_max (n2) f64, col_arg (n2) int64,
     spill (k,3) int64 [comp, row, col], spill_vals (k,) f64)
    where spill carries the edges of components needing the exact
    Hungarian solve (both sides > 1 member) — resolved by the caller.
    None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n1, n2 = len(tf.labels), len(mf.labels)
    matched_row = np.empty(n2, dtype=np.int64)
    col_max = np.empty(n2, dtype=np.float64)
    col_arg = np.empty(n2, dtype=np.int64)
    cap = 1024
    b1 = np.ascontiguousarray(tf.boxes, dtype=np.int64)
    b2 = np.ascontiguousarray(mf.boxes, dtype=np.int64)
    a1 = _as_i64(tf.areas)
    a2 = _as_i64(mf.areas)
    while True:
        spill = np.empty((cap, 3), dtype=np.int64)
        spill_vals = np.empty(cap, dtype=np.float64)
        n_spill = lib.match_flat_core(
            b1.ctypes.data, _as_i64(tf.offsets).ctypes.data,
            _as_i64(tf.starts).ctypes.data, _as_i64(tf.runs).ctypes.data,
            a1.ctypes.data, n1,
            b2.ctypes.data, _as_i64(mf.offsets).ctypes.data,
            _as_i64(mf.starts).ctypes.data, _as_i64(mf.runs).ctypes.data,
            a2.ctypes.data, n2,
            float(iou_thr),
            matched_row.ctypes.data, col_max.ctypes.data,
            col_arg.ctypes.data, spill.ctypes.data, spill_vals.ctypes.data,
            cap,
        )
        if n_spill >= 0:
            return (matched_row, col_max, col_arg,
                    spill[:n_spill], spill_vals[:n_spill])
        cap *= 8


def merge_groups_flat(starts, runs, offsets, boxes, member_order,
                      member_bounds):
    """Collision-group merge in one call (csrc merge_groups_flat): per
    group, gather members' runs, union them, and reduce the enclosing box.
    Returns (out_starts, out_runs, out_offsets, out_boxes) or None when the
    native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    starts = _as_i64(starts)
    runs = _as_i64(runs)
    offsets = _as_i64(offsets)
    boxes = _as_i64(boxes)
    member_order = _as_i64(member_order)
    member_bounds = _as_i64(member_bounds)
    n_groups = len(member_bounds) - 1
    cap = len(starts)
    out_starts = np.empty(cap, dtype=np.int64)
    out_runs = np.empty(cap, dtype=np.int64)
    out_offsets = np.empty(n_groups + 1, dtype=np.int64)
    out_boxes = np.empty((n_groups, 4), dtype=np.int64)
    n = lib.merge_groups_flat(
        starts.ctypes.data, runs.ctypes.data, offsets.ctypes.data,
        boxes.ctypes.data, member_order.ctypes.data,
        member_bounds.ctypes.data, n_groups,
        out_starts.ctypes.data, out_runs.ctypes.data,
        out_offsets.ctypes.data, out_boxes.ctypes.data,
    )
    return out_starts[:n], out_runs[:n], out_offsets, out_boxes


def match_sweep(packed_slices: np.ndarray, width: int, min_id: int,
                max_id: int, force_connected: bool, iou_thr: float,
                ioa_thr: float, next_label_start: int,
                connectivity: int = 8):
    """Whole-sweep seg build + forward matching + backward matching for one
    class, no Python between slices (csrc match_sweep — byte-identical to
    the stitch.patterns forward/backward loops, fuzz-gated).

    ``packed_slices``: (n_slices, H, 2R+1) int16 device-packed rows.
    Returns a list of per-slice FlatInstances field tuples (the BACKWARD
    pass results, what update_trackers consumes), ``"fallback"`` when any
    slice overflows its packed/CC capacity (caller takes the Python path,
    which raises the proper diagnostics), or None if the native lib is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(packed_slices, dtype=np.int16)
    s_n, h, twr = buf.shape
    rcap = (twr - 1) // 2
    run_cap = max(1, int(s_n * h * rcap))
    slice_off = np.empty(s_n + 1, dtype=np.int64)
    labels = np.empty(run_cap, dtype=np.int64)
    boxes = np.empty((run_cap, 4), dtype=np.int64)
    run_off = np.empty(run_cap + 1, dtype=np.int64)
    starts = np.empty(run_cap, dtype=np.int64)
    runs = np.empty(run_cap, dtype=np.int64)
    n = lib.match_sweep(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        s_n, h * twr, h, rcap, int(width),
        int(min_id), int(max_id), int(force_connected), int(connectivity),
        float(iou_thr), float(ioa_thr), int(next_label_start),
        slice_off.ctypes.data, labels.ctypes.data, boxes.ctypes.data,
        run_off.ctypes.data, starts.ctypes.data, runs.ctypes.data,
    )
    if n < 0:
        return "fallback"
    out = []
    for s in range(s_n):
        k0, k1 = int(slice_off[s]), int(slice_off[s + 1])
        r0 = int(run_off[k0]) if k1 > k0 else 0
        r1 = int(run_off[k1]) if k1 > k0 else 0
        out.append((
            labels[k0:k1].copy(), boxes[k0:k1].copy(),
            (run_off[k0:k1 + 1] - run_off[k0]).copy()
            if k1 > k0 else np.zeros(1, np.int64),
            starts[r0:r1].copy(), runs[r0:r1].copy(),
        ))
    return out


def solve_spill(spill: np.ndarray, spill_vals: np.ndarray, iou_thr: float):
    """Exact Hungarian resolution of match_flat_core's spilled components
    (csrc solve_spill: per-component shortest-augmenting-path assignment,
    the same algorithm family as scipy.linear_sum_assignment).  ``spill``
    (k, 3) int64 [comp, row, col] in any order (sorted by comp here);
    returns (rows, cols) int64 arrays of threshold-passing assignments, or
    None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if len(spill) == 0:
        e = np.empty(0, np.int64)
        return e, e
    order = np.argsort(spill[:, 0], kind="stable")
    sp = np.ascontiguousarray(spill[order], dtype=np.int64)
    sv = np.ascontiguousarray(spill_vals[order], dtype=np.float64)
    out_r = np.empty(len(sp), dtype=np.int64)
    out_c = np.empty(len(sp), dtype=np.int64)
    n = lib.solve_spill(
        sp.ctypes.data, sv.ctypes.data, len(sp), float(iou_thr),
        out_r.ctypes.data, out_c.ctypes.data,
    )
    return out_r[:n], out_c[:n]


def vote_sorted_sets(list_of_ranges, vote_thr: int) -> np.ndarray:
    """k-of-n coverage vote over k individually sorted DISJOINT range sets
    (valid RLEs) via a k-way event merge — no sort (csrc vote_sorted_sets).
    Caller must verify per-set sortedness/disjointness."""
    lib = _load()
    arrs = [_as_i64(r).reshape(-1, 2) for r in list_of_ranges]
    k = len(arrs)
    if k == 0:
        return np.empty((0, 2), dtype=np.int64)
    lens = np.fromiter(map(len, arrs), dtype=np.int64, count=k)
    offsets = np.empty(k + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    flat = np.concatenate(arrs) if k > 1 else arrs[0]
    out = np.empty((max(int(offsets[-1]), 1), 2), dtype=np.int64)
    n_out = lib.vote_sorted_sets(_i64p(flat), _i64p(offsets), k, int(vote_thr), _i64p(out))
    return out[:n_out].copy()
