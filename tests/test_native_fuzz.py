"""Randomized native-vs-numpy parity for every C++ kernel dispatch site.

Each high-level function with a ``native.available()`` branch is run twice
on the same randomized inputs — native enabled and forced off — and the
outputs must be identical.  This guards the property every other test
relies on: the C++ layer is a pure accelerator, never a behavior change.

Reference semantics being covered: empanada/array_utils.py (range algebra,
voting), empanada/inference/watershed.py (bc_watershed), and the RLE
stitch pipeline of empanada/inference/{rle,matcher,tracker}.py.
"""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, label as cc_label

from empanada_tpu.core import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels not built"
)


class _no_native:
    """Context manager forcing the numpy fallback paths."""

    def __enter__(self):
        self._mp = pytest.MonkeyPatch()
        self._mp.setattr(native, "available", lambda: False)
        return self

    def __exit__(self, *exc):
        self._mp.undo()
        return False


def _rand_ranges(rng, n_max=60, size=4000):
    """Random sorted, disjoint (possibly touching) half-open ranges."""
    n = int(rng.integers(0, n_max))
    if n == 0:
        return np.empty((0, 2), np.int64)
    starts = np.sort(rng.choice(size, n, replace=False)).astype(np.int64)
    ends = starts + rng.integers(1, 40, n)
    ends[:-1] = np.minimum(ends[:-1], starts[1:])
    keep = ends > starts
    return np.stack([starts[keep], ends[keep]], 1)


def test_range_algebra_fuzz():
    from empanada_tpu.core.ranges import (
        coverage_ranges, intersection_from_ranges, join_ranges, vote_by_ranges,
    )

    for seed in range(40):
        rng = np.random.default_rng(seed)
        sets = [_rand_ranges(rng) for _ in range(int(rng.integers(2, 6)))]
        thr = int(rng.integers(2, 4))

        got = {
            "join": join_ranges(sets),
            "vote": vote_by_ranges(sets, thr),
            "cov": coverage_ranges(np.concatenate(sets), thr),
            "inter": intersection_from_ranges(sets[0], sets[1]),
        }
        with _no_native():
            assert np.array_equal(join_ranges(sets), got["join"]), seed
            assert np.array_equal(vote_by_ranges(sets, thr), got["vote"]), seed
            assert np.array_equal(
                coverage_ranges(np.concatenate(sets), thr), got["cov"]
            ), seed
            assert intersection_from_ranges(sets[0], sets[1]) == got["inter"], seed


def test_rle_merge_intersection_fuzz():
    from empanada_tpu.core.rle import merge_rles, rle_intersection

    for seed in range(40):
        rng = np.random.default_rng(100 + seed)
        ra, rb = _rand_ranges(rng), _rand_ranges(rng)
        sa, na = ra[:, 0], ra[:, 1] - ra[:, 0]
        sb, nb = rb[:, 0], rb[:, 1] - rb[:, 0]

        ms, mn = merge_rles(sa, na, sb, nb)
        inter = rle_intersection(sa, na, sb, nb)
        with _no_native():
            ms2, mn2 = merge_rles(sa, na, sb, nb)
            assert np.array_equal(ms, ms2) and np.array_equal(mn, mn2), seed
            assert rle_intersection(sa, na, sb, nb) == inter, seed


def test_connected_components_fuzz():
    from empanada_tpu.core.labeling import label_2d

    for seed in range(10):
        rng = np.random.default_rng(200 + seed)
        field = gaussian_filter(rng.normal(0, 1, (48, 48)), 2.5)
        mask = (field > float(rng.uniform(0.2, 0.8))).astype(np.int32)

        lab = label_2d(mask)
        with _no_native():
            lab2 = label_2d(mask)
        assert np.array_equal(lab, lab2), seed
        # both agree with scipy's 8-connected labeling up to relabel
        _, n = cc_label(mask, structure=np.ones((3, 3), np.int8))
        assert len(np.unique(lab)) == n + 1, seed


def test_box_screen_fuzz():
    from empanada_tpu.core.boxes import overlapping_box_pairs

    for seed in range(20):
        rng = np.random.default_rng(300 + seed)
        n1, n2 = int(rng.integers(1, 40)), int(rng.integers(1, 40))

        def boxes(n):
            lo = rng.integers(0, 90, (n, 2))
            hi = lo + rng.integers(1, 30, (n, 2))
            return np.concatenate([lo, hi], 1).astype(np.int64)

        b1, b2 = boxes(n1), boxes(n2)
        pairs = overlapping_box_pairs(b1, b2)
        with _no_native():
            pairs2 = overlapping_box_pairs(b1, b2)
        assert np.array_equal(pairs, pairs2), seed


def test_watershed_fuzz():
    from empanada_tpu.stitch.watershed import bc_watershed

    for seed in range(6):
        rng = np.random.default_rng(400 + seed)
        field = gaussian_filter(rng.normal(0, 1, (10, 48, 48)), (1.5, 3, 3))
        field = (field - field.min()) / (np.ptp(field) + 1e-9)
        sem = (field * 255).astype(np.uint8)
        bdr = (np.abs(np.gradient(field)[1]) * 2000).clip(0, 255).astype(np.uint8)
        volume = np.stack([sem, bdr])

        seg = bc_watershed(volume, seed_thres=4, min_size=8)
        with _no_native():
            seg2 = bc_watershed(volume, seed_thres=4, min_size=8)
        assert np.array_equal(seg, seg2), seed


def test_host_stitch_pipeline_fuzz():
    """Full single-axis host pipeline (RLE extract -> forward/backward
    matching -> trackers -> fill): native and numpy paths must produce the
    same final instance volume."""
    from empanada_tpu.stitch.patterns import (
        apply_matchers, backward_matching, create_axis_trackers,
        create_matchers, fill_panoptic_volume, finish_tracking,
        update_trackers,
    )
    from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg

    def run(pan_slices, shape):
        d = shape[0]
        rle_stack = []
        matchers = create_matchers([1], 1000, 0.25, 0.25)
        for z in range(d):
            rle_seg = pan_seg_to_rle_seg(
                pan_slices[z], [1], 1000, [1], force_connected=True
            )
            rle_stack.append(apply_matchers(rle_seg, matchers))
        trackers = create_axis_trackers(["xy"], {1: "obj"}, 1000, shape)
        for z, rle_seg in backward_matching(rle_stack, matchers, d):
            update_trackers(rle_seg, z, trackers["xy"])
        finish_tracking(trackers["xy"])
        vol = np.zeros(shape, np.uint32)
        fill_panoptic_volume(vol, trackers["xy"])
        return vol

    for seed in range(3):
        rng = np.random.default_rng(500 + seed)
        shape = (10, 72, 72)
        field = gaussian_filter(rng.normal(0, 1, shape), (1.5, 4, 4))
        field /= field.std() + 1e-9
        lab, _ = cc_label(field > 0.7)
        pan = (lab > 0).astype(np.int32) * 1000 + lab.astype(np.int32)

        vol = run(pan, shape)
        with _no_native():
            vol2 = run(pan, shape)
        assert np.array_equal(vol, vol2), seed


def test_chunked_fill_fuzz(tmp_path):
    from empanada_tpu.core.chunked import ChunkedArray, chunked_fill_instances
    from empanada_tpu.core.rle import numpy_fill_instances

    for seed in range(5):
        rng = np.random.default_rng(600 + seed)
        shape = (9, 40, 40)
        size = int(np.prod(shape))
        instances = {}
        for inst_id in range(1, int(rng.integers(2, 8))):
            r = _rand_ranges(rng, n_max=20, size=size - 50)
            if len(r) == 0:
                continue
            instances[1000 + inst_id] = {
                "starts": r[:, 0], "runs": r[:, 1] - r[:, 0],
            }

        dense = numpy_fill_instances(np.zeros(shape, np.uint32), instances)

        def fill_chunked(tag):
            arr = ChunkedArray.create(
                str(tmp_path / f"s{seed}_{tag}.zarr"),
                shape=shape, chunks=(4, 16, 16), dtype=np.uint32,
            )
            chunked_fill_instances(arr, instances)
            return arr[:]

        got = fill_chunked("native")
        with _no_native():
            got2 = fill_chunked("numpy")
        assert np.array_equal(got, dense), seed
        assert np.array_equal(got2, dense), seed


def test_build_flat_fuzz():
    """Fused native build (filter + CC + group + canonicalize,
    csrc runs_build_flat / packed_build_flat) vs the numpy chain —
    identical FlatInstances fields required, including the packed-decode
    and overflow contracts used by the 3D drainer."""
    from empanada_tpu.core.labeling import (
        connected_components_runs,
        decode_runs_packed,
        extract_runs,
        runs_to_flat,
    )
    from empanada_tpu.stitch.rle_seg import packed_to_rle_seg

    if not native.available():
        pytest.skip("native lib unavailable")

    def numpy_ref(v, r, cs, ce, width, min_id, max_id, fc):
        sel = (v >= min_id) & (v < max_id)
        vv, rr, ss, ee = v[sel], r[sel], cs[sel], ce[sel]
        if fc and len(vv):
            vv = connected_components_runs(vv, rr, ss, ee, 8) + min_id
        return runs_to_flat(vv, rr, ss, ee, width)

    def check(got, ref, ctx):
        gl, gb, go, gs, gr = got
        assert np.array_equal(gl, ref.labels), ctx
        assert np.array_equal(gb, ref.boxes), ctx
        assert np.array_equal(go, ref.offsets), ctx
        assert np.array_equal(gs, ref.starts), ctx
        assert np.array_equal(gr, ref.runs), ctx

    for seed in range(40):
        rng = np.random.default_rng(700 + seed)
        h, w = int(rng.integers(4, 64)), int(rng.integers(4, 64))
        seg = np.where(
            rng.random((h, w)) < rng.uniform(0, 0.4),
            rng.integers(0, 3, (h, w)) * 1000 + rng.integers(1, 5, (h, w)),
            0,
        ).astype(np.int64)
        v, r, cs, ce = extract_runs(seg)
        for label in (1, 2):
            for fc in (False, True):
                lo, hi = label * 1000, (label + 1) * 1000
                got = native.runs_build_flat(v, r, cs, ce, w, lo, hi, fc)
                check(got, numpy_ref(v, r, cs, ce, w, lo, hi, fc),
                      (seed, label, fc))

    # packed variant incl. the overflow contract
    for seed in range(40):
        rng = np.random.default_rng(800 + seed)
        h, w, rcap = int(rng.integers(4, 40)), int(rng.integers(8, 64)), int(
            rng.integers(2, 9))
        buf = np.zeros((h, 2 * rcap + 1), np.int16)
        for y in range(h):
            k = int(rng.integers(0, rcap + 1))
            if rng.random() < 0.05:
                k = rcap + 1  # overflow marker: count beyond capacity
            kk = min(k, rcap)
            starts = np.sort(rng.choice(w, kk, replace=False))
            buf[y, :kk] = starts
            buf[y, rcap:rcap + kk] = rng.integers(0, 2200, kk)
            buf[y, -1] = k
        decoded = decode_runs_packed(buf, w)
        got = native.packed_build_flat(buf, w, 1000, 2000, True)
        if decoded is None:
            assert got == "overflow", seed
            assert packed_to_rle_seg(buf, w, [1], 1000, [1]) is None, seed
            continue
        ref = numpy_ref(*decoded, w, 1000, 2000, True)
        check(got, ref, seed)
        # dict-level wrapper agrees with the numpy fallback wrapper
        fast = packed_to_rle_seg(buf, w, [1], 1000, [1])
        with _no_native():
            slow = packed_to_rle_seg(buf, w, [1], 1000, [1])
        assert list(fast[1].keys()) == list(slow[1].keys()), seed
        for key in fast[1]:
            assert fast[1][key]["box"] == tuple(slow[1][key]["box"]), seed
            assert np.array_equal(fast[1][key]["starts"],
                                  slow[1][key]["starts"]), seed
            assert np.array_equal(fast[1][key]["runs"],
                                  slow[1][key]["runs"]), seed


def test_match_flat_core_fuzz():
    """Native matcher core (csrc match_flat_core + python spill solve) vs
    the pure-numpy edge path: byte-identical FlatInstances output across
    random blob slice pairs and threshold settings — box screen order,
    tie-breaks, float division order and the Hungarian spill must all
    agree exactly."""
    import empanada_tpu.stitch.matcher as M
    from empanada_tpu.core.labeling import FlatInstances
    from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)

    def rand_flat(seed, n_blobs, h=48, w=48, label0=1001):
        r = np.random.default_rng(seed)
        seg = np.zeros((h, w), np.int64)
        for i in range(n_blobs):
            cy, cx = r.integers(4, h - 4), r.integers(4, w - 4)
            ry, rx = r.integers(2, 8), r.integers(2, 8)
            yy, xx = np.ogrid[:h, :w]
            seg[((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1] = label0 + i
        d = pan_seg_to_rle_seg(seg, [1], 1000, [1], force_connected=True)[1]
        return FlatInstances.from_dict(d)

    for trial in range(60):
        tf = rand_flat(trial * 2, int(rng.integers(0, 12)))
        mf = rand_flat(trial * 2 + 1, int(rng.integers(0, 12)))
        for thr_i, thr_a in ((0.25, 0.25), (0.05, 0.5)):
            outs = []
            for force_numpy in (False, True):
                m = M.RLEMatcher(1, 1000, merge_iou_thr=thr_i,
                                 merge_ioa_thr=thr_a)
                m.initialize_target_flat(tf)
                old = M._CORE_MAX_PAIRS
                if force_numpy:
                    M._CORE_MAX_PAIRS = -1
                try:
                    outs.append(m.match_flat(mf, update_target=False))
                finally:
                    M._CORE_MAX_PAIRS = old
            a, b = outs
            assert np.array_equal(a.labels, b.labels), trial
            assert np.array_equal(a.boxes, b.boxes), trial
            assert np.array_equal(a.offsets, b.offsets), trial
            assert np.array_equal(a.starts, b.starts), trial
            assert np.array_equal(a.runs, b.runs), trial


def test_match_sweep_fuzz():
    """Native whole-sweep matcher (csrc match_sweep: build + forward +
    backward in one call) vs the Python patterns.py loops: byte-identical
    per-slice backward results on random blob stacks packed the way the
    device ships them (ops.postprocess.encode_runs_packed layout)."""
    from empanada_tpu.stitch.patterns import (apply_matchers_flat,
                                              backward_matching,
                                              build_flat_seg,
                                              create_matchers)

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    h = w = 48
    for trial in range(6):
        n_slices = int(rng.integers(3, 9))
        rows = np.zeros((n_slices, h, 2 * 16 + 1), np.int16)
        for s in range(n_slices):
            seg = np.zeros((h, w), np.int64)
            for i in range(int(rng.integers(0, 7))):
                cy, cx = rng.integers(4, h - 4), rng.integers(4, w - 4)
                ry, rx = rng.integers(2, 7), rng.integers(2, 7)
                yy, xx = np.ogrid[:h, :w]
                m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
                seg[m] = 1001 + i
            # pack rows like encode_runs_packed: [starts(R) | values | count]
            for y in range(h):
                b = np.flatnonzero(np.concatenate(
                    [[True], seg[y][1:] != seg[y][:-1]]))
                cnt = len(b)
                assert cnt <= 16
                rows[s, y, :cnt] = b
                rows[s, y, 16:16 + cnt] = seg[y][b]
                rows[s, y, -1] = cnt
        # python reference
        matchers = create_matchers((1,), 1000, 0.25, 0.25)
        stack = []
        for s in range(n_slices):
            fseg = build_flat_seg(("packed", rows[s], w), [1], 1000, (1,),
                                  True)
            stack.append(apply_matchers_flat(fseg, matchers))
        ref = {}
        for idx, fseg in backward_matching(stack, matchers, n_slices):
            f = fseg[1]
            ref[idx] = (f.labels, f.boxes, f.offsets, f.starts, f.runs)
        res = native.match_sweep(rows, w, 1000, 2000, True, 0.25, 0.25, 1001)
        assert isinstance(res, list)
        for idx in range(n_slices):
            for i in range(5):
                assert np.array_equal(ref[idx][i], res[idx][i]), (trial, idx, i)
