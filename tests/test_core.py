"""Unit tests for the L0 core array/RLE layer.

Scenario values mirror the reference's exact-value unit tests
(/root/reference/tests/test_array_utils.py, test_zarr_utils.py) on the
sorted-input paths.  Where the reference kernels have buggy behavior on
unsorted/overlapping inputs (negative-index aliasing in numba
``extend_range``; ``invert_ranges`` emitting reversed ranges), we assert the
corrected semantics and note the divergence.
"""

import numpy as np
import pytest

from empanada_tpu.core import (
    box_iou,
    coverage_ranges,
    intersection_from_ranges,
    invert_ranges,
    join_ranges,
    label_2d,
    merge_rles,
    numpy_fill_instances,
    rle_decode,
    rle_encode,
    rle_iou,
    rle_to_string,
    rle_voting,
    string_to_rle,
    vote_by_ranges,
)
from empanada_tpu.core.labeling import extract_runs, runs_to_regions, connected_components_runs


class TestBoxIoU:
    def test_overlapping(self):
        iou = box_iou(np.array([[0, 0, 20, 20]]), np.array([[5, 5, 25, 25]]))
        assert iou.shape == (1, 1)
        assert iou[0, 0] == pytest.approx(225 / (400 + 400 - 225), abs=0.02)

    def test_non_overlapping(self):
        iou = box_iou(np.array([[0, 0, 20, 20]]), np.array([[30, 0, 50, 20]]))
        assert iou.nnz == 0

    def test_3d(self):
        iou = box_iou(np.array([[0, 0, 0, 2, 2, 2]]), np.array([[1, 1, 1, 3, 3, 3]]))
        assert iou[0, 0] == pytest.approx(1 / 15)


class TestRanges:
    def test_intersection(self):
        # [0,10) vs [7,20) overlap = 3
        assert intersection_from_ranges([[0, 10]], [[7, 20]]) == 3
        assert intersection_from_ranges([[0, 10]], [[10, 20]]) == 0

    def test_join_overlapping(self):
        assert join_ranges([np.array([[0, 10], [6, 10]])]).tolist() == [[0, 10]]

    def test_join_non_overlapping(self):
        assert join_ranges([np.array([[0, 10], [11, 20]])]).tolist() == [[0, 10], [11, 20]]

    def test_join_border(self):
        assert join_ranges([np.array([[0, 10], [10, 20]])]).tolist() == [[0, 20]]

    def test_invert(self):
        # disjoint sorted input (the only valid input shape)
        out = invert_ranges(np.array([[2, 6], [8, 12]]), 15)
        assert out.tolist() == [[0, 2], [6, 8], [12, 15]]
        assert invert_ranges(np.empty((0, 2), dtype=np.int64), 5).tolist() == [[0, 5]]

    def test_rle_voting_sorted(self):
        # sorted input: [7,26) and [10,20) -> coverage >= 2 on [10,20)
        out = rle_voting(np.array([[7, 26], [10, 20]]), vote_thr=2)
        assert out.tolist() == [[10, 20]]

    def test_vote_by_ranges_three_way(self):
        a = np.array([[0, 10]])
        b = np.array([[5, 15]])
        c = np.array([[8, 20]])
        out = vote_by_ranges([a, b, c], vote_thr=2)
        assert out.tolist() == [[5, 15]]
        out3 = vote_by_ranges([a, b, c], vote_thr=3)
        assert out3.tolist() == [[8, 10]]

    def test_vote_thr_one_is_union(self):
        out = vote_by_ranges([np.array([[0, 5]]), np.array([[5, 8]])], vote_thr=1)
        assert out.tolist() == [[0, 8]]

    def test_too_few_voters(self):
        assert len(vote_by_ranges([np.array([[0, 5]])], vote_thr=2)) == 0

    def test_coverage_merges_adjacent(self):
        out = coverage_ranges([np.array([[0, 10], [10, 20]]), np.array([[0, 20]])], 2)
        assert out.tolist() == [[0, 20]]


class TestRLE:
    def test_encode_decode_roundtrip(self):
        idx = np.array([0, 1, 2, 7, 8, 20])
        starts, runs = rle_encode(idx)
        assert starts.tolist() == [0, 7, 20]
        assert runs.tolist() == [3, 2, 1]
        assert rle_decode(starts, runs).tolist() == idx.tolist()

    def test_string_roundtrip(self):
        starts = np.array([3, 10])
        runs = np.array([4, 2])
        s = rle_to_string(starts, runs)
        s2, r2 = string_to_rle(s)
        assert s2.tolist() == starts.tolist() and r2.tolist() == runs.tolist()

    def test_merge_rles(self):
        starts, runs = merge_rles(
            np.array([0, 10]), np.array([5, 5]), np.array([3, 20]), np.array([4, 2])
        )
        assert starts.tolist() == [0, 10, 20]
        assert runs.tolist() == [7, 5, 2]

    def test_rle_iou(self):
        iou, inter = rle_iou(
            np.array([0]), np.array([10]), np.array([5]), np.array([10]),
            return_intersection=True,
        )
        assert inter == 5
        assert iou == pytest.approx(5 / 15)

    def test_fill_instances(self):
        vol = np.zeros((2, 3, 3), dtype=np.int64)
        instances = {7: {"starts": np.array([2, 10]), "runs": np.array([3, 2])}}
        numpy_fill_instances(vol, instances)
        flat = vol.reshape(-1)
        assert flat[2:5].tolist() == [7, 7, 7]
        assert flat[10:12].tolist() == [7, 7]
        assert flat[:2].sum() == 0


class TestLabeling:
    def test_extract_runs(self):
        seg = np.array([[0, 1, 1, 0], [2, 2, 0, 1]])
        values, rows, cs, ce = extract_runs(seg)
        assert values.tolist() == [1, 2, 1]
        assert rows.tolist() == [0, 1, 1]
        assert cs.tolist() == [1, 0, 3]
        assert ce.tolist() == [3, 2, 4]

    def test_cc_8_vs_4(self):
        # diagonal touch
        seg = np.array([[1, 0], [0, 1]])
        v, r, cs, ce = extract_runs(seg)
        comp8 = connected_components_runs(v, r, cs, ce, connectivity=8)
        comp4 = connected_components_runs(v, r, cs, ce, connectivity=4)
        assert comp8[0] == comp8[1]
        assert comp4[0] != comp4[1]

    def test_cc_value_split(self):
        # touching runs with different values never merge
        seg = np.array([[1, 2], [1, 2]])
        v, r, cs, ce = extract_runs(seg)
        comp = connected_components_runs(v, r, cs, ce, connectivity=8)
        assert comp.tolist() == [1, 2, 1, 2]

    def test_label_2d(self):
        seg = np.array(
            [
                [5, 5, 0, 5],
                [0, 0, 0, 5],
                [7, 0, 0, 0],
            ]
        )
        out = label_2d(seg)
        # first component (the 5s top-left), second (5s right col), third (7)
        assert out[0, 0] == out[0, 1] == 1
        assert out[0, 3] == out[1, 3] == 2
        assert out[2, 0] == 3

    def test_runs_to_regions_rle_canonical(self):
        # instance spanning full width -> one flat run across rows
        seg = np.full((2, 4), 9, dtype=np.int64)
        v, r, cs, ce = extract_runs(seg)
        regions = runs_to_regions(v, r, cs, ce, width=4)
        assert regions[9]["starts"].tolist() == [0]
        assert regions[9]["runs"].tolist() == [8]
        assert regions[9]["box"] == (0, 0, 2, 4)


class TestNativeParity:
    """The C++ kernels must agree with the numpy fallbacks."""

    def test_cc_parity(self, rng):
        from empanada_tpu.core import native
        from empanada_tpu.core.labeling import _connected_components_runs_py

        if not native.available():
            pytest.skip("native library not built")
        seg = (rng.random((64, 64)) > 0.6).astype(np.int64) * rng.integers(
            1, 4, (64, 64)
        )
        v, r, cs, ce = extract_runs(seg)
        got = native.connected_components_runs(v, r, cs, ce, 8)
        want = _connected_components_runs_py(v, r, cs, ce, 8)
        assert got.tolist() == want.tolist()

    def test_vote_parity(self, rng):
        from empanada_tpu.core import native

        if not native.available():
            pytest.skip("native library not built")
        starts = np.sort(rng.integers(0, 1000, 50))
        ends = starts + rng.integers(1, 40, 50)
        ranges = np.stack([starts, ends], axis=1)
        got = native.vote_ranges(ranges, 2)
        want = coverage_ranges([ranges], 2)
        assert got.tolist() == want.tolist()

    def test_chunk_split(self):
        from empanada_tpu.core import native

        if not native.available():
            pytest.skip("native library not built")
        # mirrors reference tests/test_zarr_utils.py::test_chunk_ranges
        out = native.chunk_split_ranges(np.array([[0, 20], [15, 35]]), 7, 6)
        assert out.tolist() == [
            [0, 6], [6, 7], [7, 13], [13, 14], [14, 20],
            [15, 20], [20, 21], [21, 27], [27, 28], [28, 34], [34, 35],
        ]


def test_overlapping_box_pairs_matches_box_iou_nonzero():
    from empanada_tpu.core import box_iou, overlapping_box_pairs

    rng = np.random.default_rng(11)
    for ndim in (2, 3):
        lo = rng.integers(0, 100, size=(73, ndim))
        ext = rng.integers(0, 12, size=(73, ndim))  # includes degenerate boxes
        boxes1 = np.concatenate([lo, lo + ext], axis=1)
        lo2 = rng.integers(0, 100, size=(61, ndim))
        ext2 = rng.integers(0, 12, size=(61, ndim))
        boxes2 = np.concatenate([lo2, lo2 + ext2], axis=1)

        ref = set(map(tuple, np.array(box_iou(boxes1, boxes2).nonzero()).T))
        got = set(map(tuple, overlapping_box_pairs(boxes1, boxes2, chunk=16)))
        assert got == ref


def test_native_box_overlap_pairs_matches_numpy_sweep():
    """The C++ sweep-line screen is exactly box_iou(...).nonzero() — every
    ordered pair incl. the diagonal, lexicographic order, degenerate boxes
    excluded (csrc/core_kernels.cpp box_overlap_pairs)."""
    from empanada_tpu.core import box_intersection
    from empanada_tpu.core import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for nd in (2, 3):
        for _ in range(3):
            n, m = rng.integers(1, 200, 2)
            lo1 = rng.integers(0, 150, (n, nd))
            ext1 = rng.integers(0, 25, (n, nd))  # some zero-extent boxes
            lo2 = rng.integers(0, 150, (m, nd))
            ext2 = rng.integers(0, 25, (m, nd))
            b1 = np.concatenate([lo1, lo1 + ext1], 1).astype(np.int64)
            b2 = np.concatenate([lo2, lo2 + ext2], 1).astype(np.int64)

            def dense(a, b):
                r, c = np.nonzero(box_intersection(a, b) > 0)
                return np.stack([r, c], axis=1)

            assert np.array_equal(native.box_overlap_pairs(b1, b2), dense(b1, b2))
            assert np.array_equal(native.box_overlap_pairs(b1), dense(b1, b1))


def test_overlapping_box_pairs_native_dispatch_above_threshold():
    from empanada_tpu.core import native
    from empanada_tpu.core.boxes import overlapping_box_pairs

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(8)
    lo = rng.integers(0, 500, (300, 3))
    b = np.concatenate([lo, lo + rng.integers(1, 40, (300, 3))], 1).astype(np.int64)
    got = overlapping_box_pairs(b)          # 300*300 > threshold -> native
    want = overlapping_box_pairs(b.astype(np.float64))  # float -> numpy path
    assert np.array_equal(got, want)
