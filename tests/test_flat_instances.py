"""FlatInstances / RleDict acceleration-cache semantics.

The host stitching hot path carries a struct-of-arrays form of each slice's
instance dict (core/labeling.py:FlatInstances) alongside the reference wire
format ({label: {box, starts, runs}}, empanada/inference/rle.py).  These
tests pin the invariants that make the cache safe: exact dict<->flat
equivalence, staleness detection on mutation, and identical results through
the matcher/tracker whether or not the flat form is present.
"""

import numpy as np
import pytest

from empanada_tpu.core.labeling import (
    FlatInstances,
    RleDict,
    extract_runs,
    flat_matches_dict,
    runs_to_flat,
    runs_to_regions,
)
from empanada_tpu.stitch.matcher import RLEMatcher, rle_matcher
from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg
from empanada_tpu.stitch.tracker import InstanceTracker


def _blob_slice(seed: int, shape=(64, 64), n_blobs: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    seg = np.zeros(shape, dtype=np.int32)
    for i in range(1, n_blobs + 1):
        cy, cx = rng.integers(8, shape[0] - 8), rng.integers(8, shape[1] - 8)
        r = int(rng.integers(3, 9))
        yy, xx = np.ogrid[: shape[0], : shape[1]]
        seg[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1000 + i
    return seg


def _strip_flat(d: dict) -> dict:
    """Plain-dict deep copy (no _flat attachment, fresh arrays)."""
    return {
        label: {
            "box": tuple(attrs["box"]),
            "starts": np.array(attrs["starts"]),
            "runs": np.array(attrs["runs"]),
        }
        for label, attrs in d.items()
    }


def test_runs_to_regions_attaches_valid_flat():
    seg = _blob_slice(0)
    regions = runs_to_regions(*extract_runs(seg), width=seg.shape[1])
    assert isinstance(regions, RleDict)
    flat = regions._flat
    assert flat is not None and flat_matches_dict(flat, regions)
    # dict views and flat arrays carry identical data
    off = flat.offsets
    for k, (label, attrs) in enumerate(regions.items()):
        assert label == int(flat.labels[k])
        assert attrs["box"] == tuple(int(x) for x in flat.boxes[k])
        np.testing.assert_array_equal(attrs["starts"], flat.starts[off[k] : off[k + 1]])
        np.testing.assert_array_equal(attrs["runs"], flat.runs[off[k] : off[k + 1]])


def test_from_dict_to_dict_roundtrip():
    seg = _blob_slice(1)
    regions = runs_to_regions(*extract_runs(seg), width=seg.shape[1])
    flat = FlatInstances.from_dict(_strip_flat(regions))
    rebuilt = flat.to_dict()
    assert list(rebuilt.keys()) == list(regions.keys())
    for label in regions:
        assert rebuilt[label]["box"] == regions[label]["box"]
        np.testing.assert_array_equal(rebuilt[label]["starts"], regions[label]["starts"])
        np.testing.assert_array_equal(rebuilt[label]["runs"], regions[label]["runs"])


def test_areas_match_run_sums():
    seg = _blob_slice(2)
    regions = runs_to_regions(*extract_runs(seg), width=seg.shape[1])
    flat = regions._flat
    expect = np.array([int(np.sum(a["runs"])) for a in regions.values()])
    np.testing.assert_array_equal(flat.areas, expect)
    # and the areas agree with the dense pixel counts
    for label, area in zip(regions, flat.areas):
        assert int((seg == label).sum()) == int(area)


def test_stale_flat_is_rejected_on_mutation():
    seg = _blob_slice(3)
    regions = runs_to_regions(*extract_runs(seg), width=seg.shape[1])
    flat = regions._flat
    first = next(iter(regions))
    del regions[first]
    assert not flat_matches_dict(flat, regions)
    # from_dict must rebuild from the mutated dict, not the stale cache
    rebuilt = FlatInstances.from_dict(regions)
    assert len(rebuilt) == len(regions)
    assert first not in set(rebuilt.labels.tolist())


def test_rle_matcher_same_with_and_without_flat():
    a = pan_seg_to_rle_seg(_blob_slice(4), [1], 1000, [1])[1]
    b = pan_seg_to_rle_seg(_blob_slice(5), [1], 1000, [1])[1]
    got = rle_matcher(a, b, 0.25, return_ioa=True)
    ref = rle_matcher(_strip_flat(a), _strip_flat(b), 0.25, return_ioa=True)
    np.testing.assert_array_equal(got[0][0], ref[0][0])
    np.testing.assert_array_equal(got[0][1], ref[0][1])
    np.testing.assert_allclose(got[2], ref[2])
    np.testing.assert_allclose(got[3], ref[3])  # ioa matrix


def test_stateful_matcher_same_with_and_without_flat():
    slices = [pan_seg_to_rle_seg(_blob_slice(s, n_blobs=7), [1], 1000, [1])[1]
              for s in range(6)]

    def run(strip):
        m = RLEMatcher(1, 1000, 0.25, 0.25)
        outs = []
        for rs in slices:
            rs = _strip_flat(rs) if strip else rs
            if m.target_rle is None:
                m.initialize_target(rs)
                outs.append(rs)
            else:
                outs.append(m(rs))
        return outs

    fast, slow = run(False), run(True)
    for f, s in zip(fast, slow):
        assert sorted(map(int, f)) == sorted(map(int, s))
        for label in f:
            np.testing.assert_array_equal(f[label]["starts"], s[label]["starts"])
            np.testing.assert_array_equal(f[label]["runs"], s[label]["runs"])
            assert tuple(f[label]["box"]) == tuple(s[label]["box"])


@pytest.mark.parametrize("axis", ["xy", "xz", "yz"])
def test_tracker_update_same_with_and_without_flat(axis):
    shape3d = (64, 64, 64)  # every axis's 2D slice is (64, 64)
    slices = [pan_seg_to_rle_seg(_blob_slice(s), [1], 1000, [1])[1] for s in range(4)]

    def run(strip):
        tr = InstanceTracker(1, 1000, shape3d, axis)
        for z, rs in enumerate(slices):
            tr.update(_strip_flat(rs) if strip else rs, z)
        tr.finish()
        return tr

    fast, slow = run(False), run(True)
    assert sorted(map(int, fast.instances)) == sorted(map(int, slow.instances))
    for label in fast.instances:
        f, s = fast.instances[label], slow.instances[label]
        assert tuple(f["box"]) == tuple(s["box"])
        np.testing.assert_array_equal(f["starts"], s["starts"])
        np.testing.assert_array_equal(f["runs"], s["runs"])


def test_native_extract_runs_matches_numpy_fallback():
    pytest.importorskip("empanada_tpu.core.native")
    from empanada_tpu.core import native

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)
    for dtype in (np.int32, np.int64, np.uint32):
        for shape in [(7, 5), (64, 64), (1, 1), (3, 128)]:
            seg = rng.integers(0, 5, shape).astype(dtype)
            h, w = seg.shape
            flat = seg.reshape(-1)
            change = np.empty(flat.size, dtype=bool)
            change[0] = True
            np.not_equal(flat[1:], flat[:-1], out=change[1:])
            change[::w] = True
            si = np.flatnonzero(change)
            ei = np.concatenate([si[1:], [flat.size]])
            vals = flat[si]
            keep = vals != 0
            si, ei, vals = si[keep], ei[keep], vals[keep].astype(np.int64)
            rows = si // w
            got = native.extract_runs(seg)
            np.testing.assert_array_equal(got[0], vals)
            np.testing.assert_array_equal(got[1], rows.astype(np.int64))
            np.testing.assert_array_equal(got[2], si - rows * w)
            np.testing.assert_array_equal(got[3], ei - rows * w)


def test_coverage_ranges_native_matches_numpy_sweep():
    from empanada_tpu.core import native
    import empanada_tpu.core.ranges as R

    if not native.available():
        pytest.skip("native library unavailable")

    def numpy_cov(list_of_ranges, mc):
        ranges = R.concat_sort_ranges(list_of_ranges)
        if len(ranges) == 0:
            return np.empty((0, 2), np.int64)
        points = np.concatenate([ranges[:, 0], ranges[:, 1]])
        deltas = np.concatenate(
            [np.ones(len(ranges), np.int64), -np.ones(len(ranges), np.int64)]
        )
        order = np.argsort(points, kind="stable")
        points, deltas = points[order], deltas[order]
        up, fi = np.unique(points, return_index=True)
        cov = np.cumsum(np.add.reduceat(deltas, fi))
        ok = cov[:-1] >= mc
        if not ok.any():
            return np.empty((0, 2), np.int64)
        return R._merge_touching(up[:-1][ok], up[1:][ok], True)

    rng = np.random.default_rng(11)
    for trial in range(100):
        # alternate sorted-disjoint sets (k-way merge route) with
        # shuffled/overlapping sets (native sort-sweep fallback route)
        sorted_sets = trial % 2 == 0
        lists = []
        for _ in range(int(rng.integers(1, 5))):
            n = int(rng.integers(0, 25))
            s = np.sort(rng.integers(0, 300, n))
            e = s + rng.integers(1, 15, n)
            if sorted_sets and n > 1:
                e[:-1] = np.minimum(e[:-1], s[1:])
                keep = e > s
                s, e = s[keep], e[keep]
            arr = np.stack([s, e], 1)
            if not sorted_sets and len(arr) > 1:
                arr = arr[rng.permutation(len(arr))]
            lists.append(arr)
        for mc in (1, 2, 3):
            np.testing.assert_array_equal(
                R.coverage_ranges(lists, mc), numpy_cov(lists, mc)
            )
