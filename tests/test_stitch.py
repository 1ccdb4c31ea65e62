"""Stitching-layer tests: RLE codec roundtrips, cross-slice matching,
axis-consistent 3D tracking, ortho consensus, tiling, watershed."""

import numpy as np
import pytest

from empanada_tpu.core import rle_decode
from empanada_tpu.stitch import (
    InstanceTracker,
    RLEMatcher,
    Tiler,
    bc_watershed,
    merge_objects_from_tiles,
    merge_objects_from_trackers,
    merge_semantic_from_trackers,
    pan_seg_to_rle_seg,
    rle_seg_to_pan_seg,
)
from empanada_tpu.stitch.patterns import (
    MatcherWorker,
    backward_matching,
    create_matchers,
    update_trackers,
    finish_tracking,
    apply_filters,
)


def make_blob_volume(shape=(24, 32, 40)):
    """Two ellipsoid instances in a 3D volume, panoptic ids 1001/1002."""
    d, h, w = shape
    zz, yy, xx = np.mgrid[0:d, 0:h, 0:w]
    vol = np.zeros(shape, dtype=np.int64)
    vol[((zz - 8) ** 2 / 25 + (yy - 10) ** 2 / 36 + (xx - 12) ** 2 / 49) <= 1] = 1001
    vol[((zz - 16) ** 2 / 16 + (yy - 22) ** 2 / 25 + (xx - 30) ** 2 / 36) <= 1] = 1002
    return vol


class TestRLESegCodec:
    def test_roundtrip(self):
        pan = np.zeros((20, 20), dtype=np.int64)
        pan[2:8, 2:8] = 1001
        pan[12:18, 12:18] = 1002
        rle_seg = pan_seg_to_rle_seg(pan, [1], 1000, [1], force_connected=False)
        back = rle_seg_to_pan_seg(rle_seg, (20, 20))
        assert np.array_equal(back, pan)

    def test_force_connected_splits(self):
        pan = np.zeros((20, 20), dtype=np.int64)
        # one label, two disconnected fragments -> two instances
        pan[2:5, 2:5] = 1001
        pan[10:13, 10:13] = 1001
        rle_seg = pan_seg_to_rle_seg(pan, [1], 1000, [1], force_connected=True)
        assert len(rle_seg[1]) == 2
        assert set(rle_seg[1]) == {1001, 1002}

    def test_stuff_class_not_relabeled(self):
        pan = np.zeros((10, 10), dtype=np.int64)
        pan[0:2, 0:2] = 2000
        pan[8:10, 8:10] = 2000
        rle_seg = pan_seg_to_rle_seg(pan, [2], 1000, [1], force_connected=True)
        assert list(rle_seg[2]) == [2000]


class TestRLEMatcher:
    def test_forward_matching_inherits_label(self):
        a = np.zeros((16, 16), dtype=np.int64)
        a[4:10, 4:10] = 1001
        b = np.zeros_like(a)
        b[5:11, 5:11] = 1003  # same object, shifted, different label
        rle_a = pan_seg_to_rle_seg(a, [1], 1000, [1])
        rle_b = pan_seg_to_rle_seg(b, [1], 1000, [1])

        matcher = RLEMatcher(1, 1000, merge_iou_thr=0.25, merge_ioa_thr=0.25)
        matcher.initialize_target(rle_a[1])
        matched = matcher(rle_b[1])
        assert list(matched) == [1001]

    def test_unmatched_gets_new_label(self):
        a = np.zeros((16, 16), dtype=np.int64)
        a[0:4, 0:4] = 1001
        b = np.zeros_like(a)
        b[10:14, 10:14] = 1001  # disjoint -> new label
        rle_a = pan_seg_to_rle_seg(a, [1], 1000, [1])
        rle_b = pan_seg_to_rle_seg(b, [1], 1000, [1])

        matcher = RLEMatcher(1, 1000)
        matcher.initialize_target(rle_a[1])
        matched = matcher(rle_b[1])
        assert list(matched) == [1002]

    def test_false_split_absorbed(self):
        a = np.zeros((16, 16), dtype=np.int64)
        a[2:14, 2:14] = 1001  # big target
        b = np.zeros_like(a)
        b[2:7, 2:14] = 1001  # top half
        b[8:14, 2:14] = 1002  # bottom half (split)
        rle_a = pan_seg_to_rle_seg(a, [1], 1000, [1])
        rle_b = pan_seg_to_rle_seg(b, [1], 1000, [1])

        matcher = RLEMatcher(1, 1000, merge_iou_thr=0.4, merge_ioa_thr=0.25)
        matcher.initialize_target(rle_a[1])
        matched = matcher(rle_b[1])
        # both halves IoA vs the target ~1.0 -> absorbed into 1001
        assert list(matched) == [1001]


class TestTrackerAxes:
    @pytest.mark.parametrize("axis,axis_num", [("xy", 0), ("xz", 1), ("yz", 2)])
    def test_axis_consistency(self, axis, axis_num):
        """Tracking the same volume along any axis yields identical voxels."""
        vol = make_blob_volume()
        tracker = InstanceTracker(1, 1000, vol.shape, axis)
        for idx in range(vol.shape[axis_num]):
            sl = np.take(vol, idx, axis=axis_num)
            rle_seg = pan_seg_to_rle_seg(sl, [1], 1000, [1], force_connected=False)
            tracker.update(rle_seg[1], idx)
        tracker.finish()

        for label, attrs in tracker.instances.items():
            got = set(rle_decode(attrs["starts"], attrs["runs"]).tolist())
            want = set(np.flatnonzero(vol.reshape(-1) == label).tolist())
            assert got == want, f"axis {axis} label {label}"
            # 3D box check
            zz, yy, xx = np.where(vol == label)
            assert attrs["box"] == (
                zz.min(), yy.min(), xx.min(), zz.max() + 1, yy.max() + 1, xx.max() + 1,
            )

    def test_json_roundtrip(self, tmp_path):
        vol = make_blob_volume()
        tracker = InstanceTracker(1, 1000, vol.shape, "xy")
        for idx in range(vol.shape[0]):
            rle_seg = pan_seg_to_rle_seg(vol[idx], [1], 1000, [1], force_connected=False)
            tracker.update(rle_seg[1], idx)
        tracker.finish()
        p = str(tmp_path / "tracker.json")
        tracker.write_to_json(p)
        loaded = InstanceTracker()
        loaded.load_from_json(p)
        assert set(loaded.instances) == set(tracker.instances)
        for k in tracker.instances:
            assert np.array_equal(loaded.instances[k]["starts"], tracker.instances[k]["starts"])


class TestForwardBackward:
    def test_full_stack_pipeline(self):
        """Forward+backward matching assigns consistent 3D labels."""
        vol = make_blob_volume()
        matchers = create_matchers([1], 1000, 0.25, 0.25)
        worker = MatcherWorker(matchers, [1], 1000, [1])
        for idx in range(vol.shape[0]):
            # per-slice "prediction": same labels everywhere
            pred = np.where(vol[idx] > 0, 1001, 0)
            worker.put(pred)
        rle_stack = worker.finish()
        assert len(rle_stack) == vol.shape[0]

        tracker = InstanceTracker(1, 1000, vol.shape, "xy")
        for rev_idx, rle_seg in backward_matching(rle_stack, matchers, vol.shape[0]):
            update_trackers(rle_seg, rev_idx, [tracker])
        finish_tracking([tracker])

        # two 3D instances with full voxel sets
        assert len(tracker.instances) == 2
        total = sum(int(np.sum(a["runs"])) for a in tracker.instances.values())
        assert total == int((vol > 0).sum())


class TestConsensus:
    def test_ortho_consensus_recovers_instances(self):
        vol = make_blob_volume()
        trackers = []
        for axis, axis_num in [("xy", 0), ("xz", 1), ("yz", 2)]:
            tracker = InstanceTracker(1, 1000, vol.shape, axis)
            for idx in range(vol.shape[axis_num]):
                sl = np.take(vol, idx, axis=axis_num)
                rle_seg = pan_seg_to_rle_seg(sl, [1], 1000, [1], force_connected=False)
                tracker.update(rle_seg[1], idx)
            tracker.finish()
            trackers.append(tracker)

        instances = merge_objects_from_trackers(trackers, pixel_vote_thr=2, cluster_iou_thr=0.75)
        assert len(instances) == 2
        total = sum(int(np.sum(a["runs"])) for a in instances.values())
        assert total == int((vol > 0).sum())

    def test_semantic_consensus(self):
        vol = (make_blob_volume() > 0).astype(np.int64) * 1000  # semantic class 1
        trackers = []
        for axis, axis_num in [("xy", 0), ("xz", 1), ("yz", 2)]:
            tracker = InstanceTracker(1, 1000, vol.shape, axis)
            for idx in range(vol.shape[axis_num]):
                sl = np.take(vol, idx, axis=axis_num)
                rle_seg = pan_seg_to_rle_seg(sl, [1], 1000, [1], force_connected=False)
                tracker.update(rle_seg[1], idx)
            tracker.finish()
            trackers.append(tracker)
        out = merge_semantic_from_trackers(trackers, pixel_vote_thr=2)
        assert list(out) == [1]
        assert int(np.sum(out[1]["runs"])) == int((vol > 0).sum())


class TestTiler:
    def test_geometry(self):
        tiler = Tiler((100, 150), tile_size=64, overlap_width=16)
        # every pixel covered
        cover = np.zeros((100, 150), dtype=int)
        for i in range(len(tiler)):
            y0, y1 = tiler.yranges[i]
            x0, x1 = tiler.xranges[i]
            assert y1 - y0 == 64 and x1 - x0 == 64
            cover[y0:y1, x0:x1] += 1
        assert (cover >= 1).all()
        # overlap mask matches multi-coverage
        assert np.array_equal(tiler.overlap_mask() > 0, cover > 1)

    def test_tile_merge_reconstructs(self):
        pan = np.zeros((100, 120), dtype=np.int64)
        pan[10:40, 10:50] = 1001
        pan[60:90, 70:110] = 1001  # same label, disconnected
        tiler = Tiler(pan.shape, tile_size=64, overlap_width=16)

        tiles = []
        for i in range(len(tiler)):
            tile_seg = pan_seg_to_rle_seg(tiler(pan, i), [1], 1000, [1])
            tile_seg = tiler.translate_rle_seg({1: tile_seg[1]}, i)
            tiles.append(tile_seg[1])

        merged = merge_objects_from_tiles(tiles, overlap_rle=tiler.overlap_rle)
        assert len(merged) == 2
        out = rle_seg_to_pan_seg({1: merged}, pan.shape)
        assert np.array_equal(out > 0, pan > 0)


class TestWatershed:
    def test_two_cells_split_by_boundary(self):
        sem = np.zeros((1, 30, 30), dtype=np.uint8)
        sem[0, 5:25, 5:25] = 255
        bnd = np.zeros_like(sem)
        bnd[0, 5:25, 14:16] = 255  # wall splitting the square
        volume = np.stack([sem, bnd], axis=0)  # (2, Z, Y, X)
        seg = bc_watershed(volume, seed_thres=4, min_size=8, label_divisor=1000)
        labels = np.unique(seg)
        assert len(labels[labels > 0]) == 2
        # left/right halves have different labels
        assert seg[0, 10, 8] != seg[0, 10, 22]
        assert seg.max() > 1000  # label_divisor offset applied


class TestFilters:
    def test_small_and_pancake(self):
        vol = make_blob_volume()
        tracker = InstanceTracker(1, 1000, vol.shape, "xy")
        for idx in range(vol.shape[0]):
            rle_seg = pan_seg_to_rle_seg(vol[idx], [1], 1000, [1], force_connected=False)
            tracker.update(rle_seg[1], idx)
        tracker.finish()

        apply_filters(tracker, [{"name": "remove_small_objects", "min_size": 10**6}])
        assert len(tracker.instances) == 0

    def test_fill_holes_preserves_nested_instance(self):
        """An instance living inside another instance's hole must survive
        hole filling; only background hole pixels are claimed (the
        reference clobbers bbox neighbors — PARITY.md divergence 6)."""
        from empanada_tpu.stitch.filters import fill_holes_in_segmentation

        vol = np.zeros((1, 24, 24), np.int64)
        vol[0, 2:20, 2:20] = 1001            # ring with a big hole
        vol[0, 6:16, 6:16] = 0               # the hole
        vol[0, 9:13, 9:13] = 1002            # nested instance inside the hole
        tracker = InstanceTracker(1, 1000, vol.shape, "xy")
        rle_seg = pan_seg_to_rle_seg(vol[0], [1], 1000, [1], force_connected=False)
        tracker.update(rle_seg[1], 0)
        tracker.finish()

        fill_holes_in_segmentation(tracker, vol.shape, [1], 1000, [1])
        areas = {k: int(np.sum(a["runs"])) for k, a in tracker.instances.items()}
        assert len(areas) == 2, areas
        # nested instance untouched (16 px); ring filled hole background
        nested_area = min(areas.values())
        ring_area = max(areas.values())
        assert nested_area == 16
        assert ring_area == 18 * 18 - 16  # hole background claimed by ring

    def test_relabel_overflow_fails_loudly(self):
        from empanada_tpu.stitch.filters import _force_connected_relabel

        # 4 isolated fragments of one instance, label_divisor=4 -> ids would
        # spill into class 2's window
        mask = np.zeros((2, 20), np.int64)
        for i in range(4):
            mask[0, i * 5] = 5  # class 1 (divisor 4): 4 isolated components
        with pytest.raises(ValueError, match="exceed label_divisor"):
            _force_connected_relabel(mask, [1], 4, [1])

    def test_semantic_consensus_sparse_coverage(self):
        """One axis only (< vote_thr non-empty trackers): emit the semantic
        record with an empty RLE instead of the reference's IndexError
        (PARITY.md divergence 9)."""
        vol = np.zeros((4, 8, 8), np.int64)
        vol[1:3, 2:6, 2:6] = 1000
        trackers = []
        for axis in ("xy", "xz", "yz"):
            trackers.append(InstanceTracker(1, 1000, vol.shape, axis))
        # only xy sees anything
        for idx in range(vol.shape[0]):
            rle_seg = pan_seg_to_rle_seg(vol[idx], [1], 1000, [1], force_connected=False)
            trackers[0].update(rle_seg[1], idx)
        for tr in trackers:
            tr.finish()
        out = merge_semantic_from_trackers(trackers, pixel_vote_thr=2)
        assert list(out) == [1]
        assert len(out[1]["starts"]) == 0 and len(out[1]["runs"]) == 0


def test_sparse_assignment_matches_dense():
    """Component-decomposed Hungarian must reproduce the dense solve exactly
    (cross-component entries are zero, so per-component optima are global)."""
    from scipy.optimize import linear_sum_assignment

    from empanada_tpu.stitch.matcher import _sparse_assignment

    rng = np.random.default_rng(3)
    m = np.zeros((400, 390), dtype=np.float32)
    for i in range(400):
        lo, hi = max(0, i - 2), min(390, i + 3)
        if lo >= hi:
            continue
        for j in rng.integers(lo, hi, size=2):
            m[i, j] = rng.uniform(0.05, 1.0)

    dr, dc = linear_sum_assignment(m, maximize=True)
    sr, sc = _sparse_assignment(m)
    assert m[sr, sc].sum() == pytest.approx(m[dr, dc].sum())
    thr = 0.25
    dense_pairs = {(r, c) for r, c in zip(dr, dc) if m[r, c] >= thr}
    sparse_pairs = {(r, c) for r, c in zip(sr, sc) if m[r, c] >= thr}
    assert dense_pairs == sparse_pairs


def test_merge_groups_matches_pairwise_fold():
    """_merge_groups (one native batched union) == folding merge_attrs
    pairwise, for random grouped instances."""
    from empanada_tpu.stitch.matcher import _merge_groups, merge_attrs

    rng = np.random.default_rng(12)
    groups = {}
    for lbl in range(20):
        attrs = []
        for _ in range(int(rng.integers(1, 6))):
            n = int(rng.integers(1, 30))
            starts = np.sort(rng.choice(10000, n, replace=False)).astype(np.int64)
            runs = rng.integers(1, 40, n).astype(np.int64)
            y0, x0 = rng.integers(0, 50, 2)
            attrs.append({
                "box": (int(y0), int(x0), int(y0 + rng.integers(1, 20)),
                        int(x0 + rng.integers(1, 20))),
                "starts": starts, "runs": runs,
            })
        groups[lbl] = attrs

    got = _merge_groups({k: list(v) for k, v in groups.items()})
    for lbl, attrs in groups.items():
        want = attrs[0]
        for a in attrs[1:]:
            want = merge_attrs(want, a)
        g = got[lbl]
        assert tuple(g["box"]) == tuple(want["box"])
        assert np.array_equal(np.asarray(g["starts"]), np.asarray(want["starts"])), lbl
        assert np.array_equal(np.asarray(g["runs"]), np.asarray(want["runs"])), lbl


def test_native_range_union_matches_join_ranges():
    from empanada_tpu.core import native
    from empanada_tpu.core.ranges import join_ranges

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    for _ in range(20):
        def mk():
            n = int(rng.integers(0, 40))
            s = np.sort(rng.choice(2000, n, replace=False)).astype(np.int64)
            e = s + rng.integers(1, 30, n)
            # make sorted+disjoint by clipping ends at next start
            if n > 1:
                e[:-1] = np.minimum(e[:-1], s[1:])
            keep = e > s
            return np.stack([s[keep], e[keep]], axis=1)

        a, b = mk(), mk()
        got = native.range_union(a, b)
        want = join_ranges([a, b])
        assert np.array_equal(got, want)


def test_matcher_worker_error_does_not_deadlock():
    """A failure inside the worker thread (e.g. a device error surfacing at
    the np.asarray fetch of an enqueued device map) must drain the bounded
    queue so the producer's put never blocks, and finish() must re-raise."""
    import time

    class Boom:
        def __array__(self, dtype=None):
            raise RuntimeError("device fetch failed")

    matchers = create_matchers([1], 1000, 0.25, 0.25)
    worker = MatcherWorker(matchers, [1], 1000, [1], maxsize=2)
    worker.put(Boom())
    t0 = time.time()
    for _ in range(10):  # would deadlock at the 3rd put before the fix
        worker.put(np.zeros((8, 8), np.int64))
    assert time.time() - t0 < 5.0
    with pytest.raises(RuntimeError, match="matcher worker failed"):
        worker.finish()
