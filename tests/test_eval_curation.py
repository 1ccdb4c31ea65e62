"""Evaluation + curation layer tests."""

import numpy as np
import pytest

import empanada_tpu.curation as C
import empanada_tpu.eval as E
from empanada_tpu.stitch import pan_seg_to_rle_seg
from empanada_tpu.stitch.tracker import InstanceTracker


def _tracker_json(tmp_path, vol, name):
    tracker = InstanceTracker(1, 1000, vol.shape, "xy")
    for z in range(vol.shape[0]):
        rle_seg = pan_seg_to_rle_seg(vol[z], [1], 1000, [1], force_connected=False)
        tracker.update(rle_seg[1], z)
    tracker.finish()
    p = str(tmp_path / f"{name}.json")
    tracker.write_to_json(p)
    return p


class TestEvaluator:
    def test_perfect_prediction(self, tmp_path):
        vol = np.zeros((4, 20, 20), dtype=np.int64)
        vol[:, 2:8, 2:8] = 1001
        vol[:, 12:18, 12:18] = 1002
        gt = _tracker_json(tmp_path, vol, "gt")
        pred = _tracker_json(tmp_path, vol, "pred")
        results = E.default_evaluator()(gt, pred)
        assert results["iou"] == pytest.approx(1.0)
        assert results["f1_50"] == pytest.approx(1.0)
        assert results["pq"] == pytest.approx(1.0, abs=1e-4)

    def test_half_prediction(self, tmp_path):
        vol = np.zeros((4, 20, 20), dtype=np.int64)
        vol[:, 2:8, 2:8] = 1001
        vol[:, 12:18, 12:18] = 1002
        pred_vol = np.zeros_like(vol)
        pred_vol[:, 2:8, 2:8] = 1001  # only one instance found
        gt = _tracker_json(tmp_path, vol, "gt2")
        pred = _tracker_json(tmp_path, pred_vol, "pred2")
        results = E.default_evaluator()(gt, pred)
        assert results["f1_50"] == pytest.approx(2 / 3, abs=1e-3)
        assert results["recall_50"] == pytest.approx(0.5)
        assert results["precision_50"] == pytest.approx(1.0)


class TestCurationOps:
    def test_merge_and_delete(self):
        labels = np.zeros((10, 10), np.int64)
        labels[1:4, 1:4] = 5
        labels[6:9, 6:9] = 9
        C.merge_labels(labels, label_ids=[5, 9])
        assert set(np.unique(labels)) == {0, 5}
        C.delete_labels(labels, label_ids=[5])
        assert labels.sum() == 0

    def test_merge_via_line(self):
        labels = np.zeros((10, 10), np.int64)
        labels[1:4, 1:4] = 5
        labels[6:9, 6:9] = 9
        C.merge_labels(labels, lines=[[(2, 2), (7, 7)]])
        assert set(np.unique(labels)) == {0, 5}

    def test_split_two_lobes(self):
        # dumbbell: two 7x7 squares joined by a thin bridge
        labels = np.zeros((9, 24), np.int64)
        labels[1:8, 1:8] = 3
        labels[1:8, 16:23] = 3
        labels[4, 8:16] = 3
        out = C.split_labels(labels.copy(), label_ids=[3], min_distance=3)
        ids = np.unique(out)
        # the two lobes must end up with different labels (the thin bridge
        # may become its own small fragment, same as skimage peak_local_max)
        assert len(ids[ids > 0]) >= 2
        assert out[4, 4] != out[4, 19]
        assert out[4, 4] > 0 and out[4, 19] > 0

    def test_split_with_points(self):
        labels = np.zeros((9, 24), np.int64)
        labels[1:8, 1:23] = 3
        out = C.split_labels(
            labels.copy(), label_ids=[3],
            points=[(4, 4), (4, 20)], points_as_markers=True,
        )
        ids = np.unique(out)
        assert len(ids[ids > 0]) == 2
        assert out[4, 4] != out[4, 20]

    def test_morph_dilate_erode(self):
        labels = np.zeros((12, 12), np.int64)
        labels[4:8, 4:8] = 2
        area0 = (labels == 2).sum()
        C.morph_labels(labels, label_ids=[2], operation="dilate", radius=1)
        assert (labels == 2).sum() > area0
        C.morph_labels(labels, label_ids=[2], operation="erode", radius=1)
        C.morph_labels(labels, label_ids=[2], operation="erode", radius=1)
        assert 0 < (labels == 2).sum() < area0

    def test_morph_fill_holes(self):
        labels = np.zeros((12, 12), np.int64)
        labels[2:10, 2:10] = 2
        labels[5:7, 5:7] = 0  # hole
        C.morph_labels(labels, label_ids=[2], operation="fill_holes", hole_size=16)
        assert (labels[5:7, 5:7] == 2).all()

    def test_next_available_label(self):
        labels = np.array([1001, 1002, 1004, 2001])
        assert C.find_next_available_label(labels, 1, 1000) == 1003
        assert C.find_next_available_label(labels, 3, 1000) == 3001

    def test_jump_to_label(self):
        labels = np.zeros((4, 8, 8), np.int64)
        labels[1:3, 2:5, 3:7] = 9
        assert C.jump_to_label(labels, 9) == (1, 2, 3, 3, 5, 7)
        with pytest.raises(KeyError):
            C.jump_to_label(labels, 55)


class TestCurationFilters:
    def test_small_and_boundary(self):
        labels = np.zeros((10, 10), np.int64)
        labels[0, 0:3] = 1  # border-touching
        labels[4:6, 4:6] = 2  # area 4
        labels[7:10, 6:10] = 3  # border-touching, area 12
        out, n = C.filter_out_small_label_areas(labels.copy(), 5)
        assert n == 2 and set(np.unique(out)) == {0, 3}
        out, n = C.remove_boundary_labels(labels.copy())
        assert n == 2 and set(np.unique(out)) == {0, 2}


class TestCountExport:
    def test_count_labels(self):
        vals = np.array([0, 1001, 1002, 2001, 2001])
        queue, class_ids = C.count_labels(vals, 1000)
        assert class_ids == [1, 2]
        assert queue[1] == [1001, 1002]
        assert queue[2] == [2001]

    def test_save_label_lists_csv(self, tmp_path):
        p = C.save_label_lists(
            [{1: [1001, 1002]}], {1: "mito"}, str(tmp_path / "counts.csv")
        )
        content = open(p).read()
        assert "mito" in content and "1001" in content

    def test_export_segmentations(self, tmp_path):
        labels = np.random.default_rng(0).integers(0, 5, (3, 16, 16)).astype(np.int64)
        paths = C.export_segmentations(labels, str(tmp_path), as_stack=False)
        assert len(paths) == 3
        stack = C.export_segmentations(labels, str(tmp_path), as_stack=True)
        assert len(stack) == 1


class TestPatchesTiles:
    def test_pick_and_store(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (128, 128), dtype=np.uint8)
        lbl = rng.integers(0, 5, (128, 128)).astype(np.int32)
        patches = C.pick_patches_2d(img, n_patches=3, patch_size=32, labels=lbl)
        assert len(patches) == 3
        assert patches[0]["image"].shape == (32, 32)
        n = C.store_dataset(str(tmp_path / "ds"), "src", patches)
        assert n == 3
        import os
        assert len(os.listdir(tmp_path / "ds" / "src" / "images")) == 3
        assert len(os.listdir(tmp_path / "ds" / "src" / "masks")) == 3

    def test_patch_boxes_from_points(self):
        # 2D point: corners TL,TR,BR,BL at +/- tile_width/2
        (box,) = C.patch_boxes_from_points([(100, 200)], tile_width=64)
        np.testing.assert_array_equal(
            box, [[68, 168], [68, 232], [132, 232], [132, 168]]
        )
        # 3D point: leading coordinate carried onto every corner
        (box3,) = C.patch_boxes_from_points([(7, 50, 60)], tile_width=20)
        assert box3.shape == (4, 3)
        assert (box3[:, 0] == 7).all()
        np.testing.assert_array_equal(box3[0], [7, 40, 50])
        np.testing.assert_array_equal(box3[2], [7, 60, 70])

    def test_flipbooks(self):
        vol = np.random.default_rng(0).integers(0, 255, (64, 64, 64), dtype=np.uint8)
        fbs = C.pick_flipbooks(vol, n_flipbooks=2, patch_size=32, isotropic=True)
        assert len(fbs) == 2
        assert fbs[0]["image"].shape == (5, 32, 32)

    def test_tiles_roundtrip(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (100, 130), dtype=np.uint8)
        ip = str(tmp_path / "big.tiff")
        Image.fromarray(img).save(ip)
        meta = C.chop_into_tiles(ip, str(tmp_path / "tiles"), patch_size=64)
        assert meta["padded_image_shape"] == [128, 192]
        out = C.merge_tiles(str(tmp_path / "tiles"), str(tmp_path / "merged"))
        merged = np.asarray(Image.open(out["im"]))
        assert np.array_equal(merged, img)


class TestAccuracy:
    def test_pixel_and_instance(self):
        gt = np.zeros((20, 20), np.int64)
        gt[2:8, 2:8] = 1
        gt[12:18, 12:18] = 2
        assert C.compute_pixel_metrics(gt, gt)["f1"] == 1.0
        m = C.compute_instance_metrics(gt, gt)
        assert m["f1"] == 1.0 and m["tp"] == 2
        pred = np.where(gt == 1, 1, 0)
        m2 = C.compute_instance_metrics(gt, pred)
        assert m2["tp"] == 1 and m2["fn"] == 1 and m2["fp"] == 0
