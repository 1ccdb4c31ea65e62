"""Crash-safe 3D inference checkpoint/resume (stitch/checkpoint.py).

The contract under test: a run killed mid-axis and resumed from its last
periodic checkpoint produces results BIT-IDENTICAL to an uninterrupted
run — median window semantics, matcher label continuity, and tracker
state all included.  (The reference's inference loops are all-or-nothing,
empanada_napari/inference.py:526.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

import empanada_tpu.api as api
from empanada_tpu.models import create_model
from empanada_tpu.stitch import checkpoint as ckpt
from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg


@pytest.fixture(scope="module")
def tiny_model_and_variables():
    model = create_model(
        "PanopticDeepLabPR", encoder="resnet18", num_classes=1,
        decoder_channels=32, low_level_channels_project=(16, 8, 4),
        subdivision_num_points=256,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 1)), train=False
    )
    return model, variables


@pytest.fixture
def tiny_config():
    return {
        "model_name": "tiny",
        "class_names": {1: "mito"},
        "labels": [1],
        "thing_list": [1],
        "padding_factor": 16,
        "norms": {"mean": 0.5, "std": 0.2},
    }


def _blob_volume(shape=(16, 64, 64), seed=7):
    rng = np.random.default_rng(seed)
    field = gaussian_filter(rng.normal(0, 1, shape), (1.5, 4, 4))
    field /= field.std() + 1e-9
    vol = ((field > 0.6) * 110 + 90 + rng.normal(0, 6, shape)).clip(0, 255)
    return vol.astype(np.uint8)


def _engine(tiny_config, tiny_model_and_variables, **kw):
    return api.Engine3d(
        tiny_config, median_kernel_size=3, min_size=0, min_extent=0,
        max_centers=32, save_panoptic=True,
        model_and_variables=tiny_model_and_variables, **kw,
    )


def _segments(cdir, axis):
    import glob

    return sorted(glob.glob(os.path.join(cdir, f"forward_{axis}.*.npz")))


def _segment_slices(cdir, axis):
    total = []
    for path in _segments(cdir, axis):
        seg, _ = ckpt.load_forward_state(path)
        total.extend(seg)
    return total


def _stack_equal(a, b):
    if len(a) != len(b):
        return False
    for sa, sb in zip(a, b):
        if set(sa.keys()) != set(sb.keys()):
            return False
        for cid in sa:
            if set(sa[cid].keys()) != set(sb[cid].keys()):
                return False
            for label in sa[cid]:
                xa, xb = sa[cid][label], sb[cid][label]
                if tuple(xa["box"]) != tuple(xb["box"]):
                    return False
                if not np.array_equal(xa["starts"], xb["starts"]):
                    return False
                if not np.array_equal(xa["runs"], xb["runs"]):
                    return False
    return True


class TestForwardStateRoundtrip:
    def test_save_load_exact(self, tmp_path):
        rng = np.random.default_rng(0)
        stack = []
        for _ in range(5):
            field = gaussian_filter(rng.normal(0, 1, (48, 48)), 3)
            lab = (field > 0.5).astype(np.int32)
            from scipy.ndimage import label as cc_label

            lab, _ = cc_label(lab)
            pan = (lab > 0) * 1000 + lab
            stack.append(
                pan_seg_to_rle_seg(pan.astype(np.int32), [1], 1000, [1])
            )
        meta = {"axis_name": "xy", "anything": [1, 2, 3]}
        path = str(tmp_path / "fwd.npz")
        ckpt.save_forward_state(path, stack, meta)
        loaded, meta2 = ckpt.load_forward_state(path)
        assert meta2 == meta
        assert _stack_equal(stack, loaded)

    def test_empty_slices_roundtrip(self, tmp_path):
        stack = [
            {1: {}},
            pan_seg_to_rle_seg(np.zeros((8, 8), np.int32), [1], 1000, [1]),
        ]
        path = str(tmp_path / "fwd.npz")
        ckpt.save_forward_state(path, stack, {"x": 1})
        loaded, _ = ckpt.load_forward_state(path)
        assert _stack_equal(stack, loaded)

    def test_meta_mismatch_refuses(self, tmp_path):
        path = str(tmp_path / "fwd.npz")
        ckpt.save_forward_state(path, [{1: {}}], {"axis_name": "xy", "k": 3})
        _, meta = ckpt.load_forward_state(path)
        with pytest.raises(ValueError, match="different run configuration"):
            ckpt.check_meta(meta, {"axis_name": "xy", "k": 5}, path)


class _CrashAfter:
    """Wraps engine.dispatch to simulate a crash after n calls."""

    def __init__(self, engine, n):
        self.engine = engine
        self.orig = engine.engine.dispatch
        self.n = n
        self.calls = 0

    def __call__(self, *a, **kw):
        if self.calls >= self.n:
            raise RuntimeError("simulated crash (preemption)")
        self.calls += 1
        return self.orig(*a, **kw)


class TestCrashResume:
    def test_resume_bit_identical(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        vol = _blob_volume()
        cdir = str(tmp_path / "ckpt")

        # ground truth: uninterrupted run
        eng = _engine(tiny_config, tiny_model_and_variables)
        ref_stack, ref_trackers = eng.infer_on_axis(vol, "xy")

        # crashed run: dies at slice 12 of 16, checkpoints every 4
        eng2 = _engine(tiny_config, tiny_model_and_variables)
        crash = _CrashAfter(eng2, 12)
        eng2.engine.dispatch = crash
        with pytest.raises(RuntimeError, match="simulated crash"):
            eng2.infer_on_axis(
                vol, "xy", checkpoint_dir=cdir, checkpoint_every=4
            )
        assert _segments(cdir, "xy"), "periodic checkpoint must survive a crash"
        partial = _segment_slices(cdir, "xy")
        assert 0 < len(partial) < vol.shape[0]

        # resumed run: fresh engine (as after a process restart)
        eng3 = _engine(tiny_config, tiny_model_and_variables)
        res_stack, res_trackers = eng3.infer_on_axis(
            vol, "xy", checkpoint_dir=cdir, resume=True
        )

        assert np.array_equal(np.asarray(ref_stack), np.asarray(res_stack))
        for rt, st in zip(ref_trackers, res_trackers):
            assert set(rt.instances.keys()) == set(st.instances.keys())
            for k in rt.instances:
                assert np.array_equal(
                    rt.instances[k]["starts"], st.instances[k]["starts"]
                )
                assert np.array_equal(
                    rt.instances[k]["runs"], st.instances[k]["runs"]
                )
        assert not _segments(cdir, "xy"), "checkpoint removed after completion"

    def test_resume_rejects_changed_config(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        vol = _blob_volume(shape=(8, 48, 48))
        cdir = str(tmp_path / "ckpt")
        eng = _engine(tiny_config, tiny_model_and_variables)
        crash = _CrashAfter(eng, 6)
        eng.engine.dispatch = crash
        with pytest.raises(RuntimeError):
            eng.infer_on_axis(vol, "xy", checkpoint_dir=cdir, checkpoint_every=2)

        eng2 = _engine(
            tiny_config, tiny_model_and_variables, merge_iou_thr=0.5
        )
        with pytest.raises(ValueError, match="different run configuration"):
            eng2.infer_on_axis(vol, "xy", checkpoint_dir=cdir, resume=True)


class TestStaleCheckpointGuards:
    def test_resume_rejects_different_volume_same_shape(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        """A checkpoint dir left over from ANOTHER volume (identical shape
        and config) must be refused via the content fingerprint."""
        vol_a = _blob_volume(shape=(10, 48, 48), seed=1)
        vol_b = _blob_volume(shape=(10, 48, 48), seed=2)
        cdir = str(tmp_path / "ckpt")

        eng = _engine(tiny_config, tiny_model_and_variables)
        crash = _CrashAfter(eng, 8)
        eng.engine.dispatch = crash
        with pytest.raises(RuntimeError):
            eng.infer_on_axis(vol_a, "xy", checkpoint_dir=cdir, checkpoint_every=2)

        eng2 = _engine(tiny_config, tiny_model_and_variables)
        with pytest.raises(ValueError, match="different run configuration"):
            eng2.infer_on_axis(vol_b, "xy", checkpoint_dir=cdir, resume=True)

    def test_orthoplane_resume_rejects_stale_trackers(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        """Completed-axis tracker JSONs from a different volume must not be
        silently reused (meta sidecar fingerprint check)."""
        vol_a = _blob_volume(shape=(6, 48, 48), seed=1)
        vol_b = _blob_volume(shape=(6, 48, 48), seed=2)
        cdir = str(tmp_path / "ckpt")

        eng = _engine(tiny_config, tiny_model_and_variables)
        eng.infer_orthoplane(vol_a, checkpoint_dir=cdir)

        eng2 = _engine(tiny_config, tiny_model_and_variables)
        with pytest.raises(ValueError, match="different run configuration"):
            eng2.infer_orthoplane(vol_b, checkpoint_dir=cdir, resume=True)


class TestMultiChipCrashResume:
    def test_resume_bit_identical(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        from empanada_tpu.parallel import MultiChipEngine3d

        vol = _blob_volume(shape=(20, 64, 64), seed=11)
        cdir = str(tmp_path / "ckpt")

        def engine():
            return MultiChipEngine3d(
                tiny_config, median_kernel_size=3, min_size=0, min_extent=0,
                max_centers=32, batch_size=8, save_panoptic=True,
                model_and_variables=tiny_model_and_variables,
            )

        eng = engine()
        ref_stack, ref_trackers = eng.infer_on_axis(vol, "xy")

        # crash mid-stream: the per-slice put raises after 12 kept slices
        # (mid-batch: resume must recompute from the batch boundary and
        # drop the already-checkpointed partial batch)
        eng2 = engine()

        def install_crash(worker_put, n=12):
            calls = {"n": 0}

            def crashing(item):
                if calls["n"] >= n:
                    raise RuntimeError("simulated crash (preemption)")
                calls["n"] += 1
                return worker_put(item)

            return crashing

        import empanada_tpu.parallel.data_parallel as dp
        real_worker_cls = dp.MatcherWorker

        class CrashWorker(real_worker_cls):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                self.put = install_crash(super().put)

        dp.MatcherWorker = CrashWorker
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                eng2.infer_on_axis(
                    vol, "xy", checkpoint_dir=cdir, checkpoint_every=2
                )
        finally:
            dp.MatcherWorker = real_worker_cls
        assert _segments(cdir, "xy")
        partial = _segment_slices(cdir, "xy")
        assert 0 < len(partial) < vol.shape[0]

        eng3 = engine()
        res_stack, res_trackers = eng3.infer_on_axis(
            vol, "xy", checkpoint_dir=cdir, resume=True
        )
        assert np.array_equal(np.asarray(ref_stack), np.asarray(res_stack))
        for rt, st in zip(ref_trackers, res_trackers):
            assert set(rt.instances.keys()) == set(st.instances.keys())
            for k in rt.instances:
                assert np.array_equal(
                    rt.instances[k]["starts"], st.instances[k]["starts"]
                )
        assert not _segments(cdir, "xy")


class TestOrthoplaneResume:
    def test_completed_axes_skip_device(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        vol = _blob_volume(shape=(8, 48, 48), seed=3)
        cdir = str(tmp_path / "ckpt")

        eng = _engine(tiny_config, tiny_model_and_variables)
        ref = eng.infer_orthoplane(vol, checkpoint_dir=cdir)

        # rerun with resume: every axis already has finished trackers on
        # disk, so the device must never be touched
        eng2 = _engine(tiny_config, tiny_model_and_variables)
        counter = _CrashAfter(eng2, 0)  # any dispatch would raise
        eng2.engine.dispatch = counter
        res = eng2.infer_orthoplane(vol, checkpoint_dir=cdir, resume=True)

        assert set(ref.keys()) == set(res.keys())
        for axis in ref:
            for rt, st in zip(ref[axis], res[axis]):
                assert set(rt.instances.keys()) == set(st.instances.keys())
