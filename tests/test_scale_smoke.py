"""Memory-bounded deep-volume smoke: a 512-slice stream — 8x deeper than any
other test — through Engine3d and MultiChipEngine3d, proving the streaming
claims at depth:

- device residency stays O(batch + median window), independent of depth
  (``_max_resident``);
- host RSS growth during the stream stays far below the O(volume)
  probability stacks a non-streaming design would hold (the reference
  streams slice-wise through a DataLoader,
  /root/reference/empanada_napari/inference.py:526-543);
- kill-and-restart mid-stream at depth (checkpoint_every=64) resumes to
  bit-identical trackers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_blob_image

import empanada_tpu.api as api
from empanada_tpu.models import create_model
from empanada_tpu.parallel import MultiChipEngine3d

pytestmark = pytest.mark.slow

DEPTH = 512
HW = 256


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


@pytest.fixture(scope="module")
def cfg():
    return {
        "class_names": {1: "mito"},
        "labels": [1],
        "thing_list": [1],
        "model": "x",
        "padding_factor": 16,
        "norms": {"mean": 0.5, "std": 0.2},
    }


@pytest.fixture(scope="module")
def deep_volume():
    # 32 distinct slices tiled to 512 — keeps fixture generation fast while
    # every batch still carries varied content
    base = np.stack(
        [make_blob_image((HW, HW), n_blobs=6, seed=s) for s in range(32)]
    )
    return np.tile(base, (DEPTH // 32, 1, 1))


def _rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def _settle_allocator():
    """gc + glibc malloc_trim so VmRSS reflects live retention, not free
    arena pages.  Without the trim, growth measured mid-suite is polluted
    by other tests' lazily-returned allocator arenas (observed: the same
    run retains 429 MB under full-suite load vs <300 MB in isolation)."""
    import ctypes
    import gc

    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:  # non-glibc platform; RSS gate is best-effort there
        pass


class _RssTracker:
    """Start/end VmRSS.  End-minus-baseline is the meaningful streaming
    invariant: an O(volume) retention (probability stacks, dense per-slice
    maps) survives to the end of the run; transient PEAKS on the CPU jax
    backend are allocator churn (observed oscillating +-1 GB batch to batch
    and returning to baseline) and are not ours to gate."""

    def __enter__(self):
        _settle_allocator()
        self.baseline = _rss_mb()
        return self

    def __exit__(self, *exc):
        _settle_allocator()
        self.final = _rss_mb()

    @property
    def growth_mb(self):
        return self.final - self.baseline


def _tracker_sets(trackers):
    out = []
    for tracker in trackers:
        insts = set()
        for attrs in tracker.instances.values():
            vox = []
            for s, r in zip(np.asarray(attrs["starts"]), np.asarray(attrs["runs"])):
                vox.extend(range(int(s), int(s) + int(r)))
            insts.add(frozenset(vox))
        out.append(insts)
    return out


class TestDeepStream:
    def test_multichip_512_slices_bounded_and_resumable(
        self, tiny_model_and_variables, cfg, deep_volume, tmp_path
    ):
        def engine():
            return MultiChipEngine3d(
                cfg, median_kernel_size=3, min_size=100, min_extent=1,
                max_centers=256, model_and_variables=tiny_model_and_variables,
                # this test pins the STREAMED path's O(window) residency;
                # auto volume-residency would hold n_dev replicated volume
                # copies by design (deep volumes exceed the auto threshold
                # in production; this fixture is small enough to opt in)
                volume_resident=False,
            )

        # compile warmup outside the measured window
        eng = engine()
        eng.infer_on_axis(deep_volume[: eng._resolve_batch(deep_volume.shape, 0)], "xy")

        with _RssTracker() as rss:
            _, ref_trackers = eng.infer_on_axis(deep_volume, "xy")

        # device residency is O(window), not O(depth)
        b = eng.last_batch_size
        K = -(-eng.mid // b)
        assert eng._max_resident <= 2 * K + 2, eng._max_resident
        assert eng.last_overflow == 0

        # a non-streaming design would hold O(volume) float stacks to the
        # end of the run: sem+ctr+offsets at 512x256² f32 = ~0.8 GB.  The
        # streamed window is ~b x 5ch x 256² f32 (tens of MB); RLE stacks +
        # tracker state are O(labeled runs).  400 MB of retained growth
        # catches any accidental volume-sized materialization.
        assert rss.growth_mb < 400, f"RSS retained {rss.growth_mb:.0f} MB after stream"

        n_inst = sum(len(t.instances) for t in ref_trackers)
        assert n_inst > 0, "deep stream segmented nothing (vacuous)"

        # kill at ~60% depth, restart from checkpoint, bit-identical result
        import empanada_tpu.parallel.data_parallel as dp

        cdir = str(tmp_path / "ckpt")
        real_worker_cls = dp.MatcherWorker

        class CrashWorker(real_worker_cls):
            def __init__(self, *a, **kw):
                super().__init__(*a, **kw)
                calls = {"n": 0}
                inner = self.put

                def crashing(item):
                    if calls["n"] >= int(DEPTH * 0.6):
                        raise RuntimeError("simulated crash (preemption)")
                    calls["n"] += 1
                    return inner(item)

                self.put = crashing

        dp.MatcherWorker = CrashWorker
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                engine().infer_on_axis(
                    deep_volume, "xy", checkpoint_dir=cdir, checkpoint_every=64
                )
        finally:
            dp.MatcherWorker = real_worker_cls

        _, res_trackers = engine().infer_on_axis(
            deep_volume, "xy", checkpoint_dir=cdir, resume=True
        )
        assert _tracker_sets(res_trackers) == _tracker_sets(ref_trackers)

    def test_engine3d_512_slices_bounded(
        self, tiny_model_and_variables, cfg, deep_volume
    ):
        """Slice-streaming Engine3d at depth: host memory stays O(RLE),
        no dense per-slice maps are retained."""
        eng = api.Engine3d(
            cfg, median_kernel_size=3, min_size=100, min_extent=1,
            max_centers=256, model_and_variables=tiny_model_and_variables,
        )
        # warmup compile on a short prefix
        eng.infer_on_axis(deep_volume[:4], "xy")

        with _RssTracker() as rss:
            _, trackers = eng.infer_on_axis(deep_volume, "xy")

        assert eng.last_overflow == 0
        assert rss.growth_mb < 400, f"RSS retained {rss.growth_mb:.0f} MB after stream"
        assert sum(len(t.instances) for t in trackers) > 0
