"""Golden regression tier (the reference's parity-gate pattern,
tests/conftest.py:69-122 there: label histograms within ±10%).

A fixed-seed random-weight model over a fixed synthetic volume pins the full
3D pipeline numerics (forward, median queue, NMS/grouping/merge, RLE
matching, consensus).  Goldens were recorded on CPU (jax 0.9); the ±10%
tolerance absorbs minor cross-version numeric drift, while real semantic
regressions (postprocess changes, matcher changes) blow well past it.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from conftest import make_blob_image

import empanada_tpu.api as api
from empanada_tpu.models import create_model

GOLDEN = {
    "stack_instances": 2,
    "stack_nonzero": 147456,
    "stack_hist": [95056, 0, 0, 0, 0, 0, 0, 0, 0, 52400],
    "consensus_instances": 1,
    "consensus_nonzero": 90995,
}
TOL = 0.10


@pytest.fixture(scope="module")
def setup():
    model = create_model(
        "PanopticDeepLabPR", encoder="resnet18", num_classes=1,
        decoder_channels=32, low_level_channels_project=(16, 8, 4),
        subdivision_num_points=256,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(1234)}, jnp.zeros((1, 64, 64, 1)), train=False
    )
    cfg = {
        "class_names": {1: "mito"}, "labels": [1], "thing_list": [1], "model": "x",
        "padding_factor": 16, "norms": {"mean": 0.5, "std": 0.29},
    }
    vol = np.stack([make_blob_image((96, 96), n_blobs=5, seed=s) for s in range(16)])
    return model, variables, cfg, vol


def _close(got, want, tol=TOL):
    if want == 0:
        return got == 0
    return abs(got - want) / want <= tol


class TestGoldenRegression:
    def test_stack_inference(self, setup):
        model, variables, cfg, vol = setup
        eng = api.Engine3d(
            cfg, median_kernel_size=3, min_size=10, min_extent=1, max_centers=64,
            model_and_variables=(model, variables), save_panoptic=True,
        )
        stack, trackers = eng.infer_on_axis(vol, "xy")
        assert _close(len(trackers[0].instances), GOLDEN["stack_instances"], 0.5)
        assert _close(int((stack > 0).sum()), GOLDEN["stack_nonzero"])
        hist = np.histogram(stack[stack > 0], bins=10)[0]
        for got, want in zip(hist, GOLDEN["stack_hist"]):
            assert _close(int(got), want), (hist.tolist(), GOLDEN["stack_hist"])

    def test_orthoplane_consensus(self, setup):
        model, variables, cfg, vol = setup
        eng = api.Engine3d(
            cfg, median_kernel_size=3, min_size=10, min_extent=1, max_centers=64,
            model_and_variables=(model, variables),
        )
        all_trackers = eng.infer_orthoplane(vol)
        outs = list(api.tracker_consensus(all_trackers, None, cfg, min_size=10, min_extent=1))
        cvol, class_name, instances = outs[0]
        assert class_name == "mito"
        assert _close(len(instances), GOLDEN["consensus_instances"], 1.0)
        assert _close(int((np.asarray(cvol) > 0).sum()), GOLDEN["consensus_nonzero"])


MULTICLASS_GOLDEN = {
    # recorded on CPU jax 0.9 (round 2); instance counts gate exactly (+-1),
    # histograms +-10% — a real postprocess/matcher regression moves these
    # far beyond tolerance (the r1 fixture had only 2 instances)
    "stack_instances_mito": 33,
    "stack_instances_er": 1,
    "stack_nonzero": 66992,
    "stack_hist": [57682, 160, 0, 0, 0, 0, 0, 0, 0, 9150],
    "consensus_er_nonzero": 45081,
}


class TestMulticlassGoldenRegression:
    """Denser multi-class golden tier: 33 thing instances + a stuff class
    through the full 3D stack pipeline; instance counts pinned to +-1."""

    @pytest.fixture(scope="class")
    def mc_setup(self):
        model = create_model(
            "PanopticDeepLab", encoder="resnet18", num_classes=3,
            decoder_channels=32, low_level_channels_project=(16, 8, 4),
            ins_decoder=True,
        )
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(77)}, jnp.zeros((1, 64, 64, 1)), train=False
        )
        cfg = {
            "class_names": {1: "mito", 2: "er"}, "labels": [1, 2],
            "thing_list": [1], "model": "x", "padding_factor": 16,
            "norms": {"mean": 0.5, "std": 0.29},
        }
        vol = np.stack(
            [make_blob_image((96, 96), n_blobs=6, seed=100 + s) for s in range(16)]
        )
        return model, variables, cfg, vol

    def test_stack_counts_and_hist(self, mc_setup):
        model, variables, cfg, vol = mc_setup
        eng = api.Engine3d(
            cfg, median_kernel_size=3, min_size=10, min_extent=1, max_centers=64,
            model_and_variables=(model, variables), save_panoptic=True,
        )
        stack, trackers = eng.infer_on_axis(vol, "xy")
        by_class = {t.class_id: len(t.instances) for t in trackers}
        assert abs(by_class[1] - MULTICLASS_GOLDEN["stack_instances_mito"]) <= 1, by_class
        assert by_class[2] == MULTICLASS_GOLDEN["stack_instances_er"], by_class
        assert _close(int((stack > 0).sum()), MULTICLASS_GOLDEN["stack_nonzero"])
        hist = np.histogram(stack[stack > 0], bins=10)[0]
        for got, want in zip(hist, MULTICLASS_GOLDEN["stack_hist"]):
            if want < 200:  # tiny bins: absolute slack
                assert abs(int(got) - want) <= 50, (hist.tolist(),)
            else:
                assert _close(int(got), want), (hist.tolist(),)

    def test_orthoplane_consensus_semantic(self, mc_setup):
        model, variables, cfg, vol = mc_setup
        eng = api.Engine3d(
            cfg, median_kernel_size=3, min_size=10, min_extent=1, max_centers=64,
            model_and_variables=(model, variables),
        )
        all_trackers = eng.infer_orthoplane(vol)
        outs = {
            name: (v, inst)
            for v, name, inst in api.tracker_consensus(
                all_trackers, None, cfg, min_size=10, min_extent=1
            )
        }
        # stuff-class (er) semantic vote persists across the three views
        er_vol, er_inst = outs["er"]
        assert _close(
            int((np.asarray(er_vol) > 0).sum()),
            MULTICLASS_GOLDEN["consensus_er_nonzero"],
        )
        # random-weight thing instances do NOT persist across views: the
        # consensus must reject them all (a matcher/consensus regression
        # that leaks single-view instances breaks this exact zero)
        mito_vol, mito_inst = outs["mito"]
        assert len(mito_inst) == 0
        assert int((np.asarray(mito_vol) > 0).sum()) == 0
