"""Option-sweep sanity tier.

Mirrors the reference's headless widget sanity tests
(tests/test_button_widgets.py + conftest.py:50-107: seeded blob images,
~12 option combos, asserting output type/shape/value ranges), driven through
Engine2d with every interacting option pair.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_blob_image
from empanada_tpu.api.inference import Engine2d
from empanada_tpu.models import create_model


@pytest.fixture(scope="module")
def tiny():
    kwargs = dict(
        encoder="resnet18", num_classes=1, decoder_channels=32,
        low_level_channels_project=(16, 8, 4), subdivision_num_points=256,
    )
    model = create_model("PanopticDeepLabPR", **kwargs)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 1)), train=False
    )
    config = {
        "class_names": {1: "mito"}, "labels": [1], "thing_list": [1],
        "model": None, "padding_factor": 16, "norms": {"mean": 0.5, "std": 0.2},
    }
    return config, model, variables


SWEEP = list(itertools.product(
    [False, True],       # fine_boundaries
    [False, True],       # semantic_only
    [1, 2],              # downsampling
))


@pytest.mark.parametrize("fine_boundaries,semantic_only,scale", SWEEP)
def test_engine2d_option_sweep(tiny, fine_boundaries, semantic_only, scale):
    config, model, variables = tiny
    engine = Engine2d(
        config,
        inference_scale=scale,
        fine_boundaries=fine_boundaries,
        semantic_only=semantic_only,
        model_and_variables=(model, variables),
    )
    image = make_blob_image((96, 96), n_blobs=4)
    pan = engine.infer(image)

    assert pan.shape == image.shape
    assert pan.dtype == np.int64
    assert pan.min() >= 0
    labels = np.unique(pan)
    if semantic_only:
        # stuff semantics: class painted as class_id * label_divisor, no
        # per-instance ids (reference merge_semantic_and_instance:223)
        assert set(labels).issubset({0, 1000})
    else:
        # any foreground carries pan_id = class*divisor + instance
        assert all(l == 0 or l >= 1000 for l in labels)


def test_engine2d_update_params_reuses_model(tiny):
    """The live-update path (reference widget's re-run with new thresholds)
    must change behavior without rebuilding the model."""
    config, model, variables = tiny
    engine = Engine2d(config, model_and_variables=(model, variables))
    image = make_blob_image((96, 96), n_blobs=4)
    a = engine.infer(image)
    engine.update_params(
        inference_scale=1, label_divisor=1000, nms_threshold=0.9,
        nms_kernel=3, confidence_thr=0.99, fine_boundaries=False,
    )
    b = engine.infer(image)
    assert b.shape == a.shape
    # near-impossible thresholds must not segment more than defaults did
    assert (b > 0).sum() <= (a > 0).sum()
