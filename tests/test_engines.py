"""Engine-layer tests: render engine contract, median queue semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.engine import (
    MedianQueue,
    PanopticDeepLabRenderEngine,
    PanopticDeepLabRenderEngine3d,
)
from empanada_tpu.models import create_model


@pytest.fixture(scope="module")
def small_pr_model():
    model = create_model(
        "PanopticDeepLabPR", encoder="resnet18", num_classes=1,
        decoder_channels=32, low_level_channels_project=(16, 8, 4),
        subdivision_num_points=256,
    )
    x = jnp.zeros((1, 64, 64, 1))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, x, train=False
    )
    return model, variables


class TestMedianQueue:
    def test_semantics(self):
        q = MedianQueue(3)
        outs = []
        for i in range(5):
            q.enqueue({"sem": jnp.full((1, 4, 4, 1), float(i)), "i": i})
            outs.append(q.get_next(["sem"]))
        # first: passthrough (queue len 1 <= mid 1)
        assert outs[0]["i"] == 0
        # second: building -> None
        assert outs[1] is None
        # third onward: middle element with median probs
        assert outs[2]["i"] == 1
        assert float(outs[2]["sem"][0, 0, 0, 0]) == 1.0  # median(0,1,2)
        assert outs[3]["i"] == 2
        assert outs[4]["i"] == 3
        # drain
        tail = q.end()
        assert [t["i"] for t in tail] == [4]


class TestRenderEngine:
    def test_2d_shapes_and_types(self, small_pr_model, blob_image_2d):
        model, variables = small_pr_model
        engine = PanopticDeepLabRenderEngine(
            model, variables, thing_list=[1], label_divisor=1000,
            padding_factor=16, coarse_boundaries=True, max_centers=64,
        )
        img = (blob_image_2d[:60, :50] / 255.0).astype(np.float32)
        pan = engine(img, size=img.shape, upsampling=1)
        assert pan.shape == img.shape
        assert pan.dtype == np.int32
        assert set(np.unique(pan)) <= set(range(0, 2001))

    def test_2d_upsampling(self, small_pr_model, blob_image_2d):
        model, variables = small_pr_model
        engine = PanopticDeepLabRenderEngine(
            model, variables, thing_list=[1], padding_factor=16,
            coarse_boundaries=True, max_centers=64,
        )
        img = (blob_image_2d[:32, :32] / 255.0).astype(np.float32)
        # upsampling=2: output should be at 2x input resolution
        pan = engine(img, size=(64, 64), upsampling=2)
        assert pan.shape == (64, 64)

    def test_3d_stack(self, small_pr_model, blob_volume_3d):
        model, variables = small_pr_model
        engine = PanopticDeepLabRenderEngine3d(
            model, variables, thing_list=[1], median_kernel_size=3,
            padding_factor=16, coarse_boundaries=True, max_centers=64,
        )
        vol = (blob_volume_3d[:6] / 255.0).astype(np.float32)
        outs = []
        for i in range(len(vol)):
            pan = engine(vol[i], size=vol[i].shape[-2:])
            if pan is not None:
                outs.append(pan)
        outs.extend(engine.end())
        # one output per input slice after draining
        assert len(outs) == len(vol)
        assert all(o.shape == vol[0].shape for o in outs)


class TestBCEngine:
    def test_bc_2d_and_3d(self, blob_volume_3d):
        from empanada_tpu.engine import BCEngine, BCEngine3d
        from empanada_tpu.stitch import bc_watershed

        model = create_model(
            "PanopticDeepLabBC", encoder="resnet18", num_classes=1,
            decoder_channels=32, low_level_channels_project=(16, 8, 4),
            subdivision_num_points=128,
        )
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 1)), train=False
        )
        eng = BCEngine(model, variables)
        img = (blob_volume_3d[0, :64, :64] / 255.0).astype(np.float32)
        bc = eng(img)
        assert bc.shape == (64, 64, 2)
        assert 0.0 <= float(bc.min()) and float(bc.max()) <= 1.0

        eng3 = BCEngine3d(model, variables, median_kernel_size=3, padding_factor=16)
        outs = []
        vol = (blob_volume_3d[:4, :64, :64] / 255.0).astype(np.float32)
        for i in range(len(vol)):
            out = eng3(vol[i], size=(64, 64))
            if out is not None:
                outs.append(out)
        outs.extend(eng3.end())
        assert len(outs) == len(vol)
        # the full BC volume feeds the offline watershed
        bc_vol = np.stack(outs).transpose(3, 0, 1, 2)  # (2, Z, H, W)
        seg = bc_watershed((bc_vol * 255).astype(np.uint8), seed_thres=0, min_size=0)
        assert seg.shape == vol.shape


def test_3d_varying_slice_sizes_crop_with_middle_size(small_pr_model):
    """The median queue returns the MIDDLE slice's outputs; the crop must use
    that slice's recorded size, not the current call's (sizes may vary)."""
    import numpy as np

    model, variables = small_pr_model
    engine = PanopticDeepLabRenderEngine3d(
        model, variables, thing_list=[1], median_kernel_size=3,
        padding_factor=16, coarse_boundaries=True, max_centers=64,
    )
    rng = np.random.default_rng(0)
    # sizes differ but share the factor-16 padded shape (48, 48): the median
    # window can stack them, and the crop must still follow each item's size
    sizes = [(48, 48), (48, 48), (40, 44), (40, 44), (33, 47)]
    outs = []
    for s in sizes:
        img = rng.random(s, dtype=np.float32)
        pan = engine(img, size=s)
        if pan is not None:
            outs.append(pan)
    outs.extend(engine.end())
    assert [o.shape for o in outs] == sizes
