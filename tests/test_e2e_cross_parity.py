"""END-TO-END cross-framework parity gate.

Runs the reference's FULL pipeline (torch ``PanopticDeepLabRenderEngine3d``
→ median queue → TorchScript postprocess → RLE matching → backward matching
→ trackers → filters → ortho consensus, all executed from /root/reference)
against ``empanada_tpu``'s full pipeline with the SAME ported weights on the
same blob fixtures, and asserts instance-level agreement: per-class instance
F1 >= 0.95 and label histograms within the reference's own +-10% gate shape
(/root/reference/tests/test_button_widgets.py:104-113,193-200,238-247).

The reference's numba/skimage/zarr dependencies are absent from this
environment; tests/_ref_shims provides pure-Python stand-ins (identity
``@numba.jit``, scipy-backed connected components) so the reference kernels
run as plain Python on these tiny fixtures.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "empanada")):
    pytest.skip("reference repo not mounted", allow_module_level=True)

_HERE = os.path.dirname(__file__)
for p in (os.path.join(_HERE, "_ref_shims"), REFERENCE, _HERE):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax

from conftest import make_blob_image

import empanada_tpu.api as api
from empanada_tpu.api.utils import Preprocessor
from empanada_tpu.curation.accuracy import compute_instance_metrics
from empanada_tpu.models import create_model
from empanada_tpu.port import port_state_dict

# reference imports (via shims)
from empanada.inference.engines import (  # noqa: E402
    PanopticDeepLabRenderEngine,
    PanopticDeepLabRenderEngine3d,
)
from empanada.inference.matcher import RLEMatcher  # noqa: E402
from empanada.inference.tracker import InstanceTracker  # noqa: E402
from empanada.inference.rle import (  # noqa: E402
    pan_seg_to_rle_seg,
    rle_seg_to_pan_seg,
)
from empanada.inference.patterns import (  # noqa: E402
    apply_matchers,
    backward_matching,
    create_instance_consensus,
    finish_tracking,
    update_trackers,
)
from empanada.inference import filters as ref_filters  # noqa: E402

LABEL_DIVISOR = 1000
LABELS = [1]
THING_LIST = [1]
NORMS = {"mean": 0.5, "std": 0.29}
ENGINE_KW = dict(
    label_divisor=LABEL_DIVISOR,
    stuff_area=64,
    void_label=0,
    nms_threshold=0.1,
    nms_kernel=3,
    confidence_thr=0.3,
    padding_factor=16,
    coarse_boundaries=True,
)
MERGE_IOU_THR = 0.25
MERGE_IOA_THR = 0.25
MIN_SIZE = 20
MIN_EXTENT = 1

MODEL_KW = dict(
    encoder="resnet50",
    num_classes=1,
    stage4_stride=16,
    decoder_channels=32,
    low_level_stages=[1],
    low_level_channels_project=[16],
    atrous_rates=[2, 4, 6],
    aspp_dropout=0.0,
    ins_decoder=True,
    ins_ratio=0.5,
    num_fc=3,
    train_num_points=64,
    oversample_ratio=3,
    importance_sample_ratio=0.75,
    subdivision_steps=2,
    subdivision_num_points=256,
)


def _randomize_bn(tmodel, seed=3):
    """Random-init weights produce near-constant outputs (ctr_hmp never
    crosses nms_threshold -> empty segmentation -> vacuous gate).  Sharpen
    BN stats and scale the semantic head so outputs vary spatially: ~25
    NMS centers and sem prob spanning both sides of confidence_thr on the
    blob fixture."""
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g))
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.45 + 0.05
            )
    with torch.no_grad():
        for p in tmodel.semantic_head.parameters():
            p.mul_(8.0)


@pytest.fixture(scope="module")
def models():
    """Reference torch model + empanada_tpu model with the SAME weights.

    The reference's RenderEngine calls ``model(image, render_steps,
    interpolate_ins)`` — the signature of the deployed Quantizable/TorchScript
    models (quantization/panoptic_deeplab.py:238), so that's the variant we
    build (fp32, quantize=False; Identity quant stubs)."""
    from empanada.models.quantization import (
        QuantizablePanopticDeepLabPR as TorchPR,
    )

    torch.manual_seed(99)
    tmodel = TorchPR(**MODEL_KW, quantize=False).eval()
    _randomize_bn(tmodel)
    variables = port_state_dict(tmodel.state_dict(), "PanopticDeepLabPR", MODEL_KW)
    fkw = {k: v for k, v in MODEL_KW.items() if k != "subdivision_steps"}
    fmodel = create_model("PanopticDeepLabPR", **fkw)
    return tmodel, fmodel, variables


@pytest.fixture(scope="module")
def volume():
    return np.stack(
        [make_blob_image((96, 96), n_blobs=5, seed=s) for s in range(16)]
    )


@pytest.fixture(scope="module")
def model_config():
    return {
        "class_names": {1: "mito"},
        "labels": LABELS,
        "thing_list": THING_LIST,
        "model": "x",
        "padding_factor": 16,
        "norms": NORMS,
    }


def _prep(image2d):
    """Identical preprocessing for both frameworks (our Preprocessor)."""
    return Preprocessor(**NORMS)(image2d)["image"]  # (1, H, W) float


def _torch_slice(image2d):
    return torch.from_numpy(np.ascontiguousarray(_prep(image2d)[None]))  # (1,1,H,W)


def _take(volume, i, axis):
    return np.take(volume, i, axis)


def ref_infer_on_axis(tmodel, volume, axis_name):
    """The reference Engine3d.infer_on_axis flow, run synchronously
    (reference empanada_napari/inference.py:491-570 without mp.Queue)."""
    axis = {"xy": 0, "xz": 1, "yz": 2}[axis_name]
    engine = PanopticDeepLabRenderEngine3d(
        tmodel, thing_list=THING_LIST, median_kernel_size=3, **ENGINE_KW
    )
    matchers = [
        RLEMatcher(tc, LABEL_DIVISOR, MERGE_IOU_THR, MERGE_IOA_THR)
        for tc in THING_LIST
    ]
    trackers = [
        InstanceTracker(cl, LABEL_DIVISOR, volume.shape, axis_name) for cl in LABELS
    ]
    rle_stack = []

    def handle(pan_seg):
        pan_seg = pan_seg.squeeze().numpy()
        rle_seg = pan_seg_to_rle_seg(
            pan_seg, LABELS, LABEL_DIVISOR, THING_LIST, force_connected=True
        )
        rle_stack.append(apply_matchers(rle_seg, matchers))

    with torch.no_grad():
        for i in range(volume.shape[axis]):
            image2d = _take(volume, i, axis)
            pan = engine(_torch_slice(image2d), image2d.shape, 1)
            if pan is not None:
                handle(pan)
        for pan in engine.end(1):
            handle(pan)

    for index, rle_seg in backward_matching(rle_stack, matchers, volume.shape[axis]):
        update_trackers(rle_seg, index, trackers)
    finish_tracking(trackers)
    for tr in trackers:
        ref_filters.remove_small_objects(tr, min_size=MIN_SIZE)
        ref_filters.remove_pancakes(tr, min_span=MIN_EXTENT)
    return trackers


def tracker_to_dense(tracker, shape):
    """Densify a finished tracker's 3D RLE instances (1..N relabel)."""
    vol = np.zeros(int(np.prod(shape)), np.int32)
    for new_id, attrs in enumerate(tracker.instances.values(), 1):
        for s, r in zip(np.asarray(attrs["starts"]), np.asarray(attrs["runs"])):
            vol[s : s + r] = new_id
    return vol.reshape(shape)


def assert_agreement(ref_vol, our_vol, f1_thr=0.95, tol=0.10):
    """Instance-level agreement between the two frameworks' outputs.

    The reference's golden gate compares 10-bin histograms of label VALUES
    (test_button_widgets.py:104-113) — valid within one deterministic
    pipeline, but cross-framework label numbering is arbitrary, so the
    permutation-invariant analog is used: per-class instance F1, matched
    IoU, pixel counts, and sorted instance-size distribution (each entry
    within +-10% or 50 px of its counterpart)."""
    ref_nz = int((ref_vol > 0).sum())
    our_nz = int((our_vol > 0).sum())
    assert ref_nz > 0, "reference produced empty segmentation (vacuous gate)"
    assert abs(our_nz - ref_nz) <= tol * ref_nz, (our_nz, ref_nz)

    m = compute_instance_metrics(ref_vol, our_vol, iou_thr=0.5)
    assert m["f1"] >= f1_thr, m
    assert m["mean_matched_iou"] >= 0.85, m

    ref_sizes = np.sort(np.bincount(ref_vol[ref_vol > 0]))[::-1]
    our_sizes = np.sort(np.bincount(our_vol[our_vol > 0]))[::-1]
    ref_sizes = ref_sizes[ref_sizes > 0]
    our_sizes = our_sizes[our_sizes > 0]
    assert abs(len(ref_sizes) - len(our_sizes)) <= max(1, tol * len(ref_sizes)), (
        len(ref_sizes), len(our_sizes),
    )
    for rs, os_ in zip(ref_sizes, our_sizes):
        assert abs(int(os_) - int(rs)) <= max(50, tol * int(rs)), (
            ref_sizes.tolist(), our_sizes.tolist(),
        )


class TestCross2d:
    def test_2d_render_pipeline(self, models):
        """Reference RenderEngine + force-connected relabel vs our Engine2d."""
        tmodel, fmodel, variables = models
        image = make_blob_image((96, 96), n_blobs=6, seed=11)

        engine = PanopticDeepLabRenderEngine(
            tmodel, thing_list=THING_LIST, **ENGINE_KW
        )
        with torch.no_grad():
            pan = engine(_torch_slice(image), image.shape, 1).squeeze().numpy()
        rle_seg = pan_seg_to_rle_seg(
            pan, LABELS, LABEL_DIVISOR, THING_LIST, force_connected=True
        )
        ref_pan = rle_seg_to_pan_seg(rle_seg, image.shape).astype(np.int64)

        cfg = {
            "class_names": {1: "mito"}, "labels": LABELS, "thing_list": THING_LIST,
            "model": "x", "padding_factor": 16, "norms": NORMS,
        }
        ours = api.Engine2d(
            cfg, nms_threshold=0.1, nms_kernel=3, confidence_thr=0.3,
            label_divisor=LABEL_DIVISOR, max_centers=64,
            model_and_variables=(fmodel, variables),
        )
        our_pan = ours.infer(image)

        # compare instance identity within the thing-class id range
        ref_ins = np.where(
            (ref_pan >= LABEL_DIVISOR) & (ref_pan < 2 * LABEL_DIVISOR), ref_pan, 0
        )
        our_ins = np.where(
            (our_pan >= LABEL_DIVISOR) & (our_pan < 2 * LABEL_DIVISOR), our_pan, 0
        )
        assert_agreement(ref_ins, our_ins)


class TestCross3dStack:
    def test_3d_xy_stack(self, models, volume, model_config):
        tmodel, fmodel, variables = models

        ref_trackers = ref_infer_on_axis(tmodel, volume, "xy")
        ref_vol = tracker_to_dense(ref_trackers[0], volume.shape)

        eng = api.Engine3d(
            model_config, median_kernel_size=3, min_size=MIN_SIZE,
            min_extent=MIN_EXTENT, max_centers=64, nms_kernel=3,
            nms_threshold=0.1, confidence_thr=0.3, label_divisor=LABEL_DIVISOR,
            model_and_variables=(fmodel, variables),
        )
        _, our_trackers = eng.infer_on_axis(volume, "xy")
        our_vol = tracker_to_dense(our_trackers[0], volume.shape)

        assert_agreement(ref_vol, our_vol)


class TestCrossOrtho:
    def test_orthoplane_consensus(self, models, volume, model_config):
        tmodel, fmodel, variables = models

        ref_class_trackers = []
        for axis_name in ("xy", "xz", "yz"):
            ref_class_trackers.append(ref_infer_on_axis(tmodel, volume, axis_name)[0])
        ref_consensus = create_instance_consensus(
            ref_class_trackers, pixel_vote_thr=2, cluster_iou_thr=0.75, bypass=False
        )
        ref_filters.remove_small_objects(ref_consensus, min_size=MIN_SIZE)
        ref_filters.remove_pancakes(ref_consensus, min_span=MIN_EXTENT)
        ref_vol = tracker_to_dense(ref_consensus, volume.shape)

        eng = api.Engine3d(
            model_config, median_kernel_size=3, min_size=MIN_SIZE,
            min_extent=MIN_EXTENT, max_centers=64, nms_kernel=3,
            nms_threshold=0.1, confidence_thr=0.3, label_divisor=LABEL_DIVISOR,
            model_and_variables=(fmodel, variables),
        )
        all_trackers = eng.infer_orthoplane(volume)
        outs = list(
            api.tracker_consensus(
                all_trackers, None, model_config,
                label_divisor=LABEL_DIVISOR, pixel_vote_thr=2,
                cluster_iou_thr=0.75, min_size=MIN_SIZE, min_extent=MIN_EXTENT,
            )
        )
        cvol, class_name, instances = outs[0]
        assert class_name == "mito"
        our_vol = np.zeros(volume.shape, np.int32)
        flat = our_vol.reshape(-1)
        for new_id, attrs in enumerate(instances.values(), 1):
            for s, r in zip(np.asarray(attrs["starts"]), np.asarray(attrs["runs"])):
                flat[s : s + r] = new_id

        assert_agreement(ref_vol, our_vol)


class TestCrossWatershed:
    """BC family: the reference's bc_watershed (numba heap mask-watershed
    run as pure Python via the shims, watershed.py:129) vs ours on the same
    synthetic foreground/boundary probability volume."""

    @pytest.fixture(scope="class")
    def bc_volume(self):
        """Two touching spheres separated by a boundary ridge + one isolated
        sphere, as (2, Z, Y, X) uint8 probabilities."""
        z, y, x = np.mgrid[0:32, 0:48, 0:48]
        d1 = np.sqrt((z - 16) ** 2 + (y - 16) ** 2 + (x - 16) ** 2)
        d2 = np.sqrt((z - 16) ** 2 + (y - 16) ** 2 + (x - 34) ** 2)
        d3 = np.sqrt((z - 16) ** 2 + (y - 38) ** 2 + (x - 24) ** 2)
        fg = (d1 < 10) | (d2 < 10) | (d3 < 7)
        sem = np.where(fg, 250, 5).astype(np.uint8)
        # boundary ridge where the two spheres meet + thin shells
        ridge = (np.abs(d1 - d2) < 1.5) & fg
        shell = ((np.abs(d1 - 10) < 1.2) | (np.abs(d2 - 10) < 1.2)
                 | (np.abs(d3 - 7) < 1.2)) & fg
        cnt = np.where(ridge | shell, 240, 5).astype(np.uint8)
        return np.stack([sem, cnt])

    def test_bc_watershed_parity(self, bc_volume):
        from empanada.inference.watershed import bc_watershed as ref_bc
        from empanada_tpu.stitch.watershed import bc_watershed as our_bc

        ref_seg = ref_bc(bc_volume, use_mask_wts=True)
        our_seg = our_bc(bc_volume, use_mask_wts=True)

        ref_ids = np.unique(ref_seg[ref_seg > 0])
        assert len(ref_ids) >= 3, f"fixture too weak: {ref_ids}"
        m = compute_instance_metrics(
            ref_seg.astype(np.int64), our_seg.astype(np.int64), iou_thr=0.5
        )
        assert m["f1"] >= 0.95, m
        assert m["mean_matched_iou"] >= 0.85, m

class TestCrossMulticlass:
    """Multiclass (softmax/argmax + stuff classes) variant of the e2e gate:
    the single-class tests cover only the sigmoid/threshold path; this one
    exercises argmax hardening, per-class RLE separation, and the
    stuff-area filter cross-framework."""

    MC_MODEL_KW = dict(
        encoder="resnet50", num_classes=3, stage4_stride=16,
        decoder_channels=32, low_level_stages=[1],
        low_level_channels_project=[16], atrous_rates=[2, 4, 6],
        aspp_dropout=0.0, ins_decoder=True, ins_ratio=0.5, num_fc=3,
        train_num_points=64, oversample_ratio=3, importance_sample_ratio=0.75,
        subdivision_steps=2, subdivision_num_points=256,
    )
    MC_LABELS = [1, 2]
    MC_THINGS = [1]

    @pytest.fixture(scope="class")
    def mc_models(self):
        from empanada.models.quantization import (
            QuantizablePanopticDeepLabPR as TorchPR,
        )

        torch.manual_seed(7)
        tmodel = TorchPR(**self.MC_MODEL_KW, quantize=False).eval()
        _randomize_bn(tmodel, seed=5)
        variables = port_state_dict(
            tmodel.state_dict(), "PanopticDeepLabPR", self.MC_MODEL_KW
        )
        fkw = {k: v for k, v in self.MC_MODEL_KW.items() if k != "subdivision_steps"}
        fmodel = create_model("PanopticDeepLabPR", **fkw)
        return tmodel, fmodel, variables

    def test_2d_multiclass(self, mc_models):
        tmodel, fmodel, variables = mc_models
        image = make_blob_image((96, 96), n_blobs=7, seed=31)

        engine = PanopticDeepLabRenderEngine(
            tmodel, thing_list=self.MC_THINGS, **ENGINE_KW
        )
        with torch.no_grad():
            pan = engine(_torch_slice(image), image.shape, 1).squeeze().numpy()
        rle_seg = pan_seg_to_rle_seg(
            pan, self.MC_LABELS, LABEL_DIVISOR, self.MC_THINGS, force_connected=True
        )
        ref_pan = rle_seg_to_pan_seg(rle_seg, image.shape).astype(np.int64)

        cfg = {
            "class_names": {1: "mito", 2: "er"}, "labels": self.MC_LABELS,
            "thing_list": self.MC_THINGS, "model": "x", "padding_factor": 16,
            "norms": NORMS,
        }
        ours = api.Engine2d(
            cfg, nms_threshold=0.1, nms_kernel=3, confidence_thr=0.3,
            label_divisor=LABEL_DIVISOR, max_centers=64,
            model_and_variables=(fmodel, variables),
        )
        our_pan = ours.infer(image)

        # the thing class gates instance-level; the stuff class gates
        # pixel-level (its labels carry no instance identity)
        ref_things = np.where(
            (ref_pan >= LABEL_DIVISOR) & (ref_pan < 2 * LABEL_DIVISOR), ref_pan, 0
        )
        our_things = np.where(
            (our_pan >= LABEL_DIVISOR) & (our_pan < 2 * LABEL_DIVISOR), our_pan, 0
        )
        assert_agreement(ref_things, our_things)

        ref_stuff = (ref_pan >= 2 * LABEL_DIVISOR).astype(np.int64)
        our_stuff = (our_pan >= 2 * LABEL_DIVISOR).astype(np.int64)
        assert ref_stuff.sum() > 0, "stuff class empty (vacuous)"
        inter = np.logical_and(ref_stuff, our_stuff).sum()
        union = np.logical_or(ref_stuff, our_stuff).sum()
        assert inter / union >= 0.95, inter / union
