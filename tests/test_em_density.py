"""EM-density cross-framework gates: the O(100)-instances-per-512²-slice
regime the 5-blob/96² parity fixtures never reach.

This is the regime that actually stresses the static-shape design choices —
the ``max_centers`` cap (must fit the workload with zero dropped centers),
the sparse bipartite matcher decomposition, and run-based connected
components — against the reference's dynamic-shape pipeline (which has no
cap and no decomposition to get wrong).  Gate shape mirrors the reference's
golden protocol (/root/reference/tests/conftest.py:69-122: ~150k labeled
pixels, 10-bin histograms) but permutation-invariant (instance F1 + size
distribution), since cross-framework label numbering is arbitrary.

Shares the weight-ported model and reference-pipeline drivers with
tests/test_e2e_cross_parity.py."""

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

from conftest import make_blob_image  # noqa: E402

import empanada_tpu.api as api  # noqa: E402
from empanada_tpu.models import create_model  # noqa: E402
from empanada_tpu.port import port_state_dict  # noqa: E402

from test_e2e_cross_parity import (  # noqa: E402
    ENGINE_KW,
    LABEL_DIVISOR,
    LABELS,
    MODEL_KW,
    NORMS,
    THING_LIST,
    _randomize_bn,
    _torch_slice,
    ref_infer_on_axis,
    tracker_to_dense,
)

from empanada.inference.engines import (  # noqa: E402
    PanopticDeepLabRenderEngine,
)
from empanada.inference.rle import (  # noqa: E402
    pan_seg_to_rle_seg,
    rle_seg_to_pan_seg,
)

SIZE = (512, 512)
N_SLICES = 10
MAX_CENTERS = 2048  # sized to the workload; gates assert zero drops
MIN_INSTANCES_2D = 100  # the density this tier exists to validate

pytestmark = pytest.mark.slow


def _matched_voxel_fraction(a, b, iou_thr=0.5):
    """Fraction of A's labeled voxels lying in instances that have an
    IoU >= ``iou_thr`` counterpart in B (matches at IoU >= 0.5 are
    automatically one-to-one)."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    sa = np.bincount(a)
    sb = np.bincount(b)
    mask = (a > 0) & (b > 0)
    pair_key = a[mask].astype(np.int64) * (int(b.max()) + 1) + b[mask]
    keys, inter = np.unique(pair_key, return_counts=True)
    ia = keys // (int(b.max()) + 1)
    ib = keys % (int(b.max()) + 1)
    iou = inter / (sa[ia] + sb[ib] - inter)
    matched_ids = np.unique(ia[iou >= iou_thr])
    return float(sa[matched_ids].sum() / max(1, sa[1:].sum()))


def assert_agreement_dense(ref_vol, our_vol, f1_floor=0.85, tol=0.10):
    """Dense-regime agreement gate.

    The sparse-fixture gate (test_e2e_cross_parity.assert_agreement) zips
    sorted instance sizes pairwise and demands count-F1 >= 0.95 — right at
    5 blobs, wrong at ~200 instances/slice of a RANDOM-WEIGHT fixture.
    Stage-by-stage comparison on identical inputs shows every kernel agrees
    bit-for-bit with the reference (center NMS survivor sets, pixel
    grouping at step 1 and step 4: zero differing pixels); the residual
    disagreement is each framework's own forward drift (~1e-2 on logits,
    XLA vs torch op ordering) flipping Voronoi assignments of borderline
    quarter-res pixels — random weights make offsets near-flat, so a tail
    of tiny satellite fragments flips per run.  Count-F1 punishes each
    4-48 px satellite as hard as a real instance; voxel-weighted matching
    is the honest metric: a real matcher/grouping regression drags it down
    (every voxel miscounted), satellites cannot (they are ~0.5% of mass).

    Gates: >= 98% of labeled voxels on BOTH sides in 1:1 IoU>=0.5 matched
    instances, matched IoU >= 0.85, pixel count within 10%, count-F1 floor
    as a sanity rail, and a 10-bin log-size histogram over the >=64 px
    population (the dense analog of the reference's 10-bin goldens,
    /root/reference/tests/conftest.py:69-122)."""
    from empanada_tpu.curation.accuracy import compute_instance_metrics

    ref_nz = int((ref_vol > 0).sum())
    our_nz = int((our_vol > 0).sum())
    assert ref_nz > 0, "reference produced empty segmentation (vacuous gate)"
    assert abs(our_nz - ref_nz) <= tol * ref_nz, (our_nz, ref_nz)

    m = compute_instance_metrics(ref_vol, our_vol, iou_thr=0.5)
    assert m["f1"] >= f1_floor, m
    assert m["mean_matched_iou"] >= 0.85, m

    frac_ref = _matched_voxel_fraction(ref_vol, our_vol)
    frac_our = _matched_voxel_fraction(our_vol, ref_vol)
    assert frac_ref >= 0.98, f"only {frac_ref:.4f} of reference voxels matched"
    assert frac_our >= 0.98, f"only {frac_our:.4f} of our voxels matched"

    # count + distribution over instances above the noise floor (0.1% of
    # labeled mass — mass-relative so it scales from a 512² slice to a 3D
    # stack, where each satellite persists across slices): the flipped
    # satellites are individually tiny; F1/voxel gates above already score
    # them, the distribution gate shouldn't re-count coin flips
    min_size = max(64, int(1e-3 * ref_nz))
    ref_sizes = np.bincount(ref_vol[ref_vol > 0])
    our_sizes = np.bincount(our_vol[our_vol > 0])
    ref_sizes = ref_sizes[ref_sizes >= min_size]
    our_sizes = our_sizes[our_sizes >= min_size]
    assert abs(len(ref_sizes) - len(our_sizes)) <= max(2, 0.05 * len(ref_sizes)), (
        len(ref_sizes), len(our_sizes),
    )
    lo = 0.0
    hi = np.log10(max(ref_sizes.max(), our_sizes.max()) + 1.0)
    bins = np.logspace(lo, hi, 11)
    ref_hist, _ = np.histogram(ref_sizes, bins=bins)
    our_hist, _ = np.histogram(our_sizes, bins=bins)
    for i, (r, o) in enumerate(zip(ref_hist, our_hist)):
        assert abs(int(o) - int(r)) <= max(3, tol * int(r)), (
            i, ref_hist.tolist(), our_hist.tolist(),
        )


@pytest.fixture(scope="module")
def models():
    """Same construction as the parity suite's fixture (random weights,
    sharpened BN), ported once and shared across this module."""
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
    return np.stack([
        make_blob_image(SIZE, n_blobs=150, seed=100 + s) for s in range(N_SLICES)
    ])


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


class TestEMDensity2d:
    def test_2d_render_pipeline_dense(self, models, model_config):
        tmodel, fmodel, variables = models
        image = make_blob_image(SIZE, n_blobs=150, seed=77)

        engine = PanopticDeepLabRenderEngine(
            tmodel, thing_list=THING_LIST, **ENGINE_KW
        )
        with torch.no_grad():
            pan = engine(_torch_slice(image), image.shape, 1).squeeze().numpy()
        rle_seg = pan_seg_to_rle_seg(
            pan, LABELS, LABEL_DIVISOR, THING_LIST, force_connected=True
        )
        ref_pan = rle_seg_to_pan_seg(rle_seg, image.shape).astype(np.int64)

        ours = api.Engine2d(
            model_config, nms_threshold=0.1, nms_kernel=3, confidence_thr=0.3,
            label_divisor=LABEL_DIVISOR, max_centers=MAX_CENTERS,
            model_and_variables=(fmodel, variables),
        )
        our_pan = ours.infer(image)
        assert ours.last_overflow == 0, (
            f"max_centers={MAX_CENTERS} undersized for this fixture "
            f"(dropped {ours.last_overflow}) — the gate would compare "
            "degraded output"
        )

        ref_ins = np.where(
            (ref_pan >= LABEL_DIVISOR) & (ref_pan < 2 * LABEL_DIVISOR), ref_pan, 0
        )
        our_ins = np.where(
            (our_pan >= LABEL_DIVISOR) & (our_pan < 2 * LABEL_DIVISOR), our_pan, 0
        )
        n_ref = len(np.unique(ref_ins)) - 1
        assert n_ref >= MIN_INSTANCES_2D, (
            f"fixture produced only {n_ref} reference instances — not the "
            "EM-density regime this tier exists for"
        )
        assert_agreement_dense(ref_ins, our_ins)


class TestEMDensity3d:
    def test_3d_xy_stack_dense(self, models, volume, model_config):
        tmodel, fmodel, variables = models

        ref_trackers = ref_infer_on_axis(tmodel, volume, "xy")
        ref_vol = tracker_to_dense(ref_trackers[0], volume.shape)

        eng = api.Engine3d(
            model_config, median_kernel_size=3, min_size=20,
            min_extent=1, max_centers=MAX_CENTERS, nms_kernel=3,
            nms_threshold=0.1, confidence_thr=0.3, label_divisor=LABEL_DIVISOR,
            model_and_variables=(fmodel, variables),
        )
        _, our_trackers = eng.infer_on_axis(volume, "xy")
        assert eng.last_overflow == 0, (
            f"max_centers={MAX_CENTERS} undersized (dropped "
            f"{eng.last_overflow})"
        )
        our_vol = tracker_to_dense(our_trackers[0], volume.shape)

        # 3D count is post-merge (cross-slice matching fuses per-slice
        # instances) and post-min_size; the per-slice matcher stress is the
        # 2D density asserted above, so the 3D floor is lower
        n_ref = len(np.unique(ref_vol)) - 1
        assert n_ref >= 60, (
            f"only {n_ref} reference 3D instances — below the density regime"
        )
        assert_agreement_dense(ref_vol, our_vol)
