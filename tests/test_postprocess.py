"""Panoptic post-processing tests.

Each jitted op is compared against a tiny numpy oracle implementing the
reference semantics (empanada/inference/postprocess.py): threshold+maxpool
NMS, nearest-center grouping, majority-vote class assignment with per-class
sequential renumbering, and stuff-area filtering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.ops import postprocess as pp


def oracle_nms(hmp, threshold, kernel):
    """Scanline-ordered center list via threshold + sliding max equality."""
    h, w = hmp.shape
    t = np.where(hmp > threshold, hmp, -1.0)
    r = kernel // 2
    padded = np.pad(t, r, constant_values=-np.inf)
    centers = []
    for y in range(h):
        for x in range(w):
            window = padded[y : y + kernel, x : x + kernel]
            if t[y, x] > 0 and t[y, x] == window.max():
                centers.append((y, x))
    return centers


def oracle_group(centers, offsets, step=1):
    """Nearest offset-shifted center per pixel (1-based ids)."""
    h, w = offsets.shape[1:]
    ids = np.zeros((h, w), dtype=np.int64)
    cy = np.array([c[0] for c in centers]) * step
    cx = np.array([c[1] for c in centers]) * step
    for y in range(h):
        for x in range(w):
            ly = y * step + offsets[0, y, x]
            lx = x * step + offsets[1, y, x]
            d2 = (cy - ly) ** 2 + (cx - lx) ** 2
            ids[y, x] = 1 + int(np.argmin(d2))
    return ids


def oracle_merge(sem, ins, label_divisor, thing_list, stuff_area, void_label):
    """Reference merge_semantic_and_instance semantics."""
    pan = np.full_like(sem, void_label)
    thing_seg = ins > 0
    sem_thing = np.isin(sem, thing_list)
    class_tracker = {}
    for ins_id in np.unique(ins):
        if ins_id == 0:
            continue
        mask = (ins == ins_id) & sem_thing
        if mask.sum() == 0:
            continue
        vals, counts = np.unique(sem[mask], return_counts=True)
        # torch.mode picks the smallest among ties
        class_id = vals[counts == counts.max()].min()
        new_id = class_tracker.get(class_id, 1)
        class_tracker[class_id] = new_id + 1
        pan[mask] = class_id * label_divisor + new_id
    for class_id in np.unique(sem):
        if class_id in thing_list:
            continue
        mask = (sem == class_id) & (~thing_seg)
        if mask.sum() >= stuff_area:
            pan[mask] = class_id * label_divisor
    return pan


class TestFactorPad:
    def test_pads_up(self):
        x = jnp.ones((1, 30, 50, 1))
        out = pp.factor_pad(x, 16)
        assert out.shape == (1, 32, 64, 1)
        assert float(out[0, 31, 0, 0]) == 0.0

    def test_noop(self):
        x = jnp.ones((1, 32, 32, 1))
        assert pp.factor_pad(x, 16).shape == (1, 32, 32, 1)


class TestFindInstanceCenter:
    def test_matches_oracle(self, rng):
        hmp = rng.random((24, 24)).astype(np.float32) ** 4
        want = oracle_nms(hmp, 0.1, 7)
        centers, valid = jax.jit(pp.find_instance_center, static_argnames=("threshold", "nms_kernel", "max_centers"))(
            jnp.asarray(hmp)[None, :, :, None], threshold=0.1, nms_kernel=7, max_centers=64
        )
        got = [tuple(map(int, c)) for c, v in zip(np.asarray(centers), np.asarray(valid)) if v]
        assert got == want

    def test_no_centers(self):
        hmp = jnp.zeros((1, 16, 16, 1))
        _, valid = pp.find_instance_center(hmp, max_centers=8)
        assert not bool(valid.any())

    def test_overflow_count(self):
        """The static max_centers cap must be detectable: the reference has
        no cap (unbounded torch.nonzero), so silent truncation would be a
        real divergence on crowded slices."""
        # 25 isolated peaks on a grid, cap at 16 -> 9 dropped
        hmp = np.zeros((40, 40), np.float32)
        for y in range(4, 40, 8):
            for x in range(4, 40, 8):
                hmp[y, x] = 0.9
        centers, valid, n_peaks = pp.find_instance_center(
            jnp.asarray(hmp)[None, :, :, None], threshold=0.1, nms_kernel=3,
            max_centers=16, return_count=True,
        )
        assert int(n_peaks) == 25 and int(valid.sum()) == 16

        cells, n_over = pp.get_instance_cells(
            jnp.asarray(hmp)[None, :, :, None],
            jnp.zeros((1, 40, 40, 2)), coarse_boundaries=False,
            threshold=0.1, nms_kernel=3, max_centers=16,
            return_overflow=True,
        )
        assert int(n_over) == 9
        # no overflow when the cap is large enough
        _, n_over2 = pp.get_instance_cells(
            jnp.asarray(hmp)[None, :, :, None],
            jnp.zeros((1, 40, 40, 2)), coarse_boundaries=False,
            threshold=0.1, nms_kernel=3, max_centers=32,
            return_overflow=True,
        )
        assert int(n_over2) == 0


class TestGroupPixels:
    def test_matches_oracle(self, rng):
        h = w = 20
        centers_list = [(3, 4), (10, 15), (17, 2)]
        offsets = rng.normal(0, 2, size=(2, h, w)).astype(np.float32)
        want = oracle_group(centers_list, offsets, step=1)

        k = 8
        centers = np.zeros((k, 2), np.float32)
        valid = np.zeros((k,), bool)
        for i, c in enumerate(centers_list):
            centers[i] = c
            valid[i] = True
        got = pp.group_pixels(
            jnp.asarray(centers), jnp.asarray(valid),
            jnp.asarray(offsets.transpose(1, 2, 0))[None], step=1, pixel_chunk=64,
        )
        assert np.array_equal(np.asarray(got)[0], want)

    def test_step4(self, rng):
        h = w = 8
        centers_list = [(1, 1), (6, 5)]
        offsets = rng.normal(0, 1, size=(2, h, w)).astype(np.float32)
        want = oracle_group(centers_list, offsets, step=4)
        centers = np.array(centers_list, np.float32)
        valid = np.ones((2,), bool)
        got = pp.group_pixels(
            jnp.asarray(centers), jnp.asarray(valid),
            jnp.asarray(offsets.transpose(1, 2, 0))[None], step=4, pixel_chunk=32,
        )
        assert np.array_equal(np.asarray(got)[0], want)


class TestMerge:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        h = w = 32
        num_classes = 4
        thing_list = (1, 3)
        sem = rng.integers(0, num_classes, (h, w)).astype(np.int32)
        cells = rng.integers(0, 6, (h, w)).astype(np.int32)
        sem_thing = np.isin(sem, thing_list)
        ins = np.where(sem_thing, cells, 0)

        want = oracle_merge(sem, ins, 100, thing_list, stuff_area=30, void_label=0)
        got = jax.jit(
            pp.merge_semantic_and_instance,
            static_argnames=("label_divisor", "thing_list", "stuff_area", "void_label", "num_classes", "max_centers"),
        )(
            jnp.asarray(sem)[None], jnp.asarray(ins)[None],
            label_divisor=100, thing_list=thing_list, stuff_area=30,
            void_label=0, num_classes=num_classes, max_centers=8,
        )
        assert np.array_equal(np.asarray(got)[0], want)

    def test_stuff_area_filter(self):
        sem = np.zeros((8, 8), np.int32)
        sem[:2, :2] = 2  # 4 pixels of stuff class 2
        ins = np.zeros_like(sem)
        got = pp.merge_semantic_and_instance(
            jnp.asarray(sem)[None], jnp.asarray(ins)[None],
            label_divisor=100, thing_list=(1,), stuff_area=5, void_label=7,
            num_classes=3, max_centers=4,
        )
        got = np.asarray(got)[0]
        # area 4 < 5 -> class 2 filtered to void; background area large -> 0
        assert (got[:2, :2] == 7).all()
        assert (got[2:, 2:] == 0).all()


class TestMergeCoarse:
    @pytest.mark.parametrize("seed,step", [(0, 4), (1, 4), (2, 8), (3, 1)])
    def test_matches_dense_merge(self, seed, step):
        """Fused coarse merge == dense merge on block-replicated cells for
        every (instance, class) layout — the exactness contract that lets
        the engines route through the 16x-cheaper kernel."""
        rng = np.random.default_rng(seed)
        hc = wc = 8
        h, w = hc * step, wc * step
        num_classes = 4
        thing_list = (1, 3)
        sem = rng.integers(0, num_classes, (h, w)).astype(np.int32)
        cells_c = rng.integers(0, 6, (hc, wc)).astype(np.int32)
        cells = np.kron(cells_c, np.ones((step, step), np.int32))
        ins = np.where(np.isin(sem, thing_list), cells, 0)

        want = pp.merge_semantic_and_instance(
            jnp.asarray(sem)[None], jnp.asarray(ins)[None],
            label_divisor=100, thing_list=thing_list, stuff_area=30,
            void_label=7, num_classes=num_classes, max_centers=8,
        )
        got = jax.jit(
            pp.merge_semantic_and_instance_coarse,
            static_argnames=("label_divisor", "thing_list", "stuff_area",
                             "void_label", "num_classes", "max_centers",
                             "step"),
        )(
            jnp.asarray(sem)[None], jnp.asarray(cells_c)[None],
            label_divisor=100, thing_list=thing_list, stuff_area=30,
            void_label=7, num_classes=num_classes, max_centers=8, step=step,
        )
        assert np.array_equal(np.asarray(got), np.asarray(want))


class TestFullPipeline:
    def test_two_blobs(self):
        """Synthetic two-instance case: centers + offsets pointing at them."""
        h = w = 32
        sem = np.zeros((h, w), np.int32)
        sem[4:14, 4:14] = 1
        sem[18:28, 18:28] = 1
        hmp = np.zeros((h, w), np.float32)
        hmp[9, 9] = 0.9
        hmp[23, 23] = 0.9
        offsets = np.zeros((h, w, 2), np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        m1 = (yy < 16)
        offsets[..., 0] = np.where(m1, 9 - yy, 23 - yy)
        offsets[..., 1] = np.where(m1, 9 - xx, 23 - xx)

        pan = pp.get_panoptic_segmentation(
            jnp.asarray(sem)[None], jnp.asarray(hmp)[None, :, :, None],
            jnp.asarray(offsets)[None],
            thing_list=(1,), label_divisor=1000, stuff_area=64, void_label=0,
            threshold=0.1, nms_kernel=7, num_classes=2, max_centers=16,
        )
        pan = np.asarray(pan)[0]
        assert set(np.unique(pan)) == {0, 1001, 1002}
        assert (pan[4:14, 4:14] == 1001).all()
        assert (pan[18:28, 18:28] == 1002).all()


def test_bucket_dim_ladder():
    from empanada_tpu.ops.postprocess import bucket_dim

    assert bucket_dim(1, 128) == 128
    assert bucket_dim(128, 128) == 128
    assert bucket_dim(129, 128) == 256
    assert bucket_dim(520, 128) == 640    # 5 * 128
    assert bucket_dim(130, 16) == 160     # 10 * 16 (m=9 -> 10)
    assert bucket_dim(16 * 200, 16) == 16 * 208  # beyond ladder: ceil to 16s
    # monotone, and never more than ~34% overhead within the ladder
    prev = 0
    for n in range(1, 4000, 37):
        b = bucket_dim(n, 16)
        assert b >= n and b >= prev and b <= int(n * 1.34) + 16
        prev = b


def test_factor_pad_buckets():
    from empanada_tpu.ops.postprocess import factor_pad

    x = jnp.ones((1, 130, 150, 1))
    assert factor_pad(x, 16).shape == (1, 144, 160, 1)
    assert factor_pad(x, 16, buckets=True).shape == (1, 160, 160, 1)


def test_find_instance_center_small_map():
    """Heatmaps with fewer pixels than max_centers (thin ortho slices) must
    not crash and must keep static (K, 2)/(K,) output shapes."""
    from empanada_tpu.ops.postprocess import find_instance_center

    hmp = jnp.zeros((1, 4, 8, 1)).at[0, 2, 5, 0].set(0.9)
    centers, valid = jax.jit(
        find_instance_center, static_argnames=("threshold", "nms_kernel", "max_centers")
    )(hmp, threshold=0.1, nms_kernel=3, max_centers=256)
    assert centers.shape == (256, 2) and valid.shape == (256,)
    assert int(valid.sum()) == 1
    assert tuple(np.asarray(centers[0], int)) == (2, 5)


class TestLogitSpaceHardening:
    """Round-5 exactness claims: hardening and the median may run in logit
    space without ever materializing probabilities (ops/postprocess.py
    harden_logits / to_median_space / harden_median_space)."""

    def test_harden_logits_equals_prob_path_binary(self):
        rng = np.random.default_rng(0)
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.normal(0, 2, (2, 33, 17, 1)), dtype)
            for thr in (0.5, 0.3, 0.9):
                a = np.asarray(pp.harden_logits(x, thr))
                b = np.asarray(pp.harden_seg(pp.logits_to_prob(x), thr))
                diff = a != b
                if dtype == jnp.float32:
                    assert not diff.any(), thr
                else:
                    # bf16 rounding places near-boundary pixels on the wrong
                    # side of the probability comparison (both the computed
                    # sigmoid and the threshold literal round); the logit
                    # path decides them the exact-arithmetic way, so any
                    # disagreement must sit within one bf16 ulp of the
                    # threshold (harden_logits docstring)
                    if diff.any():
                        prob = np.asarray(pp.logits_to_prob(x), np.float32)
                        band = np.abs(prob[..., 0][diff] - thr)
                        assert (band < 0.005).all(), (thr, band.max())

    def test_harden_logits_equals_prob_path_multiclass(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 2, (1, 9, 9, 4)), jnp.float32)
        a = pp.harden_logits(x)
        b = pp.harden_seg(pp.logits_to_prob(x))
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_median_space_binary_commutes(self):
        """Odd-window median is a per-pixel SELECTION, so medianing raw
        logits then hardening equals medianing sigmoid probabilities then
        hardening — bit-exact, the basis for the probability-free 3D
        pipeline."""
        rng = np.random.default_rng(2)
        stack = jnp.asarray(rng.normal(0, 2, (5, 1, 8, 8, 1)), jnp.bfloat16)
        med_logits = jnp.median(jnp.stack(
            [pp.to_median_space(s) for s in stack]), axis=0)
        med_probs = jnp.median(jnp.stack(
            [pp.logits_to_prob(s) for s in stack]), axis=0)
        a = pp.harden_median_space(med_logits, 0.5)
        b = pp.harden_seg(med_probs, 0.5)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_median_space_multiclass_keeps_probs(self):
        """Multiclass median does NOT commute through softmax (channels
        median independently) — to_median_space must return probabilities
        there, reproducing the reference's median-of-probs exactly."""
        rng = np.random.default_rng(3)
        stack = jnp.asarray(rng.normal(0, 2, (3, 1, 6, 6, 3)), jnp.float32)
        med = jnp.median(jnp.stack(
            [pp.to_median_space(s) for s in stack]), axis=0)
        ref = jnp.median(jnp.stack(
            [pp.logits_to_prob(s) for s in stack]), axis=0)
        assert np.allclose(np.asarray(med), np.asarray(ref))
        a = pp.harden_median_space(med, 0.5)
        b = pp.harden_seg(ref, 0.5)
        assert np.array_equal(np.asarray(a), np.asarray(b))
