"""Fused PointRend subdivision (ops/pallas_pointrend.py, ops/select.py).

CPU tests run the Pallas kernel in interpreter mode against the XLA
dense-mask oracle; on TPU the same assertions validate the compiled
kernel (run via the axon tunnel, not in CI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.models.point_rend import PointRendSemSegHead, StandardPointHead
from empanada_tpu.ops import pallas_pointrend as ppr
from empanada_tpu.ops.interpolate import bilinear_resize
from empanada_tpu.ops.select import kth_largest, kth_smallest_nonneg


class TestSelect:
    @pytest.mark.parametrize("k", [1, 7, 100, 1000])
    def test_kth_largest_matches_topk(self, k):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 3, (4, 1000)), jnp.float32)
        got = kth_largest(x, k)
        want = jnp.sort(x, axis=1)[:, -min(k, 1000)]
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_kth_largest_with_duplicates(self):
        x = jnp.asarray([[1.0, 2.0, 2.0, 2.0, 3.0, -1.0]])
        assert float(kth_largest(x, 2)[0]) == 2.0
        assert float(kth_largest(x, 4)[0]) == 2.0
        assert float(kth_largest(x, 5)[0]) == 1.0

    @pytest.mark.parametrize("k", [1, 13, 512])
    def test_kth_smallest_nonneg(self, k):
        rng = np.random.default_rng(1)
        x = jnp.asarray(np.abs(rng.normal(0, 2, (3, 700))), jnp.float32)
        got = kth_smallest_nonneg(x, k)
        want = jnp.sort(x, axis=1)[:, min(k, 700) - 1]
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_kth_smallest_includes_zero_and_bf16_values(self):
        x = jnp.asarray([[0.0, 0.5, 0.25, 4.0]])
        assert float(kth_smallest_nonneg(x, 1)[0]) == 0.0
        assert float(kth_smallest_nonneg(x, 3)[0]) == 0.5


def _dense_oracle(head, params, sem, coarse, features, num_points):
    """The XLA dense-mask subdivision step (models/point_rend.py dense
    branch), used as the semantics oracle for the fused kernel."""
    n, h, w, c = sem.shape
    h2, w2 = 2 * h, 2 * w
    num_points = min(num_points, h2 * w2)
    up = bilinear_resize(sem, (h2, w2), align_corners=False)
    u = -jnp.abs(up)
    kth = jax.lax.top_k(u.reshape(n, -1).astype(jnp.float32), num_points)[0][:, -1]
    mask = u.astype(jnp.float32) >= kth[:, None, None, None]
    coarse_dense = bilinear_resize(coarse, (h2, w2), align_corners=False,
                                   zeros_padding=True)
    fine_dense = bilinear_resize(features, (h2, w2), align_corners=False,
                                 zeros_padding=True)
    dense_logits = head.apply(
        params,
        fine_dense.reshape(n, h2 * w2, -1),
        coarse_dense.reshape(n, h2 * w2, c),
    ).reshape(n, h2, w2, c)
    return jnp.where(mask, dense_logits, up), mask


def _setup(seed, hc=64, f=128, sf=2, n=2):
    rng = np.random.default_rng(seed)
    h = hc * sf // 2
    sem = jnp.asarray(rng.normal(0, 1.5, (n, h, h, 1)), jnp.bfloat16)
    coarse = jnp.asarray(rng.normal(0, 1.5, (n, hc, hc, 1)), jnp.bfloat16)
    features = jnp.asarray(rng.normal(0, 1, (n, hc, hc, f)), jnp.bfloat16)
    head = StandardPointHead(num_classes=1, fc_dim=64, num_fc=3,
                             dtype=jnp.bfloat16)
    params = head.init(jax.random.key(seed),
                       jnp.zeros((1, 4, f), jnp.bfloat16),
                       jnp.zeros((1, 4, 1), jnp.bfloat16))
    return sem, coarse, features, head, params


@pytest.mark.parametrize("sf", [2, 4])
def test_fused_step_matches_dense_oracle(sf):
    sem, coarse, features, head, params = _setup(3, hc=64, f=128, sf=sf)
    num_points = 2048

    refined, mask = _dense_oracle(head, params, sem, coarse, features, num_points)

    wts = head.apply(params, features.shape[-1], method=head.fused_weights)
    interpret = jax.default_backend() != "tpu"
    got = ppr.fused_refine_step(sem, ppr.pack_features(features, coarse), wts,
                                num_points, interpret=interpret)

    got = np.asarray(got, np.float32)
    want = np.asarray(refined, np.float32)
    mask = np.asarray(mask)[..., 0].reshape(got.shape)

    # non-refined pixels pass the upsampled logits through bit-exactly
    assert np.array_equal(got[~mask], want[~mask])
    # refined pixels agree to bf16 rounding (the c-column is accumulated
    # separately in f32 — see kernel docstring)
    ref = want[mask]
    err = np.abs(got[mask] - ref)
    assert np.quantile(err, 0.99) <= 0.05 * (1 + np.quantile(np.abs(ref), 0.99))
    assert float(err.mean()) < 0.02 * (1 + float(np.abs(ref).mean()))


def test_fused_step_refines_some_and_skips_some():
    sem, coarse, features, head, params = _setup(4)
    wts = head.apply(params, features.shape[-1], method=head.fused_weights)
    interpret = jax.default_backend() != "tpu"
    got = ppr.fused_refine_step(sem, ppr.pack_features(features, coarse), wts,
                                256, interpret=interpret)
    up = bilinear_resize(sem, (got.shape[1], got.shape[2]), align_corners=False)
    changed = np.asarray(got != up).sum()
    assert 0 < changed <= 2 * 256 * sem.shape[0]


class TestHeadDispatch:
    def _head(self, fused):
        return PointRendSemSegHead(
            num_classes=1, fc_dim=64, num_fc=3, subdivision_num_points=2048,
            dtype=jnp.bfloat16, fused_render=fused,
        )

    def test_param_tree_identical_across_backends(self):
        rng = np.random.default_rng(5)
        coarse = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 1)), jnp.bfloat16)
        feats = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 128)), jnp.bfloat16)
        v_int = self._head("interpret").init(jax.random.key(0), coarse, feats,
                                             train=False, subdivision_steps=2)
        v_never = self._head("never").init(jax.random.key(0), coarse, feats,
                                           train=False, subdivision_steps=2)
        assert jax.tree_util.tree_structure(v_int) == jax.tree_util.tree_structure(v_never)
        for a, b in zip(jax.tree.leaves(v_int), jax.tree.leaves(v_never)):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_two_step_subdivision_close_to_xla_path(self):
        rng = np.random.default_rng(6)
        coarse = jnp.asarray(rng.normal(0, 1.5, (1, 64, 64, 1)), jnp.bfloat16)
        feats = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 128)), jnp.bfloat16)
        hf = self._head("interpret")
        v = hf.init(jax.random.key(0), coarse, feats, train=False,
                    subdivision_steps=2)
        out_f = hf.apply(v, coarse, feats, train=False, subdivision_steps=2)
        hn = self._head("never")
        out_n = hn.apply(v, coarse, feats, train=False, subdivision_steps=2)
        a = np.asarray(out_f["sem_seg_logits"], np.float32)
        b = np.asarray(out_n["sem_seg_logits"], np.float32)
        assert a.shape == b.shape == (1, 256, 256, 1)
        # step 1 (dense XLA vs fused) matches to rounding; step 2 the XLA
        # path goes sparse-top-k while fused keeps the threshold superset,
        # so compare where both agree on non-refinement plus global stats
        agree = np.mean(np.isclose(a, b, atol=0.11, rtol=0.15))
        assert agree > 0.97


class TestTopKMaskIndices:
    def test_matches_topk_set_unique_values(self):
        from empanada_tpu.ops.select import top_k_mask_indices

        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.permutation(1024 * 4).reshape(4, 1024), jnp.float32)
        for k in (1, 7, 100, 640):
            got = np.asarray(top_k_mask_indices(x, k))
            want = np.sort(np.asarray(jax.lax.top_k(x, k)[1]), axis=1)
            assert np.array_equal(np.sort(got, axis=1), want), k

    def test_ties_keep_all_strictly_greater(self):
        from empanada_tpu.ops.select import top_k_mask_indices

        # BIG sits late in scanline order behind many boundary ties
        x = np.zeros((1, 256), np.float32)
        x[0, :40] = 1.0           # ties at the k-th value
        x[0, 200] = 5.0           # strictly greater, must survive
        x[0, 210] = 7.0
        got = set(np.asarray(top_k_mask_indices(jnp.asarray(x), 10))[0].tolist())
        assert 200 in got and 210 in got
        assert len(got) == 10
        assert all(g < 40 or g in (200, 210) for g in got)

    def test_k_geq_m_returns_all(self):
        from empanada_tpu.ops.select import top_k_mask_indices

        x = jnp.asarray(np.random.default_rng(0).random((2, 128)), jnp.float32)
        got = np.asarray(top_k_mask_indices(x, 128))
        assert np.array_equal(got, np.tile(np.arange(128), (2, 1)))


def test_fused_render_typo_fails_at_init():
    """Misconfigured fused_render must fail at construction, not first eval
    (ADVICE r1)."""
    import jax
    import jax.numpy as jnp
    import pytest
    from empanada_tpu.models.point_rend import PointRendSemSegHead

    head = PointRendSemSegHead(num_classes=1, fc_dim=16, fused_render="alway")
    with pytest.raises(ValueError, match="fused_render"):
        head.init(
            jax.random.key(0),
            jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 8, 8, 16)), train=False,
        )


class TestPointSamplePacked:
    """point_sample_packed: one wide gather replacing the 4 corner gathers
    (ops/interpolate.py) — must reproduce point_sample exactly."""

    def test_eager_bit_exact(self):
        from empanada_tpu.ops.interpolate import point_sample, point_sample_packed

        rng = np.random.default_rng(0)
        f = jnp.asarray(rng.normal(0, 1, (2, 37, 53, 5)), jnp.float32)
        pc = jnp.asarray(rng.random((2, 777, 2)), jnp.float32)
        a = point_sample(f, pc)
        b = point_sample_packed(f, pc)
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_jit_grid_coords_close(self):
        # grid pixel centers — the coords the subdivision path actually uses;
        # jit programs may differ only at fma-contraction level
        from empanada_tpu.ops.interpolate import point_sample, point_sample_packed

        rng = np.random.default_rng(1)
        f = jnp.asarray(rng.normal(0, 1, (1, 24, 40, 3)), jnp.float32)
        h2, w2 = 48, 80
        ys = (jnp.arange(h2) + 0.5) / h2
        xs = (jnp.arange(w2) + 0.5) / w2
        pc = jnp.stack(jnp.meshgrid(xs, ys), -1).reshape(1, -1, 2)
        a = jax.jit(point_sample)(f, pc)
        b = jax.jit(point_sample_packed)(f, pc)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_border_zero_padding(self):
        # coords at the extreme corners of [0,1] touch out-of-range bilinear
        # corners -> zero padding must match grid_sample's validity masking
        from empanada_tpu.ops.interpolate import point_sample, point_sample_packed

        f = jnp.ones((1, 4, 4, 2), jnp.float32)
        pc = jnp.asarray([[[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0],
                           [0.5, 0.5]]], jnp.float32)
        a = point_sample(f, pc)
        b = point_sample_packed(f, pc)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        # corner samples average a zero-padded neighborhood: value < 1
        assert float(a[0, 0, 0]) < 1.0 and float(a[0, 4, 0]) == 1.0


class TestDenseLowres:
    """StandardPointHead.dense_lowres: first FC at low resolution + split
    dense layers (no per-layer coarse concat) — algebraically exact."""

    @pytest.mark.parametrize("nc,each", [(1, True), (3, True), (1, False)])
    def test_matches_plain_head_on_upsampled_grid(self, nc, each):
        rng = np.random.default_rng(2)
        head = StandardPointHead(num_classes=nc, fc_dim=32, num_fc=3,
                                 coarse_pred_each_layer=each)
        h, w, c = 8, 10, 16
        feats_lo = jnp.asarray(rng.normal(0, 1, (2, h, w, c)), jnp.float32)
        coarse_hi = jnp.asarray(rng.normal(0, 1, (2, 2 * h, 2 * w, nc)),
                                jnp.float32)

        def resize(x):
            return bilinear_resize(x, (2 * h, 2 * w), align_corners=False,
                                   zeros_padding=True)

        params = head.init(jax.random.key(0), resize(feats_lo), coarse_hi)

        plain = head.apply(params, resize(feats_lo), coarse_hi)
        lowres = head.apply(params, feats_lo, coarse_hi, resize,
                            method=StandardPointHead.dense_lowres)
        np.testing.assert_allclose(np.asarray(plain), np.asarray(lowres),
                                   atol=3e-5, rtol=1e-5)
