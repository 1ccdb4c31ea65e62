"""Order-statistic selection ops (ops/select.py).

The radix threshold (kth_largest) and compaction variants carry their own
in-suite coverage via the PointRend paths; this file pins the segment-packed
single-operand sort (top_k_neg_bf16_indices) against jax.lax.top_k — the op
the TPU sparse render step uses for its K=8192 index selection.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empanada_tpu.ops.select import kth_largest, top_k_neg_bf16_indices


class TestPackedTopKIndices:
    def _ref_sets(self, u, k):
        return [set(r.tolist())
                for r in np.asarray(jax.lax.top_k(
                    jnp.asarray(u, jnp.float32), k)[1])]

    def test_tie_free_exact_set(self):
        rng = np.random.default_rng(0)
        u = jnp.asarray(-np.abs(rng.normal(0, 1, (3, 131072))), jnp.bfloat16)
        for k in (17, 4096, 65536):
            ours = np.asarray(top_k_neg_bf16_indices(u, k))
            ref = self._ref_sets(u, k)
            uf = np.asarray(u, np.float32)
            for r in range(u.shape[0]):
                so = set(ours[r].tolist())
                assert len(so) == k
                if so != ref[r]:
                    # any index difference must be between equal (tied)
                    # values — the documented tie-divergence class
                    assert sorted(uf[r][list(so - ref[r])].tolist()) == \
                        sorted(uf[r][list(ref[r] - so)].tolist())
                # the selected VALUE multiset is always identical
                assert (np.sort(uf[r][ours[r]]) ==
                        np.sort(uf[r][sorted(ref[r])][-k:])).all()

    def test_heavy_ties_and_signed_zero(self):
        """Quantized uncertainties with -0.0 AND +0.0 present (both must
        key as the maximum, equal value)."""
        rng = np.random.default_rng(1)
        q = -(np.abs(rng.normal(0, 1, (2, 131072)) * 2).round() / 2)
        q = q.astype(np.float32)
        q[0, :100] = -0.0
        q[0, 100:200] = 0.0
        u = jnp.asarray(q, jnp.bfloat16)
        uf = np.asarray(u, np.float32)
        for k in (555, 8192):
            ours = np.asarray(top_k_neg_bf16_indices(u, k))
            for r in range(2):
                assert len(set(ours[r].tolist())) == k
                ref_vals = np.sort(uf[r])[-k:]
                assert (np.sort(uf[r][ours[r]]) == ref_vals).all()

    def test_kth_value_agrees_with_radix_select(self):
        rng = np.random.default_rng(2)
        u = jnp.asarray(-np.abs(rng.normal(0, 1, (2, 65536))), jnp.bfloat16)
        k = 1000
        idx = np.asarray(top_k_neg_bf16_indices(u, k))
        uf = np.asarray(u, np.float32)
        kth = np.asarray(kth_largest(jnp.asarray(uf), k))
        for r in range(2):
            assert np.isclose(np.sort(uf[r][idx[r]])[0], kth[r])
