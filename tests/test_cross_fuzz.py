"""Randomized CROSS-FRAMEWORK parity fuzz: the reference's own host
stitching components (matcher, tracker, range algebra — executed from
/root/reference via tests/_ref_shims) against empanada_tpu's on identical
randomized inputs.

The e2e gate (test_e2e_cross_parity.py) covers one pipeline configuration;
this module sweeps many random instance layouts through the pieces, so a
behavior divergence in an untested regime (the SqueezeExcite template)
surfaces here.
"""

import os
import sys

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, label as cc_label

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "empanada")):
    pytest.skip("reference repo not mounted", allow_module_level=True)

_HERE = os.path.dirname(__file__)
for p in (os.path.join(_HERE, "_ref_shims"), REFERENCE, _HERE):
    if p not in sys.path:
        sys.path.insert(0, p)

from empanada_tpu.stitch.matcher import RLEMatcher
from empanada_tpu.stitch.rle_seg import pan_seg_to_rle_seg
from empanada_tpu.stitch.tracker import InstanceTracker


def _blob_slices(seed, n_slices=6, hw=64):
    """Per-slice instance rle_segs from a drifting blob volume (adjacent
    slices correlate, so matching exercises inherit/new/absorb paths)."""
    rng = np.random.default_rng(seed)
    field = gaussian_filter(rng.normal(0, 1, (n_slices, hw, hw)), (1.2, 5, 5))
    field /= field.std() + 1e-9
    out = []
    for z in range(n_slices):
        lab, _ = cc_label(field[z] > 0.55)
        pan = (lab > 0).astype(np.int64) * 1000 + lab
        out.append(pan_seg_to_rle_seg(pan, [1], 1000, [1], force_connected=True))
    return out


def _np_attrs(d):
    return {
        int(k): {
            "box": tuple(int(b) for b in a["box"]),
            "starts": np.asarray(a["starts"], np.int64).copy(),
            "runs": np.asarray(a["runs"], np.int64).copy(),
        }
        for k, a in d.items()
    }


class TestMatcherCrossFuzz:
    @pytest.mark.parametrize("seed", range(6))
    def test_forward_matching_labels_identical(self, seed):
        from empanada.inference.matcher import RLEMatcher as RefMatcher

        slices = _blob_slices(seed)
        ours = RLEMatcher(1, 1000, 0.25, 0.25)
        ref = RefMatcher(1, 1000, 0.25, 0.25)

        for z, rle_seg in enumerate(slices):
            a = _np_attrs(rle_seg[1])
            b = _np_attrs(rle_seg[1])
            if z == 0:
                ours.initialize_target(a)
                ref.initialize_target(b)
                continue
            got = ours(a)
            want = ref(b)
            assert sorted(got.keys()) == sorted(want.keys()), (seed, z)
            for k in got:
                assert np.array_equal(
                    np.asarray(got[k]["starts"]), np.asarray(want[k]["starts"])
                ), (seed, z, k)
                assert np.array_equal(
                    np.asarray(got[k]["runs"]), np.asarray(want[k]["runs"])
                ), (seed, z, k)
            assert ours.next_label == ref.next_label, (seed, z)


class TestTrackerCrossFuzz:
    @pytest.mark.parametrize("axis", ["xy", "xz", "yz"])
    def test_finished_instances_identical(self, axis):
        from empanada.inference.tracker import InstanceTracker as RefTracker

        slices = _blob_slices(11, n_slices=5, hw=48)
        shape = (5, 48, 48) if axis == "xy" else (
            (48, 5, 48) if axis == "xz" else (48, 48, 5)
        )
        ours = InstanceTracker(1, 1000, shape, axis)
        ref = RefTracker(1, 1000, shape, axis)
        for z, rle_seg in enumerate(slices):
            ours.update(_np_attrs(rle_seg[1]), z)
            ref.update(_np_attrs(rle_seg[1]), z)
        ours.finish()
        ref.finish()

        assert sorted(ours.instances) == sorted(ref.instances)
        for k in ours.instances:
            a, b = ours.instances[k], ref.instances[k]
            assert tuple(a["box"]) == tuple(b["box"]), (axis, k)
            # canonicalize ordering: our tracker sorts RLEs by start at
            # finish (native two-pointer kernels require it); the
            # reference stores xz in slice-concatenation order — same
            # voxel sets, different order (PARITY.md divergence 11)
            def canon(attrs):
                s = np.asarray(attrs["starts"], np.int64)
                r = np.asarray(attrs["runs"], np.int64)
                order = np.argsort(s, kind="stable")
                return s[order], r[order]

            sa, ra = canon(a)
            sb, rb = canon(b)
            assert np.array_equal(sa, sb), (axis, k)
            assert np.array_equal(ra, rb), (axis, k)


class TestRangeAlgebraCrossFuzz:
    def test_voting_and_intersection_match_reference(self):
        from empanada.array_utils import (
            rle_intersection as ref_rle_inter,
            rle_voting as ref_vote,
        )

        from empanada_tpu.core.ranges import concat_sort_ranges, rle_voting
        from empanada_tpu.core.rle import rle_intersection

        for seed in range(15):
            rng = np.random.default_rng(seed)

            def rand_ranges():
                n = int(rng.integers(1, 30))
                starts = np.sort(rng.choice(2000, n, replace=False)).astype(np.int64)
                ends = starts + rng.integers(1, 20, n)
                ends[:-1] = np.minimum(ends[:-1], starts[1:])
                keep = ends > starts
                return np.stack([starts[keep], ends[keep]], 1)

            sets = [rand_ranges() for _ in range(3)]
            merged = concat_sort_ranges(sets)
            got = rle_voting(merged, 2)
            want = np.asarray(ref_vote(merged, 2), np.int64).reshape(-1, 2)
            assert np.array_equal(got, want), seed

            sa, ra = sets[0][:, 0], sets[0][:, 1] - sets[0][:, 0]
            sb, rb = sets[1][:, 0], sets[1][:, 1] - sets[1][:, 0]
            ia = int(rle_intersection(sa, ra, sb, rb))
            ib = int(ref_rle_inter(sa, ra, sb, rb))
            assert ia == ib, seed
