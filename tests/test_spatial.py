"""Spatial halo-sharding tests: a row-sharded forward over a virtual mesh
must reproduce the unsharded forward (seam-free), up to the distributed
approximation of ASPP's global pooling branch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.models import create_model
from empanada_tpu.parallel.mesh import create_mesh
from empanada_tpu.parallel.spatial import (
    SpatialEngine2d,
    exchange_halo_rows,
    spatial_sharded_forward,
)


@pytest.fixture(scope="module")
def pdl_model():
    model = create_model(
        "PanopticDeepLab", encoder="resnet18", num_classes=1,
        decoder_channels=32, low_level_stages=(1,), low_level_channels_project=(16,),
        ins_decoder=False,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 1)), train=False
    )
    return model, variables


class TestHaloExchange:
    def test_halo_rows_match_neighbors(self):
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from functools import partial

        mesh = create_mesh(4, axis_name="spatial")
        x = jnp.arange(32, dtype=jnp.float32).reshape(1, 32, 1, 1)

        fn = shard_map(
            lambda b: exchange_halo_rows(b, 2, "spatial"),
            mesh=mesh, in_specs=P(None, "spatial", None, None),
            out_specs=P(None, "spatial", None, None), check_rep=False,
        )
        out = np.asarray(fn(x))[0, :, 0, 0]
        # each 8-row block becomes 12 rows: [2 halo][8 rows][2 halo]
        # block 1 (rows 8..15): top halo = rows 6,7; bottom halo = rows 16,17
        block1 = out[12:24]
        assert block1.tolist() == [6, 7] + list(range(8, 16)) + [16, 17]
        # edge blocks zero-padded
        block0 = out[:12]
        assert block0.tolist() == [0, 0] + list(range(0, 8)) + [8, 9]


class TestShardedForward:
    def test_matches_unsharded(self, pdl_model):
        model, variables = pdl_model
        mesh = create_mesh(4, axis_name="spatial")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (1, 512, 256, 1)), jnp.float32)

        want = jax.jit(model.apply, static_argnames=("train",))(variables, x, train=False)
        got = jax.jit(
            lambda v, im: spatial_sharded_forward(model, v, im, mesh, halo=128)
        )(variables, x)

        for key in ("sem_logits", "ctr_hmp", "offsets"):
            w = np.asarray(want[key])
            g = np.asarray(got[key])
            assert g.shape == w.shape
            # bounded drift from the documented approximations (halo
            # truncation, edge padding, align_corners grid shift)
            rel_mean = np.abs(g - w).mean() / (np.abs(w).mean() + 1e-6)
            assert rel_mean < 0.08, f"{key} rel mean diff {rel_mean}"
        # interior rows (full real context) are closer than mesh-edge rows
        d = np.abs(np.asarray(got["sem_logits"]) - np.asarray(want["sem_logits"]))[0, :, :, 0]
        assert d[192:320].mean() < 0.5 * d[:64].mean()

    def test_seam_free_vs_tiling(self, pdl_model):
        """The sharded forward must be closer to the unsharded output than
        independent tiles are — that's the point of halo exchange."""
        model, variables = pdl_model
        mesh = create_mesh(4, axis_name="spatial")
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (1, 512, 256, 1)), jnp.float32)

        want = np.asarray(
            jax.jit(model.apply, static_argnames=("train",))(variables, x, train=False)["sem_logits"]
        )
        got_shard = np.asarray(
            jax.jit(lambda v, im: spatial_sharded_forward(model, v, im, mesh, halo=128))(
                variables, x
            )["sem_logits"]
        )
        # independent quarters (tile path, no halo)
        apply = jax.jit(model.apply, static_argnames=("train",))
        tiles = [
            np.asarray(apply(variables, x[:, i * 128:(i + 1) * 128], train=False)["sem_logits"])
            for i in range(4)
        ]
        got_tiles = np.concatenate(tiles, axis=1)

        err_shard = np.abs(got_shard - want).mean()
        err_tiles = np.abs(got_tiles - want).mean()
        assert err_shard < err_tiles * 0.5, (err_shard, err_tiles)


class TestSpatialEngine:
    def test_big_slice_panoptic(self, pdl_model):
        model, variables = pdl_model
        mesh = create_mesh(4, axis_name="spatial")
        engine = SpatialEngine2d(
            model, variables, thing_list=[1], mesh=mesh, halo=64,
            padding_factor=32, max_centers=64,
        )
        img = np.random.default_rng(2).normal(0.5, 0.1, (200, 300)).astype(np.float32)
        pan = engine(img)
        assert pan.shape == img.shape
        assert pan.dtype == np.int32
