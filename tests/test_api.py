"""API-layer tests: registry, bundles, config inheritance, Engine2d/3d."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

import empanada_tpu.api as api
from empanada_tpu.models import create_model


@pytest.fixture(scope="module")
def tiny_model_and_variables():
    model = create_model(
        "PanopticDeepLabPR", encoder="resnet18", num_classes=1,
        decoder_channels=32, low_level_channels_project=(16, 8, 4),
        subdivision_num_points=256,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 1)), train=False
    )
    return model, variables


@pytest.fixture
def tiny_config(tmp_path, tiny_model_and_variables):
    model, variables = tiny_model_and_variables
    bundle = api.save_model_bundle(
        str(tmp_path / "tiny"),
        "PanopticDeepLabPR",
        dict(encoder="resnet18", num_classes=1, decoder_channels=32,
             low_level_channels_project=(16, 8, 4), subdivision_num_points=256),
        variables,
    )
    return {
        "class_names": {1: "mito"},
        "labels": [1],
        "thing_list": [1],
        "model": bundle,
        "padding_factor": 16,
        "norms": {"mean": 0.5, "std": 0.2},
    }


class TestConfigLoader:
    def test_base_inheritance(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text(yaml.dump({"a": 1, "nested": {"x": 1, "y": 2}}))
        child = tmp_path / "child.yaml"
        child.write_text(yaml.dump({"BASE": "base.yaml", "nested": {"y": 3}, "b": 2}))
        cfg = api.load_config(str(child))
        assert cfg == {"a": 1, "b": 2, "nested": {"x": 1, "y": 3}}


class TestRegistry:
    def test_packaged_configs_discovered(self):
        configs = api.get_configs()
        for name in ("MitoNet_v1", "MitoNet_v1_mini", "NucleoNet_base_v2", "DropNet_base_v1"):
            assert name in configs

    def test_packaged_configs_instantiate(self):
        """Every packaged config's arch/model_kwargs must build a model."""
        configs = api.get_configs()
        for name in ("MitoNet_v1", "MitoNet_v1_mini"):
            cfg = api.read_yaml(configs[name])
            model = create_model(cfg["arch"], **cfg["model_kwargs"])
            assert model.num_classes == len(cfg["labels"])


class TestBundles:
    def test_roundtrip(self, tmp_path, tiny_model_and_variables):
        model, variables = tiny_model_and_variables
        p = api.save_model_bundle(
            str(tmp_path / "m"),
            "PanopticDeepLabPR",
            dict(encoder="resnet18", num_classes=1, decoder_channels=32,
                 low_level_channels_project=(16, 8, 4), subdivision_num_points=256),
            variables,
        )
        model2, variables2 = api.load_model_bundle(p)
        chex = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            variables, variables2,
        )
        assert all(jax.tree.leaves(chex))


class TestUrlModelSource:
    """URL ``model:`` sources resolve through the download cache
    (reference empanada_napari/utils.py:80-106 downloads Zenodo artifacts
    into ~/.empanada).  Driven through ``file://`` URLs — the same
    urllib code path as http(s), no egress needed."""

    def _bundle_url(self, tmp_path, tiny_model_and_variables):
        import hashlib

        model, variables = tiny_model_and_variables
        p = api.save_model_bundle(
            str(tmp_path / "src" / "m"),
            "PanopticDeepLabPR",
            dict(encoder="resnet18", num_classes=1, decoder_channels=32,
                 low_level_channels_project=(16, 8, 4),
                 subdivision_num_points=256),
            variables,
        )
        sha = hashlib.sha256(open(p, "rb").read()).hexdigest()
        return p, "file://" + p, sha

    def test_download_cache_and_offline_hit(self, tmp_path, monkeypatch,
                                            tiny_model_and_variables):
        import os

        (tmp_path / "src").mkdir()
        src, url, sha = self._bundle_url(tmp_path, tiny_model_and_variables)
        monkeypatch.setenv("EMPANADA_TPU_CACHE", str(tmp_path / "cache"))

        cfg = {"model": url, "model_sha256": sha}
        model, variables = api.load_model_from_config(cfg)
        assert model.num_classes == 1

        # cached: delete the source; the load must hit the cache offline
        os.remove(src)
        model2, variables2 = api.load_model_from_config(cfg)
        eq = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            variables, variables2,
        )
        assert all(jax.tree.leaves(eq))
        # exactly one cached artifact, no leftovers
        assert len(os.listdir(tmp_path / "cache")) == 1

    def test_checksum_mismatch_rejected(self, tmp_path, monkeypatch,
                                        tiny_model_and_variables):
        import os

        (tmp_path / "src").mkdir()
        _, url, _ = self._bundle_url(tmp_path, tiny_model_and_variables)
        monkeypatch.setenv("EMPANADA_TPU_CACHE", str(tmp_path / "cache"))
        with pytest.raises(RuntimeError, match="sha256 mismatch"):
            api.cached_model_path(url, sha256="0" * 64)
        # a failed download must leave no cache entry (atomic rename only
        # happens after verification)
        leftover = [n for n in os.listdir(tmp_path / "cache")
                    if not n.endswith(".part")]
        assert leftover == []

    def test_stale_cache_refetched_on_checksum_change(
            self, tmp_path, monkeypatch, tiny_model_and_variables):
        import os

        (tmp_path / "src").mkdir()
        src, url, sha = self._bundle_url(tmp_path, tiny_model_and_variables)
        monkeypatch.setenv("EMPANADA_TPU_CACHE", str(tmp_path / "cache"))
        dest = api.cached_model_path(url)  # no checksum: trust-on-first-use
        # corrupt the cached copy; a later load that DOES pin a checksum
        # must detect and refetch, not serve the corrupt bytes
        with open(dest, "r+b") as f:
            f.write(b"garbage")
        fixed = api.cached_model_path(url, sha256=sha)
        assert fixed == dest
        import hashlib

        assert hashlib.sha256(open(dest, "rb").read()).hexdigest() == sha


class TestPreprocessor:
    def test_rejects_float(self):
        pre = api.Preprocessor(mean=0.5, std=0.2)
        with pytest.raises(Exception):
            pre(np.zeros((4, 4), np.float32))

    def test_normalizes_by_dtype_max(self):
        pre = api.Preprocessor(mean=0.5, std=0.2)
        out8 = pre(np.full((2, 2), 255, np.uint8))["image"]
        out16 = pre(np.full((2, 2), 65535, np.uint16))["image"]
        assert np.allclose(out8, out16)
        assert np.allclose(out8, (1.0 - 0.5) / 0.2, atol=1e-4)


class TestEngine2d:
    def test_infer_and_tiled(self, tiny_config, tiny_model_and_variables):
        eng = api.Engine2d(
            tiny_config, nms_kernel=3, max_centers=32,
            model_and_variables=tiny_model_and_variables,
        )
        img = np.random.default_rng(0).integers(0, 255, (70, 90), dtype=np.uint8)
        pan = eng.infer(img)
        assert pan.shape == img.shape

        eng.tile_size = 64
        pan_tiled = eng.infer(img)
        assert pan_tiled.shape == img.shape

    def test_semantic_only(self, tiny_config, tiny_model_and_variables):
        eng = api.Engine2d(
            tiny_config, semantic_only=True, max_centers=32,
            model_and_variables=tiny_model_and_variables,
        )
        img = np.random.default_rng(0).integers(0, 255, (64, 64), dtype=np.uint8)
        pan = eng.infer(img)
        # no things -> ids are class_id * label_divisor only
        assert set(np.unique(pan)) <= {0, 1000}


class TestEngine3d:
    def test_stack_and_consensus(self, tiny_config, tiny_model_and_variables, tmp_path):
        eng = api.Engine3d(
            tiny_config, median_kernel_size=3, min_size=0, min_extent=0,
            max_centers=32, save_panoptic=True,
            model_and_variables=tiny_model_and_variables,
        )
        vol = np.random.default_rng(1).integers(0, 255, (6, 48, 48), dtype=np.uint8)
        stack, trackers = eng.infer_on_axis(vol, "xy")
        assert stack.shape == vol.shape
        assert len(trackers) == 1

        # full orthoplane + consensus + stack postprocessing
        all_trackers = eng.infer_orthoplane(vol)
        outs = list(api.tracker_consensus(all_trackers, None, tiny_config, min_size=0, min_extent=0))
        assert len(outs) == 1
        vol_out, class_name, instances = outs[0]
        assert class_name == "mito" and vol_out.shape == vol.shape

        outs2 = list(api.stack_postprocessing(
            {"xy": trackers}, None, tiny_config, min_size=0, min_extent=0))
        assert outs2[0][0].shape == vol.shape


class TestProgress:
    def test_progress_format_and_throttle(self):
        import io

        from empanada_tpu.utils import Progress

        buf = io.StringIO()
        with Progress(total=10, desc="axis xy", min_interval=0.0,
                      stream=buf) as bar:
            for _ in range(10):
                bar.update()
        out = buf.getvalue()
        assert "axis xy: 10/10 (100.0%)" in out and "ETA" in out

    def test_progress_resume_baseline_not_counted_in_rate(self):
        import io
        import time

        from empanada_tpu.utils import Progress

        buf = io.StringIO()
        bar = Progress(total=1000, desc="axis xy", min_interval=0.0, stream=buf)
        bar.n = 900  # resumed slices (pre-done)
        time.sleep(0.05)
        bar.update()  # one real slice in ~50ms -> rate ~20/s, NOT ~18000/s
        line = buf.getvalue().rsplit("\r", 1)[-1]
        rate = float(line.split("(")[1].split(")")[0].replace("%", ""))
        assert "901/1000" in line
        rate_str = line.split(") ")[1].split("/s")[0]
        assert float(rate_str) < 1000, line

    def test_progress_disabled_is_silent(self):
        import io

        from empanada_tpu.utils import Progress

        buf = io.StringIO()
        bar = Progress(total=5, enabled=False, stream=buf)
        for _ in range(5):
            bar.update()
        bar.close()
        assert buf.getvalue() == ""

    def test_engine3d_progress_lines(self, tiny_config,
                                     tiny_model_and_variables, capsys):
        eng = api.Engine3d(
            tiny_config, median_kernel_size=1, min_size=0, min_extent=0,
            max_centers=32, model_and_variables=tiny_model_and_variables,
        )
        vol = np.random.default_rng(1).integers(0, 255, (4, 48, 48), dtype=np.uint8)
        eng.infer_on_axis(vol, "xy", progress=True)
        err = capsys.readouterr().err
        assert "axis xy: 4/4" in err


class TestExportImport:
    def test_roundtrip(self, tmp_path, tiny_config, monkeypatch):
        import empanada_tpu.api.utils as U
        import empanada_tpu.api.export as E

        monkeypatch.setattr(U, "MODEL_DIR", str(tmp_path / "home"))
        monkeypatch.setattr(E, "MODEL_DIR", str(tmp_path / "home"))

        api.add_new_model("tiny_test", tiny_config, model_file=tiny_config["model"])
        assert "tiny_test" in api.get_configs()

        archive = api.export_model("tiny_test", str(tmp_path / "out"))
        assert os.path.exists(archive)

        name = api.import_model(archive, model_name="tiny_imported")
        assert name == "tiny_imported"
        assert "tiny_imported" in api.get_configs()


class TestQuantizedBundles:
    def test_int8_bundle_roundtrip(self, tmp_path, tiny_model_and_variables):
        model, variables = tiny_model_and_variables
        kwargs = dict(encoder="resnet18", num_classes=1, decoder_channels=32,
                      low_level_channels_project=(16, 8, 4),
                      subdivision_num_points=256)
        full = api.save_model_bundle(
            str(tmp_path / "full"), "PanopticDeepLabPR", kwargs, variables)
        quant = api.save_model_bundle(
            str(tmp_path / "quant"), "PanopticDeepLabPR", kwargs, variables,
            quantize=True)
        # int8 weights should shrink the bundle substantially
        assert os.path.getsize(quant) < 0.45 * os.path.getsize(full)

        qmodel, qvars = api.load_model_bundle(quant)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 1)),
                        jnp.float32)
        ref = jax.jit(model.apply, static_argnames=("train",))(
            variables, x, train=False)
        got = jax.jit(qmodel.apply, static_argnames=("train",))(
            qvars, x, train=False)
        # per-channel int8 keeps logits close (untrained nets have small
        # dynamic range; assert relative error, not exactness)
        r = np.asarray(ref["sem_logits"], np.float32)
        g = np.asarray(got["sem_logits"], np.float32)
        denom = max(np.abs(r).max(), 1e-6)
        assert np.abs(r - g).max() / denom < 0.15
        assert np.corrcoef(r.ravel(), g.ravel())[0, 1] > 0.99

    def test_requantize_bundle(self, tmp_path, tiny_model_and_variables):
        from empanada_tpu.api.utils import requantize_bundle

        model, variables = tiny_model_and_variables
        kwargs = dict(encoder="resnet18", num_classes=1, decoder_channels=32,
                      low_level_channels_project=(16, 8, 4),
                      subdivision_num_points=256)
        full = api.save_model_bundle(
            str(tmp_path / "full"), "PanopticDeepLabPR", kwargs, variables)
        q = requantize_bundle(full, str(tmp_path / "q.eptpu"))
        qmodel, qvars = api.load_model_bundle(q)
        assert os.path.getsize(q) < 0.45 * os.path.getsize(full)
        # same tree structure as a fresh init
        flat_q = jax.tree_util.tree_leaves(qvars)
        flat_f = jax.tree_util.tree_leaves(variables)
        assert len(flat_q) == len(flat_f)
        assert all(a.shape == b.shape for a, b in zip(flat_q, flat_f))


class TestCombinePanopticMaps:
    def _cfg(self, name, cname, labels):
        return {"model_name": name, "class_names": {l: cname for l in labels},
                "labels": labels}

    def test_disjoint_class_spaces_and_priority(self):
        from empanada_tpu.api.inference import combine_panoptic_maps

        a = np.zeros((4, 4), np.int64)
        a[0, 0] = 1 * 1000 + 5       # class 1, instance 5
        a[1, 1] = 1 * 1000 + 7
        b = np.zeros((4, 4), np.int64)
        b[1, 1] = 1 * 1000 + 3       # overlaps a -> a wins
        b[2, 2] = 1 * 1000 + 9
        combined, names = combine_panoptic_maps(
            [a, b], [self._cfg("A", "mito", [1]), self._cfg("B", "nuc", [1])],
            label_divisor=1000)
        assert combined[0, 0] == 1005          # A's class 1 keeps id 1
        assert combined[1, 1] == 1007          # A wins the overlap
        assert combined[2, 2] == 2 * 1000 + 9  # B's class 1 -> global class 2
        assert names == {1: "A/mito", 2: "B/nuc"}

    def test_multiclass_offsets(self):
        from empanada_tpu.api.inference import combine_panoptic_maps

        a = np.asarray([[2 * 100 + 1]])  # classes {1,2}
        b = np.asarray([[1 * 100 + 4]])
        combined, names = combine_panoptic_maps(
            [a, b],
            [self._cfg("A", "x", [1, 2]), self._cfg("B", "y", [1])],
            label_divisor=100)
        assert combined[0, 0] == 2 * 100 + 1   # A occupies, B can't overwrite
        assert names[3] == "B/y"               # B's class 1 -> 2 + 1

    def test_shape_mismatch_raises(self):
        from empanada_tpu.api.inference import combine_panoptic_maps

        with np.testing.assert_raises(ValueError):
            combine_panoptic_maps(
                [np.zeros((2, 2), np.int64), np.zeros((3, 3), np.int64)],
                [self._cfg("A", "x", [1]), self._cfg("B", "y", [1])])
