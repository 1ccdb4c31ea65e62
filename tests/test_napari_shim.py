"""napari plugin shim: manifest integrity + graceful degradation without
napari/magicgui (which this environment doesn't have — the shim must import
cleanly and fail informatively only at widget creation)."""

import importlib

import pytest
import yaml

import empanada_tpu.napari_plugin as shim
from empanada_tpu.napari_plugin import widgets


# 23 active reference commands (/root/reference/empanada_napari/napari.yaml:
# 4-131) + visualize-patches, which the reference ships but leaves commented
# out of its manifest (_visualize_patches_from_points.py; napari.yaml:74-79)
REFERENCE_COMMANDS = 24


class TestManifest:
    def test_manifest_parses_and_is_complete(self):
        with open(shim.manifest_path()) as f:
            manifest = yaml.safe_load(f)
        assert manifest["name"] == "empanada-tpu"
        commands = manifest["contributions"]["commands"]
        widget_entries = manifest["contributions"]["widgets"]
        assert len(commands) == REFERENCE_COMMANDS
        assert len(widget_entries) == REFERENCE_COMMANDS
        cmd_ids = {c["id"] for c in commands}
        assert {w["command"] for w in widget_entries} == cmd_ids

    def test_every_python_name_resolves(self):
        with open(shim.manifest_path()) as f:
            manifest = yaml.safe_load(f)
        for cmd in manifest["contributions"]["commands"]:
            module_name, attr = cmd["python_name"].split(":")
            module = importlib.import_module(module_name)
            assert hasattr(module, attr), cmd["python_name"]

    def test_mirrors_reference_command_surface(self):
        """Every reference command id has a counterpart (same suffix)."""
        import os

        ref = "/root/reference/empanada_napari/napari.yaml"
        if not os.path.exists(ref):
            pytest.skip("reference not mounted")
        with open(ref) as f:
            ref_manifest = yaml.safe_load(f)
        ref_suffixes = {
            c["id"].split(".", 1)[1] for c in ref_manifest["contributions"]["commands"]
        }
        with open(shim.manifest_path()) as f:
            ours = yaml.safe_load(f)
        our_suffixes = {
            c["id"].split(".", 1)[1] for c in ours["contributions"]["commands"]
        }
        assert ref_suffixes <= our_suffixes, ref_suffixes - our_suffixes


class _FakeLayer:
    def __init__(self, data, name="layer"):
        self.data = data
        self.name = name


def _passthrough_magicgui():
    """Stand-in for magicgui: decorator factory returning the fn unchanged."""
    def magicgui(**_kwargs):
        return lambda fn: fn
    return magicgui


@pytest.fixture
def widget_fns(monkeypatch):
    """Widget factories with magicgui stubbed out, so the inner widget
    bodies (the logic under test) run without napari installed."""
    monkeypatch.setattr(widgets, "_magicgui", _passthrough_magicgui)
    return widgets


class TestWidgetBodies:
    def test_jump_sets_3tuple_camera_center(self, widget_fns):
        import numpy as np

        class Dims:
            def set_point(self, axis, value):
                self.point = (axis, value)

        class Viewer:
            dims = Dims()
            camera = type("Cam", (), {"center": None})()

        labels = np.zeros((16, 16), dtype=np.int32)
        labels[4:8, 10:14] = 5
        viewer = Viewer()
        msg = widget_fns.jump_to_label_widget()(viewer, _FakeLayer(labels), 5)
        # napari's Camera.center is a validated (z, y, x) 3-tuple
        assert len(viewer.camera.center) == 3
        assert viewer.camera.center[1:] == (6.0, 12.0)
        assert "label 5" in msg

    def test_volume_inference_emits_layer_per_class(self, widget_fns, monkeypatch):
        import numpy as np

        from empanada_tpu import api
        from empanada_tpu.api import utils as api_utils

        class StubEngine:
            def __init__(self, config, **kwargs):
                pass

            def infer_on_axis(self, volume, axis):
                return None, "trackers"

        def stub_stack_postprocessing(trackers, store_url, config, **kwargs):
            yield np.ones((2, 4, 4), np.int32), "mito", [1]
            yield np.full((2, 4, 4), 2, np.int32), "nuclei", [2]

        monkeypatch.setattr(api, "Engine3d", StubEngine)
        monkeypatch.setattr(api, "stack_postprocessing", stub_stack_postprocessing)
        monkeypatch.setattr(api_utils, "get_configs", lambda: {"M": {}})

        out = widget_fns.volume_inference_widget()(
            _FakeLayer(np.zeros((2, 4, 4), np.float32)), model_name="M"
        )
        assert [name for _, meta, _ in out for name in [meta["name"]]] == [
            "mito_seg", "nuclei_seg"
        ]

    def test_pick_patches_3d_crops_planes_not_slabs(self, widget_fns):
        import numpy as np

        vol = np.random.default_rng(0).random((6, 64, 64)).astype(np.float32)
        stack = widget_fns.pick_patches_widget()(
            _FakeLayer(vol), None, n_patches=3, patch_size=16
        )[0]
        assert stack.shape == (3, 16, 16)  # 2D plane patches, not (16,16,64) slabs

        # point picks honor the z coordinate and center (y, x)
        pts = _FakeLayer(np.array([[2, 30, 40], [5, 10, 12]]))
        pts.ndim = 3
        stack = widget_fns.pick_patches_widget()(
            _FakeLayer(vol), pts, patch_size=16
        )[0]
        assert stack.shape == (2, 16, 16)
        assert np.array_equal(stack[0], vol[2, 22:38, 32:48])

    def test_store_dataset_2d_pair_is_one_patch(self, widget_fns, tmp_path):
        import os

        import numpy as np

        img = np.zeros((32, 48), np.uint8)
        msk = np.ones((32, 48), np.int32)
        widget_fns.store_dataset_widget()(
            _FakeLayer(img), _FakeLayer(msk), str(tmp_path), "ds"
        )
        images = os.listdir(tmp_path / "ds" / "images")
        assert len(images) == 1  # not 32 single-row strips


class TestGracefulDegradation:
    def test_import_without_napari_ok(self):
        assert shim.napari_available() in (True, False)

    def test_widget_factory_raises_informative_error(self):
        if shim.napari_available():
            pytest.skip("napari installed; degradation path not applicable")
        with pytest.raises(ImportError, match="cli"):
            widgets.slice_inference_widget()

    def test_open_documentation_needs_no_napari(self, monkeypatch):
        opened = []
        import webbrowser

        monkeypatch.setattr(webbrowser, "open", lambda url: opened.append(url))
        widgets.open_documentation()
        assert opened and "empanada" in opened[0]
