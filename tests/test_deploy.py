"""Serving artifacts (api/deploy.py): the reference's TorchScript-deploy
analog — weights + full panoptic pipeline baked into one jax.export
(StableHLO) file, loadable and runnable with jax alone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import empanada_tpu.api as api
from conftest import make_blob_image
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
def tiny_config():
    return {
        "model_name": "tiny",
        "class_names": {1: "mito"},
        "labels": [1],
        "thing_list": [1],
        "padding_factor": 16,
        "norms": {"mean": 0.5, "std": 0.2},
    }


class TestServingArtifact:
    def test_roundtrip_matches_engine(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        from empanada_tpu.api.utils import Preprocessor
        from empanada_tpu.engine import PanopticDeepLabRenderEngine

        model, variables = tiny_model_and_variables
        path = str(tmp_path / "tiny.serve")
        api.export_serving_artifact(
            tiny_config, path, (64, 64), platforms=("cpu",),
            model_and_variables=(model, variables), max_centers=32,
            confidence_thr=0.3,
        )

        served = api.load_serving_artifact(path)
        assert served.meta["model_name"] == "tiny"
        img = make_blob_image((64, 64), n_blobs=3, seed=5)
        pan_served = served(img)

        # must equal the engine path on the same input (deploy defaults
        # match the CLI surface: nms_kernel=3, confidence 0.3)
        engine = PanopticDeepLabRenderEngine(
            model, variables, thing_list=[1], padding_factor=16,
            coarse_boundaries=True, max_centers=32, confidence_thr=0.3,
            nms_kernel=3, nms_threshold=0.1,
        )
        prep = Preprocessor(**tiny_config["norms"])(img)["image"]
        pan_engine = np.asarray(engine(prep, size=img.shape, upsampling=1))
        assert np.array_equal(pan_served, pan_engine)

    def test_shape_specialization_enforced(
        self, tiny_config, tiny_model_and_variables, tmp_path
    ):
        path = str(tmp_path / "tiny.serve")
        api.export_serving_artifact(
            tiny_config, path, (64, 64), platforms=("cpu",),
            model_and_variables=tiny_model_and_variables, max_centers=32,
        )
        served = api.load_serving_artifact(path)
        with pytest.raises(ValueError, match="specialized for"):
            served(np.zeros((96, 96), np.uint8))
        # uint16 would wrap mod 256, floats would truncate — must raise
        with pytest.raises(ValueError, match="expects uint8"):
            served(np.zeros((64, 64), np.uint16))
        with pytest.raises(ValueError, match="expects uint8"):
            served(np.zeros((64, 64), np.float32))

    def test_cli_deploy_and_serve(
        self, tiny_config, tiny_model_and_variables, tmp_path, monkeypatch
    ):
        import yaml

        from empanada_tpu.cli import main

        model, variables = tiny_model_and_variables
        bundle = api.save_model_bundle(
            str(tmp_path / "tiny"), "PanopticDeepLabPR",
            dict(encoder="resnet18", num_classes=1, decoder_channels=32,
                 low_level_channels_project=(16, 8, 4),
                 subdivision_num_points=256),
            variables,
        )
        cfg = dict(tiny_config, model=bundle)
        cfg_path = tmp_path / "tiny_model.yaml"
        cfg_path.write_text(yaml.dump(cfg))

        art = str(tmp_path / "tiny.serve")
        main(["models", "deploy", "--name", str(cfg_path), "--path", art,
              "--shape", "64x64", "--platforms", "cpu"])

        img_path = tmp_path / "img.npy"
        np.save(img_path, make_blob_image((64, 64), n_blobs=3, seed=5))
        out_path = tmp_path / "pan.npy"
        main(["serve", art, str(img_path), "-o", str(out_path)])
        pan = np.load(out_path)
        assert pan.shape == (64, 64)
        assert pan.max() > 0  # found something on the blob image
