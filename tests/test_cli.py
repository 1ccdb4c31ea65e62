"""CLI smoke tests: drive ``empanada_tpu.cli.main`` the way a terminal user
would (the CLI replaces the reference's napari GUI commands,
empanada_napari/napari.yaml)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from conftest import make_blob_image
from empanada_tpu.cli import main


@pytest.fixture(scope="module")
def tiny_bundle(tmp_path_factory):
    import empanada_tpu.api as api
    from empanada_tpu.models import create_model

    kwargs = dict(
        encoder="resnet18", num_classes=1, decoder_channels=32,
        low_level_channels_project=(16, 8, 4), subdivision_num_points=256,
    )
    model = create_model("PanopticDeepLabPR", **kwargs)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 1)), train=False
    )
    d = tmp_path_factory.mktemp("bundle")
    return api.save_model_bundle(str(d / "tiny"), "PanopticDeepLabPR", kwargs, variables)


@pytest.fixture
def tiny_config_yaml(tmp_path, tiny_bundle):
    cfg = {
        "class_names": {1: "mito"},
        "labels": [1],
        "thing_list": [1],
        "model": tiny_bundle,
        "padding_factor": 16,
        "norms": {"mean": 0.5, "std": 0.2},
    }
    path = tmp_path / "tiny_model.yaml"
    path.write_text(yaml.dump(cfg))
    return str(path)


def test_models_list(capsys):
    main(["models", "list"])
    out = capsys.readouterr().out
    assert "MitoNet_v1" in out


def test_models_info(capsys):
    main(["models", "info", "--name", "MitoNet_v1"])
    out = capsys.readouterr().out
    assert "divisible by 16" in out  # reference MitoNet_v1.yaml padding_factor
    # MitoNet finetunes with SingleClassInstanceDataset -> no label divisor
    assert "label divisor of None" in out
    assert "Class 1 (mito) requires instance segmentation" in out
    assert "start annotation at label 1" in out


def test_infer2d(tmp_path, tiny_config_yaml):
    image = make_blob_image((96, 96), n_blobs=4)
    img_path = tmp_path / "img.npy"
    np.save(img_path, image)
    out_path = tmp_path / "pan.npy"

    main(["infer2d", str(img_path), "-o", str(out_path),
          "--model", tiny_config_yaml])
    pan = np.load(out_path)
    assert pan.shape == image.shape
    assert pan.dtype == np.int64


def test_infer2d_tiled(tmp_path, tiny_config_yaml):
    image = make_blob_image((96, 96), n_blobs=4)
    img_path = tmp_path / "img.npy"
    np.save(img_path, image)
    out_path = tmp_path / "pan_tiled.npy"

    main(["infer2d", str(img_path), "-o", str(out_path),
          "--model", tiny_config_yaml, "--tile-size", "64"])
    pan = np.load(out_path)
    assert pan.shape == image.shape


def test_infer3d_stack(tmp_path, tiny_config_yaml):
    vol = np.stack([make_blob_image((64, 64), n_blobs=3)] * 4)
    vol_path = tmp_path / "vol.npy"
    np.save(vol_path, vol)
    out_tpl = str(tmp_path / "seg_{class}.npy")

    main(["infer3d", str(vol_path), "-o", out_tpl,
          "--model", tiny_config_yaml, "--median-slices", "1",
          "--min-size", "0", "--min-extent", "0"])
    seg = np.load(tmp_path / "seg_mito.npy")
    assert seg.shape == vol.shape


def test_infer3d_checkpoint_resume(tmp_path, tiny_config_yaml):
    """--checkpoint-dir persists per-axis state; --resume skips completed
    axes (trackers reload from JSON) and yields identical outputs."""
    vol = np.stack([make_blob_image((64, 64), n_blobs=3)] * 4)
    vol_path = tmp_path / "vol.npy"
    np.save(vol_path, vol)
    cdir = str(tmp_path / "ckpt")

    def run(out_dir):
        out_tpl = str(out_dir / "seg_{class}.npy")
        main(["infer3d", str(vol_path), "-o", out_tpl,
              "--model", tiny_config_yaml, "--median-slices", "1",
              "--min-size", "0", "--min-extent", "0", "--orthoplane",
              "--checkpoint-dir", cdir, "--checkpoint-every", "2", "--resume"])
        return np.load(out_dir / "seg_mito.npy")

    d1 = tmp_path / "run1"; d1.mkdir()
    d2 = tmp_path / "run2"; d2.mkdir()
    first = run(d1)
    assert os.path.exists(os.path.join(cdir, "trackers_xy_1.json"))
    second = run(d2)  # all axes resume from disk
    np.testing.assert_array_equal(first, second)


def test_tiles_roundtrip(tmp_path):
    from PIL import Image

    image = make_blob_image((80, 80), n_blobs=4)
    img_path = tmp_path / "big.tiff"
    Image.fromarray(image).save(img_path)
    tile_dir = tmp_path / "tiles"
    out_dir = tmp_path / "merged"

    main(["tiles", "chop", "--image", str(img_path), "--dir", str(tile_dir),
          "--patch-size", "48"])
    assert os.path.exists(tile_dir / "metadata.json")
    main(["tiles", "merge", "--dir", str(tile_dir), "--out", str(out_dir)])
    merged = np.asarray(Image.open(out_dir / "merged_image.tiff"))
    np.testing.assert_array_equal(merged, image)


def test_evaluate_identical(tmp_path, capsys):
    dump = {
        "class_id": 1, "label_divisor": 1000, "shape3d": [4, 8, 8],
        "axis": "xy", "finished": True,
        "instances": {
            "1001": {"box": [0, 0, 0, 2, 4, 4], "rle": "0 16 64 16"},
            "1002": {"box": [2, 4, 4, 4, 8, 8], "rle": "164 4 172 4"},
        },
    }
    gt = tmp_path / "gt.json"
    pred = tmp_path / "pred.json"
    gt.write_text(json.dumps(dump))
    pred.write_text(json.dumps(dump))

    main(["evaluate", str(gt), str(pred)])
    results = json.loads(capsys.readouterr().out)
    assert results["iou"] == pytest.approx(1.0)
    assert results["f1_50"] == pytest.approx(1.0)


def test_port_requires_arch(tmp_path):
    ckpt = tmp_path / "x.pth"
    ckpt.write_bytes(b"not a checkpoint")
    with pytest.raises(SystemExit, match="--arch"):
        main(["port", str(ckpt), "-o", str(tmp_path / "out")])


def test_unknown_model_listed(tmp_path):
    np.save(tmp_path / "img.npy", np.zeros((32, 32), np.uint8))
    with pytest.raises(SystemExit, match="unknown model"):
        main(["infer2d", str(tmp_path / "img.npy"), "--model", "NoSuchNet"])


def test_infer2d_roi_window(tmp_path, tiny_config_yaml):
    image = make_blob_image((128, 128), n_blobs=5)
    img_path = tmp_path / "img.npy"
    np.save(img_path, image)
    out_path = tmp_path / "pan_roi.npy"

    main(["infer2d", str(img_path), "-o", str(out_path),
          "--model", tiny_config_yaml, "--roi", "16:80,32:96"])
    pan = np.load(out_path)
    assert pan.shape == image.shape
    outside = pan.copy()
    outside[16:80, 32:96] = 0
    assert (outside == 0).all()            # nothing outside the window
    assert (pan[16:80, 32:96] != 0).any()  # something inside it


def test_infer2d_roi_mask(tmp_path, tiny_config_yaml):
    image = make_blob_image((96, 96), n_blobs=4)
    mask = np.zeros((96, 96), dtype=np.uint8)
    yy, xx = np.mgrid[0:96, 0:96]
    mask[((yy - 48) ** 2 + (xx - 48) ** 2) < 40**2] = 1  # disk "polygon"
    np.save(tmp_path / "img.npy", image)
    np.save(tmp_path / "mask.npy", mask)
    out_path = tmp_path / "pan_mask.npy"

    main(["infer2d", str(tmp_path / "img.npy"), "-o", str(out_path),
          "--model", tiny_config_yaml, "--roi-mask", str(tmp_path / "mask.npy")])
    pan = np.load(out_path)
    assert pan.shape == image.shape
    assert (pan[mask == 0] == 0).all()


def test_infer2d_bad_roi(tmp_path, tiny_config_yaml):
    np.save(tmp_path / "img.npy", np.zeros((64, 64), np.uint8))
    with pytest.raises(SystemExit, match="bad --roi"):
        main(["infer2d", str(tmp_path / "img.npy"),
              "--model", tiny_config_yaml, "--roi", "banana"])


def test_infer3d_orthoplane(tmp_path, tiny_config_yaml):
    vol = np.stack([make_blob_image((64, 64), n_blobs=3, seed=s) for s in range(8)])
    vol_path = tmp_path / "vol.npy"
    np.save(vol_path, vol)
    out_tpl = str(tmp_path / "ortho_{class}.npy")

    main(["infer3d", str(vol_path), "-o", out_tpl, "--orthoplane",
          "--model", tiny_config_yaml, "--median-slices", "1",
          "--min-size", "0", "--min-extent", "0", "--allow-one-view"])
    seg = np.load(tmp_path / "ortho_mito.npy")
    assert seg.shape == vol.shape


def test_train_cli(tmp_path):
    """Drive the train subcommand end-to-end from a yaml config file."""
    from PIL import Image

    rng = np.random.default_rng(5)
    d = tmp_path / "train" / "src"
    (d / "images").mkdir(parents=True)
    (d / "masks").mkdir(parents=True)
    for i in range(4):
        img = make_blob_image((64, 64), n_blobs=3, seed=i)
        mask = (img < 100).astype(np.uint16)  # blobs are dark
        Image.fromarray(img).save(d / "images" / f"{i:03d}.png")
        Image.fromarray(mask).save(d / "masks" / f"{i:03d}.png")

    config = {
        "model_name": "cli_tiny",
        "seed": 0,
        "MODEL": {
            "arch": "PanopticDeepLab", "encoder": "resnet18",
            "decoder_channels": 32, "low_level_stages": [1],
            "low_level_channels_project": [16], "ins_decoder": False,
        },
        "DATASET": {
            "class_names": {1: "blob"}, "labels": [1], "thing_list": [1],
            "norms": {"mean": 0.6, "std": 0.2},
        },
        "TRAIN": {
            "train_dir": str(tmp_path / "train"),
            "model_dir": str(tmp_path / "out"),
            "save_freq": 1, "amp": False, "epochs": 2, "batch_size": 2,
            "print_freq": 100,
            "criterion": "PanopticLoss",
            "criterion_params": {"top_k_percent": 0.2},
            "schedule_params": {"max_lr": 3e-3, "pct_start": 0.3},
            "optimizer_params": {"weight_decay": 0.01},
            "dataset_class": "SingleClassInstanceDataset",
            "dataset_params": {"weight_gamma": 0.3},
            "augmentations": [{"aug": "RandomCrop", "height": 64, "width": 64}],
            "metrics": [],
        },
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.dump(config))

    main(["train", str(cfg_path)])
    assert os.path.exists(tmp_path / "out" / "cli_tiny_checkpoint.msgpack")


def test_infer3d_multichip(tmp_path, tiny_config_yaml):
    """--multichip drives MultiChipEngine3d over the virtual device mesh."""
    vol = np.stack([make_blob_image((64, 64), n_blobs=3, seed=s) for s in range(8)])
    vol_path = tmp_path / "vol.npy"
    np.save(vol_path, vol)
    out_tpl = str(tmp_path / "mc_{class}.npy")

    main(["infer3d", str(vol_path), "-o", out_tpl, "--multichip",
          "--model", tiny_config_yaml, "--median-slices", "1",
          "--min-size", "0", "--min-extent", "0"])
    seg = np.load(tmp_path / "mc_mito.npy")
    assert seg.shape == vol.shape
    assert (seg > 0).any()


def test_finetune_cli(tmp_path, tiny_config_yaml, monkeypatch):
    """Drive the finetune subcommand: tiny registered-style model config +
    4-image dataset -> new bundle registered under model_name."""
    from PIL import Image

    import empanada_tpu.api.export as E
    import empanada_tpu.api.utils as U

    monkeypatch.setattr(U, "MODEL_DIR", str(tmp_path / "home"))
    monkeypatch.setattr(E, "MODEL_DIR", str(tmp_path / "home"))

    d = tmp_path / "train" / "src"
    (d / "images").mkdir(parents=True)
    (d / "masks").mkdir(parents=True)
    for i in range(4):
        img = make_blob_image((64, 64), n_blobs=3, seed=i)
        mask = (img < 100).astype(np.uint16)
        Image.fromarray(img).save(d / "images" / f"{i:03d}.png")
        Image.fromarray(mask).save(d / "masks" / f"{i:03d}.png")

    config = {
        "model_name": "cli_ft_tiny",
        "model_config": tiny_config_yaml,   # resolved by the CLI
        "TRAIN": {
            "train_dir": str(tmp_path / "train"),
            "model_dir": str(tmp_path / "out"),
            "amp": False, "epochs": 1, "batch_size": 2, "print_freq": 100,
            "schedule_params": {"max_lr": 1e-3, "pct_start": 0.3},
            "optimizer_params": {"weight_decay": 0.01},
            "augmentations": [{"aug": "RandomCrop", "height": 64, "width": 64}],
            "metrics": [],
        },
        "DATASET": {},
    }
    cfg_path = tmp_path / "ft.yaml"
    cfg_path.write_text(yaml.dump(config))

    main(["finetune", str(cfg_path)])
    from empanada_tpu.api import get_configs

    assert "cli_ft_tiny" in get_configs()


def test_infer2d_roi_out_of_bounds(tmp_path, tiny_config_yaml):
    np.save(tmp_path / "img.npy", np.zeros((64, 64), np.uint8))
    with pytest.raises(SystemExit, match="outside image bounds"):
        main(["infer2d", str(tmp_path / "img.npy"),
              "--model", tiny_config_yaml, "--roi", "0:128,0:64"])


def test_labels_count_and_filter(tmp_path, capsys):
    # ids encoded with the default divisor (10000, matching infer2d/infer3d
    # defaults so an all-default infer -> labels pipeline is consistent)
    seg = np.zeros((32, 32), np.int64)
    seg[2:6, 2:6] = 10001        # 16 px instance
    seg[10:12, 10:12] = 10002    # 4 px (small)
    seg[0:3, 20:24] = 20001      # touches border, class 2
    np.save(tmp_path / "seg.npy", seg)

    main(["labels", "count", str(tmp_path / "seg.npy"),
          "-o", str(tmp_path / "counts.csv")])
    out = capsys.readouterr().out
    assert "class 1: 2 labels" in out and "class 2: 1 labels" in out
    assert (tmp_path / "counts.csv").exists()

    main(["labels", "small", str(tmp_path / "seg.npy"),
          "-o", str(tmp_path / "filt.npy"), "--min-area", "8"])
    filt = np.load(tmp_path / "filt.npy")
    assert 10002 not in filt and 10001 in filt

    main(["labels", "boundary", str(tmp_path / "seg.npy"),
          "-o", str(tmp_path / "nb.npy")])
    nb = np.load(tmp_path / "nb.npy")
    assert 20001 not in nb and 10001 in nb

    # non-default divisor still honored
    seg2 = np.zeros((16, 16), np.int64)
    seg2[2:6, 2:6] = 1001
    np.save(tmp_path / "seg2.npy", seg2)
    main(["labels", "count", str(tmp_path / "seg2.npy"),
          "--label-divisor", "1000"])
    assert "class 1: 1 labels" in capsys.readouterr().out


def test_train_cli_multichip(tmp_path):
    """`train --multichip` shards the batch over the virtual 8-device mesh."""
    from PIL import Image

    d = tmp_path / "train" / "src"
    (d / "images").mkdir(parents=True)
    (d / "masks").mkdir(parents=True)
    for i in range(8):
        img = make_blob_image((64, 64), n_blobs=3, seed=i)
        mask = (img < 100).astype(np.uint16)
        Image.fromarray(img).save(d / "images" / f"{i:03d}.png")
        Image.fromarray(mask).save(d / "masks" / f"{i:03d}.png")

    config = {
        "model_name": "cli_mc",
        "seed": 0,
        "MODEL": {
            "arch": "PanopticDeepLab", "encoder": "resnet18",
            "decoder_channels": 32, "low_level_stages": [1],
            "low_level_channels_project": [16], "ins_decoder": False,
        },
        "DATASET": {
            "class_names": {1: "blob"}, "labels": [1], "thing_list": [1],
            "norms": {"mean": 0.6, "std": 0.2},
        },
        "TRAIN": {
            "train_dir": str(tmp_path / "train"),
            "model_dir": str(tmp_path / "out"),
            "save_freq": 1, "amp": False, "epochs": 1, "batch_size": 8,
            "print_freq": 100,
            "criterion": "PanopticLoss",
            "criterion_params": {"top_k_percent": 0.2},
            "schedule_params": {"max_lr": 3e-3, "pct_start": 0.3},
            "optimizer_params": {"weight_decay": 0.01},
            "dataset_class": "SingleClassInstanceDataset",
            "dataset_params": {"weight_gamma": 0.3},
            "augmentations": [{"aug": "RandomCrop", "height": 64, "width": 64}],
            "metrics": [],
        },
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.dump(config))

    main(["train", str(cfg_path), "--multichip"])
    assert os.path.exists(tmp_path / "out" / "cli_mc_checkpoint.msgpack")


def test_infer2d_spatial_shard(tmp_path, tiny_config_yaml):
    """--spatial-shard routes the slice through the halo-sharded engine."""
    img = make_blob_image((128, 128), n_blobs=4, seed=3)
    img_path = tmp_path / "img.npy"
    np.save(img_path, img)
    out = tmp_path / "pan.npy"

    main(["infer2d", str(img_path), "-o", str(out),
          "--model", tiny_config_yaml, "--spatial-shard", "--spatial-halo", "16"])
    pan = np.load(out)
    assert pan.shape == img.shape


def test_bench_cli_arg_forwarding(monkeypatch):
    """`cli bench` must not let bench.py re-parse the CLI's own argv
    (previously bench.main() parsed sys.argv and died on 'bench')."""
    import bench as bench_mod

    seen = {}
    monkeypatch.setattr(bench_mod, "main", lambda argv=None: seen.update(argv=argv))
    main(["bench", "--skip-3d", "--int8"])
    assert seen["argv"] == ["--skip-3d", "--int8"]


@pytest.fixture
def tiny_config_yaml_b(tmp_path, tiny_bundle):
    """Second 'model' (same tiny bundle, different class vocabulary) for
    multi-model runs."""
    cfg = {
        "class_names": {1: "nuclei"},
        "labels": [1],
        "thing_list": [1],
        "model": tiny_bundle,
        "padding_factor": 16,
        "norms": {"mean": 0.5, "std": 0.2},
    }
    path = tmp_path / "tiny_model_b.yaml"
    path.write_text(yaml.dump(cfg))
    return str(path)


def test_infer2d_multimodel(tmp_path, tiny_config_yaml, tiny_config_yaml_b,
                            capsys):
    """Repeated --model: per-model maps + a combined map with disjoint
    class-id spaces (BASELINE.md 'multi-model panoptic' workload)."""
    image = make_blob_image((96, 96), n_blobs=4)
    img_path = tmp_path / "img.npy"
    np.save(img_path, image)
    out_path = tmp_path / "pan_mm.npy"

    main(["infer2d", str(img_path), "-o", str(out_path),
          "--model", tiny_config_yaml, "--model", tiny_config_yaml_b])
    out = capsys.readouterr().out
    combined = np.load(out_path)
    pan_a = np.load(tmp_path / "pan_mm_tiny_model.npy")
    pan_b = np.load(tmp_path / "pan_mm_tiny_model_b.npy")
    assert combined.shape == image.shape
    assert "combined class 1: tiny_model/mito" in out
    assert "combined class 2: tiny_model_b/nuclei" in out
    # model A has priority: wherever A predicted, combined == A's map
    mask_a = pan_a > 0
    assert np.array_equal(combined[mask_a], pan_a[mask_a])
    # both models share weights here, so B-only pixels must be empty and
    # every B prediction sits under A's (class-shifted) footprint
    only_b = (pan_b > 0) & ~mask_a
    assert not only_b.any()


def test_infer2d_duplicate_model_rejected(tmp_path, tiny_config_yaml):
    image = make_blob_image((64, 64), n_blobs=2)
    img_path = tmp_path / "img.npy"
    np.save(img_path, image)
    with pytest.raises(SystemExit, match="duplicate"):
        main(["infer2d", str(img_path), "-o", str(tmp_path / "x.npy"),
              "--model", tiny_config_yaml, "--model", tiny_config_yaml])


def test_infer3d_multimodel(tmp_path, tiny_config_yaml, tiny_config_yaml_b,
                            capsys):
    vol = np.stack([make_blob_image((64, 64), n_blobs=3)] * 4)
    vol_path = tmp_path / "vol.npy"
    np.save(vol_path, vol)
    out_tpl = str(tmp_path / "mm_{class}.npy")

    main(["infer3d", str(vol_path), "-o", out_tpl,
          "--model", tiny_config_yaml, "--model", tiny_config_yaml_b,
          "--median-slices", "1", "--min-size", "0", "--min-extent", "0"])
    out = capsys.readouterr().out
    assert "class tiny_model/mito:" in out
    assert "class tiny_model_b/nuclei:" in out
    a = np.load(tmp_path / "mm_tiny_model_mito.npy")
    b = np.load(tmp_path / "mm_tiny_model_b_nuclei.npy")
    assert a.shape == vol.shape and b.shape == vol.shape
    # identical weights -> identical segmentation either way
    assert np.array_equal(a > 0, b > 0)
