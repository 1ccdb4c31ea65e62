"""Training-layer tests: losses, freezing, metrics, and a real end-to-end
mini training run on synthetic data (loss must drop and the trained model
must segment held-out blobs better than chance)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import empanada_tpu.train as T
from empanada_tpu.data.targets import heatmap_and_offsets
from empanada_tpu.models import create_model


def make_blob_example(rng, size=64, n_blobs=3):
    """Dark disks on bright noise; mask = instance labels."""
    img = rng.normal(0.8, 0.05, (size, size))
    mask = np.zeros((size, size), dtype=np.int64)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n_blobs):
        cy, cx = rng.integers(10, size - 10, 2)
        r = rng.integers(4, 9)
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2
        img[blob] = rng.normal(0.25, 0.05)
        mask[blob] = i + 1
    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return img, mask


@pytest.fixture(scope="module")
def synthetic_dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("blobs")
    rng = np.random.default_rng(11)
    for split in ("train", "eval"):
        d = root / split / "source_a"
        (d / "images").mkdir(parents=True)
        (d / "masks").mkdir(parents=True)
        for i in range(12 if split == "train" else 2):
            img, mask = make_blob_example(rng)
            Image.fromarray(img).save(d / "images" / f"{i:03d}.png")
            Image.fromarray(mask.astype(np.uint16)).save(d / "masks" / f"{i:03d}.png")
    return str(root)


class TestDataLayerGuards:
    """Silent-corruption guards in the data layer (round-2 review)."""

    def test_mismatched_masks_fail_loudly(self, tmp_path):
        from PIL import Image

        from empanada_tpu.data.datasets import SingleClassInstanceDataset

        d = tmp_path / "train" / "src"
        (d / "images").mkdir(parents=True)
        (d / "masks").mkdir(parents=True)
        for i in range(3):
            Image.fromarray(np.zeros((8, 8), np.uint8)).save(d / "images" / f"{i}.png")
        for i in range(2):  # one mask missing
            Image.fromarray(np.zeros((8, 8), np.uint16)).save(d / "masks" / f"{i}.png")
        with pytest.raises(ValueError, match="3 images but 2 masks"):
            SingleClassInstanceDataset(str(tmp_path / "train"))

    def test_empty_source_fails_loudly(self, tmp_path):
        from empanada_tpu.data.datasets import SingleClassInstanceDataset

        d = tmp_path / "train" / "src"
        (d / "images").mkdir(parents=True)
        (d / "masks").mkdir(parents=True)
        with pytest.raises(ValueError, match="no images"):
            SingleClassInstanceDataset(str(tmp_path / "train"), weight_gamma=0.3)

    def test_gauss_noise_float_image_stays_in_range(self):
        from empanada_tpu.data.augment import GaussNoise

        rng = np.random.default_rng(0)
        img = rng.random((32, 32)).astype(np.float32)
        out = GaussNoise(var_limit=(40.0, 50.0), p=1.0)(img, rng=rng)["image"]
        assert out.min() >= 0.0 and out.max() <= 1.0
        # noise is scaled to the [0,1] range, not the 0-255 scale
        assert np.abs(out - img).mean() < 0.1

    def test_pad_border_mode_reflects(self):
        from empanada_tpu.data.augment import PadIfNeeded

        img = np.arange(4, dtype=np.uint8).reshape(2, 2)
        out = PadIfNeeded(4, 2, border_mode=2, p=1.0)(img, rng=None)["image"]
        assert out.shape == (4, 2)
        assert np.array_equal(out[0], img[0])  # symmetric reflect, no zeros
        with pytest.raises(ValueError, match="unsupported border_mode"):
            PadIfNeeded(4, 4, border_mode=3)

    def test_center_crop_rejects_undersized(self):
        from empanada_tpu.data.augment import CenterCrop

        with pytest.raises(AssertionError, match="pad before cropping"):
            CenterCrop(64, 64)(np.zeros((32, 32), np.uint8), rng=None)


class TestLosses:
    def test_panoptic_loss_finite(self, rng):
        out = {
            "sem_logits": jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32),
            "ctr_hmp": jnp.asarray(rng.random((2, 16, 16, 1)), jnp.float32),
            "offsets": jnp.asarray(rng.normal(size=(2, 16, 16, 2)), jnp.float32),
        }
        tgt = {
            "sem": jnp.asarray(rng.integers(0, 2, (2, 16, 16)), jnp.int32),
            "ctr_hmp": jnp.asarray(rng.random((2, 16, 16, 1)), jnp.float32),
            "offsets": jnp.asarray(rng.normal(size=(2, 16, 16, 2)), jnp.float32),
        }
        total, aux = T.PanopticLoss()(out, tgt)
        assert np.isfinite(float(total))
        assert set(aux) >= {"ce", "l1", "mse", "total_loss"}

    def test_offset_l1_empty_mask_is_zero(self):
        out = jnp.ones((1, 4, 4, 2))
        tgt = jnp.zeros((1, 4, 4, 2))
        w = jnp.zeros((1, 4, 4, 1))
        assert float(T.offset_l1(out, tgt, w)) == 0.0

    def test_bootstrap_ce_topk(self):
        # fraction 1.0 equals plain mean BCE
        logits = jnp.asarray([[[[2.0]], [[-2.0]]]])  # (1, 2, 1, 1)
        labels = jnp.asarray([[[1], [0]]])  # matching shape (1, 2, 1)
        full = T.bootstrap_ce(logits, labels, 1.0)
        top = T.bootstrap_ce(logits, labels, 0.5)
        assert float(top) >= float(full)


class TestFreezing:
    def test_freeze_stages(self):
        model = create_model(
            "PanopticDeepLab", encoder="resnet18", num_classes=1,
            decoder_channels=16, low_level_channels_project=(8, 8, 8),
        )
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 1)), train=False
        )
        params = variables["params"]
        mask_all = T.freeze_encoder_mask(params, "all")
        enc_leaves = jax.tree.leaves(mask_all["encoder"])
        assert not any(enc_leaves)
        assert all(jax.tree.leaves(mask_all["semantic_decoder"]))

        mask_s2 = T.freeze_encoder_mask(params, "stage2")
        assert not any(jax.tree.leaves(mask_s2["encoder"]["layer1_block1"]))
        assert not any(jax.tree.leaves(mask_s2["encoder"]["layer2_block1"]))
        assert all(jax.tree.leaves(mask_s2["encoder"]["layer3_block1"]))


class TestMetrics:
    def test_iou_perfect(self):
        sem = np.zeros((1, 8, 8), np.int32)
        sem[0, :4] = 1
        logits = np.where(sem > 0, 5.0, -5.0)[..., None].astype(np.float32)
        m = T.IoU(T.AverageMeter, [1])
        vals = m.calculate({"sem_logits": logits}, {"sem": sem})
        assert vals[1] == pytest.approx(1.0, abs=1e-3)

    def test_pq_f1(self):
        pan = np.zeros((16, 16), np.int64)
        pan[2:8, 2:8] = 1001
        pan[10:14, 10:14] = 1002
        pq = T.PQ(T.AverageMeter, [1], label_divisor=1000)
        f1 = T.F1(T.AverageMeter, [1], label_divisor=1000)
        assert pq.calculate({"pan_seg": pan}, {"pan_seg": pan})[1] == pytest.approx(1.0, abs=1e-4)
        assert f1.calculate({"pan_seg": pan}, {"pan_seg": pan})[1] == pytest.approx(1.0)
        # shifted prediction loses one instance
        pred = np.zeros_like(pan)
        pred[2:8, 2:8] = 1001
        assert f1.calculate({"pan_seg": pred}, {"pan_seg": pan})[1] == pytest.approx(2 / 3, abs=1e-3)


class TestEndToEndTraining:
    def test_main_learns(self, synthetic_dataset_dir, tmp_path):
        config = {
            "model_name": "tiny_blobs",
            "seed": 0,
            "MODEL": {
                "arch": "PanopticDeepLab",
                "encoder": "resnet18",
                "decoder_channels": 32,
                "low_level_stages": [1],
                "low_level_channels_project": [16],
                "ins_decoder": False,
            },
            "DATASET": {
                "class_names": {1: "blob"},
                "labels": [1],
                "thing_list": [1],
                "norms": {"mean": 0.6, "std": 0.2},
            },
            "TRAIN": {
                "train_dir": os.path.join(synthetic_dataset_dir, "train"),
                "model_dir": str(tmp_path),
                "save_freq": 100,
                "amp": False,
                "epochs": 30,
                "batch_size": 4,
                "print_freq": 30,
                "criterion": "PanopticLoss",
                "criterion_params": {"top_k_percent": 0.2},
                "schedule_params": {"max_lr": 3e-3, "pct_start": 0.3},
                "optimizer_params": {"weight_decay": 0.01},
                "dataset_class": "SingleClassInstanceDataset",
                "dataset_params": {"weight_gamma": 0.3},
                "augmentations": [
                    {"aug": "RandomCrop", "height": 64, "width": 64},
                ],
                "metrics": [],
            },
        }
        model, state = T.main(config)

        # the trained model must segment a held-out blob image decently
        from empanada_tpu.train.state import make_eval_step

        rng = np.random.default_rng(99)
        img, mask = make_blob_example(rng)
        norm = (img.astype(np.float32) - 0.6 * 255) / (0.2 * 255)
        out = make_eval_step()(state, jnp.asarray(norm)[None, ..., None])
        pred = np.asarray(out["sem_logits"][0, ..., 0]) > 0
        gt = mask > 0
        iou = np.logical_and(pred, gt).sum() / max(1, np.logical_or(pred, gt).sum())
        assert iou > 0.3, f"trained model IoU too low: {iou:.3f}"

        # checkpoint written and restorable
        ckpt = os.path.join(str(tmp_path), "tiny_blobs_checkpoint.msgpack")
        assert os.path.exists(ckpt)
        restored = T.load_checkpoint(ckpt, state)
        assert int(restored.step) == int(state.step)


class TestTrainingResume:
    def _config(self, synthetic_dataset_dir, tmp_path, epochs):
        return {
            "model_name": "resumable",
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
                "train_dir": os.path.join(synthetic_dataset_dir, "train"),
                "model_dir": str(tmp_path),
                "save_freq": 1,
                "epochs": epochs,
                "batch_size": 4,
                "print_freq": 1000,
                "criterion": "PanopticLoss",
                "dataset_class": "SingleClassInstanceDataset",
                "augmentations": [
                    {"aug": "RandomCrop", "height": 64, "width": 64},
                ],
                "metrics": [],
            },
        }

    def test_killed_run_continues_from_checkpoint(
        self, synthetic_dataset_dir, tmp_path, capsys
    ):
        """TRAIN.resume restores params + optimizer state + epoch, so a
        rerun after a crash continues instead of restarting (reference
        checkpoints cannot resume: they save only arch + state_dict)."""
        import empanada_tpu.train as T

        # "crashed" run: completes only 2 of 4 epochs
        _, state2 = T.main(self._config(synthetic_dataset_dir, tmp_path, 2))
        steps_per_epoch = int(state2.step) // 2

        cfg = self._config(synthetic_dataset_dir, tmp_path, 4)
        cfg["TRAIN"]["resume"] = True
        _, state4 = T.main(cfg)
        out = capsys.readouterr().out
        assert "resumed from" in out and "epoch 2" in out
        assert int(state4.step) == 4 * steps_per_epoch

        # resume=True without a checkpoint starts fresh (no crash)
        cfg = self._config(synthetic_dataset_dir, tmp_path, 1)
        cfg["model_name"] = "fresh"
        cfg["TRAIN"]["resume"] = True
        _, state1 = T.main(cfg)
        assert int(state1.step) == steps_per_epoch


class TestMultichipTraining:
    """Data-parallel training through the user surface (TRAIN.multichip):
    batch axis sharded over the 8-device CPU mesh — the reference only
    ships a DistributedWeightedSampler without wiring
    (/root/reference/empanada/data/utils/sampler.py:10)."""

    def _config(self, synthetic_dataset_dir, tmp_path, multichip):
        return {
            "model_name": f"mc_{int(multichip)}",
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
                "train_dir": os.path.join(synthetic_dataset_dir, "train"),
                "model_dir": str(tmp_path),
                "save_freq": 100, "amp": False, "epochs": 2, "batch_size": 8,
                "print_freq": 1000, "multichip": multichip,
                "criterion": "PanopticLoss",
                "criterion_params": {"top_k_percent": 0.2},
                "schedule_params": {"max_lr": 1e-3, "pct_start": 0.3},
                "optimizer_params": {"weight_decay": 0.01},
                "dataset_class": "SingleClassInstanceDataset",
                "dataset_params": {"weight_gamma": 0.3},
                "augmentations": [{"aug": "RandomCrop", "height": 64, "width": 64}],
                "metrics": [],
            },
        }

    def test_matches_single_device_trajectory(self, synthetic_dataset_dir, tmp_path):
        import jax

        assert len(jax.devices()) == 8  # conftest virtual mesh
        _, state_1 = T.main(self._config(synthetic_dataset_dir, tmp_path / "a", False))
        _, state_8 = T.main(self._config(synthetic_dataset_dir, tmp_path / "b", True))

        # same seed + same sample stream -> parameter trajectories agree up
        # to cross-device reduction order (observed drift over 30 AdamW
        # steps: ~1e-3 absolute on near-zero params; a wiring bug — wrong
        # sharding, skipped shards — produces O(1e-1) divergence)
        flat1 = jax.tree.leaves(state_1.params)
        flat8 = jax.tree.leaves(state_8.params)
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
            )

    def test_batch_not_divisible_raises(self, synthetic_dataset_dir, tmp_path):
        cfg = self._config(synthetic_dataset_dir, tmp_path, True)
        cfg["TRAIN"]["batch_size"] = 3
        with pytest.raises(ValueError, match="divisible"):
            T.main(cfg)


def test_remat_train_step_identical_grads(synthetic_dataset_dir):
    """jax.checkpoint rematerialization must not change the step numerics:
    one step with remat == one step without, bit-for-bit."""
    import jax
    from empanada_tpu.train.losses import PanopticLoss
    from empanada_tpu.train.state import (
        adamw_with_decay_mask, create_train_state, make_train_step,
        onecycle_schedule,
    )

    model = create_model(
        "PanopticDeepLab", encoder="resnet18", num_classes=1,
        decoder_channels=32, low_level_stages=(1,),
        low_level_channels_project=(16,), ins_decoder=False,
    )
    tx = adamw_with_decay_mask(onecycle_schedule(1e-3, 10), weight_decay=0.01)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 64, 64, 1), jnp.float32), tx
    )
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (2, 64, 64, 1)), jnp.float32),
        "sem": jnp.asarray(rng.integers(0, 2, (2, 64, 64)), jnp.int32),
        "ctr_hmp": jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32),
        "offsets": jnp.asarray(rng.normal(0, 2, (2, 64, 64, 2)), jnp.float32),
    }
    key = jax.random.key(3)

    plain = make_train_step(PanopticLoss(), donate=False)
    remat = make_train_step(PanopticLoss(), donate=False, remat=True)
    s1, a1 = plain(state, batch, key)
    s2, a2 = remat(state, batch, key)
    assert float(a1["total_loss"]) == float(a2["total_loss"])
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestMulticlass:
    @pytest.fixture(scope="class")
    def twoclass_dataset_dir(self, tmp_path_factory):
        """Panoptic masks with two thing classes (ids class*1000 + k)."""
        root = tmp_path_factory.mktemp("twoclass")
        rng = np.random.default_rng(5)
        d = root / "train" / "source_a"
        (d / "images").mkdir(parents=True)
        (d / "masks").mkdir(parents=True)
        size = 64
        yy, xx = np.mgrid[0:size, 0:size]
        for i in range(8):
            img = rng.normal(0.8, 0.05, (size, size))
            mask = np.zeros((size, size), dtype=np.int32)
            for class_id, shade in ((1, 0.25), (2, 0.5)):
                cy, cx = rng.integers(12, size - 12, 2)
                r = int(rng.integers(5, 9))
                blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r**2
                img[blob] = rng.normal(shade, 0.03)
                mask[blob] = class_id * 1000 + 1
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                d / "images" / f"{i:03d}.png"
            )
            Image.fromarray(mask.astype(np.uint16)).save(d / "masks" / f"{i:03d}.png")
        return str(root)

    def test_multiclass_gets_background_channel(self, twoclass_dataset_dir, tmp_path):
        """len(labels)==2 must build an n+1=3 channel model (reference
        _train.py:184) — with 2 channels, label 2 is silently untrainable."""
        config = {
            "model_name": "twoclass",
            "seed": 0,
            "MODEL": {
                "arch": "PanopticDeepLab",
                "encoder": "resnet18",
                "decoder_channels": 32,
                "low_level_stages": [1],
                "low_level_channels_project": [16],
                "ins_decoder": True,
            },
            "DATASET": {
                "class_names": {1: "a", 2: "b"},
                "labels": [1, 2],
                "thing_list": [1, 2],
                "norms": {"mean": 0.6, "std": 0.2},
            },
            "TRAIN": {
                "train_dir": os.path.join(twoclass_dataset_dir, "train"),
                "model_dir": str(tmp_path),
                "save_freq": 100,
                "amp": False,
                "epochs": 1,
                "batch_size": 4,
                "print_freq": 100,
                "criterion": "PanopticLoss",
                "schedule_params": {"max_lr": 1e-3},
                "dataset_class": "PanopticDataset",
                "augmentations": [{"aug": "RandomCrop", "height": 64, "width": 64}],
                "metrics": [],
            },
        }
        model, state = T.main(config)
        assert model.num_classes == 3
        from empanada_tpu.train.state import make_eval_step

        out = make_eval_step()(state, jnp.zeros((1, 64, 64, 1)))
        assert out["sem_logits"].shape[-1] == 3


def test_validate_compares_instances(synthetic_dataset_dir, tmp_path):
    """validate() must recover GT instance identities via the panoptic
    postprocess (reference train.py:449-454), not one merged segment."""
    config = {
        "model_name": "tiny",
        "seed": 0,
        "MODEL": {
            "arch": "PanopticDeepLab",
            "encoder": "resnet18",
            "decoder_channels": 32,
            "low_level_stages": [1],
            "low_level_channels_project": [16],
            "ins_decoder": True,
        },
        "DATASET": {
            "class_names": {1: "blob"},
            "labels": [1],
            "thing_list": [1],
            "norms": {"mean": 0.6, "std": 0.2},
        },
        "TRAIN": {
            "train_dir": os.path.join(synthetic_dataset_dir, "train"),
            "model_dir": str(tmp_path),
            "amp": False,
            "epochs": 1,
            "batch_size": 4,
            "criterion": "PanopticLoss",
            "schedule_params": {"max_lr": 1e-3},
            "dataset_class": "SingleClassInstanceDataset",
            "augmentations": [{"aug": "RandomCrop", "height": 64, "width": 64}],
            "metrics": [],
        },
        "EVAL": {
            "eval_dir": os.path.join(synthetic_dataset_dir, "eval"),
            "padding_factor": 16,
            "engine_params": {"label_divisor": 1000, "confidence_thr": 0.5},
            "metrics": [{"metric": "F1", "name": "F1_50", "label_divisor": 1000,
                         "iou_thr": 0.5}],
        },
    }
    model, state = T.main(config)
    metrics = T.validate(config, model, state)
    # the GT side must contain >1 instance for multi-blob images: verify by
    # reconstructing it the same way validate does
    from empanada_tpu.data.datasets import create_dataset
    from empanada_tpu.data.augment import create_augmentations
    from empanada_tpu.ops import postprocess as pp

    tfs = create_augmentations([{"aug": "Normalize", **config["DATASET"]["norms"]}])
    eval_set = create_dataset(
        "SingleClassInstanceDataset",
        config["EVAL"]["eval_dir"], transforms=tfs, weight_gamma=0.3,
    )
    item = eval_set[0]
    gt = np.asarray(
        pp.get_panoptic_segmentation(
            jnp.asarray(item["sem"])[None],
            jnp.asarray(item["ctr_hmp"])[None],
            jnp.asarray(item["offsets"])[None],
            (1,), 1000, 64, 0, 0.1, 7, 2, 64,
        )[0]
    )
    assert len(np.unique(gt[gt > 0])) > 1, "GT should carry multiple instances"
