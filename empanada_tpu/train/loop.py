"""Config-driven training and finetuning (reference
``empanada_napari/train.py`` / ``finetune.py``).

Differences from the reference, by design:
- optax instead of torch.optim: AdamW with bias/norm excluded from weight
  decay (the reference's parameter grouping), OneCycle warmup-cosine schedule
  stepped per batch;
- bf16 compute with f32 params replaces AMP GradScaler (TPUs need no loss
  scaling);
- checkpoints include the optimizer state (the reference saves only
  {arch, state_dict, norms} and cannot resume mid-run);
- deployment artifact is a flax model bundle (.eptpu) + registry yaml instead
  of a TorchScript archive (reference _train.py:43-101 quantize+script step).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml
from flax import serialization

from empanada_tpu.api.utils import add_new_model, save_model_bundle
from empanada_tpu.data.augment import create_augmentations
from empanada_tpu.data.datasets import WeightedBatchLoader, create_dataset
from empanada_tpu.engine.engines import PanopticDeepLabEngine
from empanada_tpu.models import create_model
from empanada_tpu.ops import postprocess as pp
from empanada_tpu.train.losses import BCLoss, PanopticLoss
from empanada_tpu.train.metrics import (
    AverageMeter,
    ComposeMetrics,
    EMAMeter,
    create_metric,
)
from empanada_tpu.train.state import (
    TrainState,
    adamw_with_decay_mask,
    create_train_state,
    make_eval_step,
    make_train_step,
    onecycle_schedule,
)

__all__ = ["main", "finetune_main", "freeze_encoder_mask", "save_checkpoint",
           "load_checkpoint"]

LOSS_REGISTRY = {"PanopticLoss": PanopticLoss, "BCLoss": BCLoss}


def freeze_encoder_mask(params, finetune_layer: str = "none"):
    """Boolean pytree: True where params are trainable.

    ``finetune_layer`` semantics follow the reference (train.py:122-145):
    'none' trains everything; 'stage1'..'stage4' freeze the encoder UP TO AND
    INCLUDING that stage (plus the stem); 'all' freezes the whole encoder.
    """
    if finetune_layer == "none":
        return jax.tree.map(lambda _: True, params)

    frozen_stages = {
        "stage1": 1, "stage2": 2, "stage3": 3, "stage4": 4, "all": 4,
    }[finetune_layer]
    freeze_all_encoder = finetune_layer == "all"

    def trainable(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if not names or names[0] != "encoder":
            return True
        if freeze_all_encoder:
            return False
        sub = names[1] if len(names) > 1 else ""
        if sub.startswith("stem"):
            return False
        # resnet: layer{k}_block{j}; regnet: stage{k}_block{j}
        for prefix in ("layer", "stage"):
            if sub.startswith(prefix):
                try:
                    k = int(sub[len(prefix):].split("_")[0])
                except (ValueError, IndexError):
                    return True
                return k > frozen_stages
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


def _apply_freeze(tx, trainable_mask):
    """Zero updates for frozen params."""
    frozen = jax.tree.map(lambda t: not t, trainable_mask)
    return optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))


def save_checkpoint(path: str, state: TrainState, config: dict):
    blob = serialization.to_bytes(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "step": state.step}
    )
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".yaml", "w") as f:
        yaml.safe_dump({"config": _yaml_safe(config)}, f)


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    with open(path, "rb") as f:
        blob = f.read()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
    restored = serialization.from_bytes(template, blob)
    return state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=jnp.asarray(restored["step"]),
    )


def _yaml_safe(obj):
    if isinstance(obj, dict):
        return {k: _yaml_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_yaml_safe(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def _build_dataset(config, norms):
    train_cfg = config["TRAIN"]
    dataset_cfg = config["DATASET"]

    augs = list(train_cfg.get("augmentations", []))
    # inject normalization to match inference preprocessing
    augs = augs + [{"aug": "Normalize", **norms}]
    tfs = create_augmentations(augs, seed=config.get("seed", 0))

    dataset_class = train_cfg["dataset_class"]
    dataset_params = dict(train_cfg.get("dataset_params", {}))
    common = dict(transforms=tfs, **dataset_params)
    if dataset_class == "PanopticDataset":
        common.update(
            labels=dataset_cfg["labels"],
            thing_list=dataset_cfg["thing_list"],
            label_divisor=train_cfg.get("label_divisor", 1000),
        )
    dataset = create_dataset(dataset_class, train_cfg["train_dir"], **common)
    for extra_dir in train_cfg.get("additional_train_dirs") or []:
        dataset = dataset + create_dataset(dataset_class, extra_dir, **common)
    return dataset


def main(config: dict, model_and_state=None):
    """Train from a config dict with the reference's schema
    (training/train_config.yaml).  Returns (model, final TrainState)."""
    train_cfg = config["TRAIN"]
    dataset_cfg = config["DATASET"]
    model_dir = train_cfg.get("model_dir", ".")
    os.makedirs(model_dir, exist_ok=True)

    norms = dataset_cfg["norms"]
    # reference semantics (_train.py:184): multiclass models get a
    # background channel (n + 1); single-class is sigmoid over 1 channel.
    # An explicit MODEL.num_classes wins.
    n_labels = len(dataset_cfg["labels"])
    num_classes = config.get("MODEL", {}).get(
        "num_classes", n_labels + 1 if n_labels > 1 else 1
    )

    # ----- mesh (data-parallel multi-chip training) -------------------------
    # reference analog: DistributedWeightedSampler + DDP
    # (/root/reference/empanada/data/utils/sampler.py:10) — here ONE jitted
    # step whose batch axis is sharded over the mesh; XLA averages gradients
    multichip = bool(train_cfg.get("multichip", False))
    mesh = data_shard = repl = None
    if multichip:
        from empanada_tpu.parallel.mesh import (
            create_mesh, data_sharding, replicated,
        )

        mesh = create_mesh()
        n_dev = int(mesh.devices.size)

    # ----- data ------------------------------------------------------------
    dataset = _build_dataset(config, norms)
    batch_size = train_cfg.get("batch_size", 16)
    if multichip:
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the "
                f"{n_dev}-device mesh"
            )
        data_shard = data_sharding(mesh)
        repl = replicated(mesh)
        # multi-host: batch_size is the GLOBAL batch; each process loads
        # only its batch_size / process_count rows of it (disjoint sample
        # streams) and contributes them as its addressable shards.
        # Single-host process_count() == 1 reduces to the plain loader.
        n_proc = jax.process_count()
        if batch_size % (n_proc or 1):
            raise ValueError(
                f"batch_size {batch_size} must be divisible by "
                f"{n_proc} processes"
            )
        loader = WeightedBatchLoader(
            dataset, batch_size // n_proc, seed=config.get("seed", 0),
            shard=jax.process_index(), num_shards=n_proc,
        )
    else:
        loader = WeightedBatchLoader(dataset, batch_size, seed=config.get("seed", 0))
    steps_per_epoch = max(1, len(loader))
    epochs = train_cfg.get("epochs", train_cfg.get("schedule_params", {}).get("epochs", 1))
    total_steps = steps_per_epoch * epochs

    # ----- model + optimizer ----------------------------------------------
    if model_and_state is None:
        model_config = dict(config["MODEL"])
        arch = model_config.pop("arch")
        model_config["num_classes"] = int(num_classes)
        compute_dtype = jnp.bfloat16 if train_cfg.get("amp", True) else jnp.float32
        model = create_model(arch, dtype=compute_dtype, **model_config)

        sched_params = train_cfg.get("schedule_params", {})
        schedule = onecycle_schedule(
            sched_params.get("max_lr", 3e-3), total_steps,
            sched_params.get("pct_start", 0.3),
        )
        tx = adamw_with_decay_mask(
            schedule, train_cfg.get("optimizer_params", {}).get("weight_decay", 0.1)
        )

        crop = _crop_size(train_cfg)
        sample = jnp.zeros((batch_size, crop, crop, 1), jnp.float32)
        state = create_train_state(model, jax.random.key(config.get("seed", 0)), sample, tx)

        # optional encoder freezing (finetune_layer)
        finetune_layer = train_cfg.get("finetune_layer", "none") or "none"
        if finetune_layer != "none":
            trainable = freeze_encoder_mask(state.params, finetune_layer)
            state = state.replace(tx=_apply_freeze(tx, trainable))
            state = state.replace(opt_state=state.tx.init(state.params))

        # optional pretrained encoder weights from a bundle
        pretraining = train_cfg.get("encoder_pretraining")
        if pretraining:
            from empanada_tpu.api.utils import load_model_bundle

            _, pre_vars = load_model_bundle(pretraining)
            params = dict(state.params)
            params["encoder"] = pre_vars["params"]["encoder"]
            state = state.replace(params=type(state.params)(params))
    else:
        model, state = model_and_state

    if multichip:
        state = jax.device_put(state, repl)

    # ----- loss + metrics ---------------------------------------------------
    criterion_cls = LOSS_REGISTRY[train_cfg.get("criterion", "PanopticLoss")]
    criterion = criterion_cls(**train_cfg.get("criterion_params", {}))
    # TRAIN.remat: recompute activations in backward (jax.checkpoint) —
    # enables big-crop/big-batch training that wouldn't fit HBM otherwise
    train_step = make_train_step(criterion, remat=bool(train_cfg.get("remat", False)))

    metric_specs = train_cfg.get("metrics", [])
    metrics = ComposeMetrics(
        {
            spec.get("name", spec["metric"]): create_metric(
                spec, EMAMeter, dataset_cfg["labels"]
            )
            for spec in metric_specs
        },
        dataset_cfg.get("class_names") or {l: str(l) for l in dataset_cfg["labels"]},
    )

    # ----- epoch loop --------------------------------------------------------
    rng = jax.random.key(config.get("seed", 0) + 1)
    save_freq = train_cfg.get("save_freq") or epochs
    print_freq = train_cfg.get("print_freq", 50)
    model_name = config.get("model_name") or "model"

    step_count = 0
    eval_step = make_eval_step() if metric_specs else None  # one jit cache
    for epoch in range(epochs):
        t_epoch = time.time()
        for batch in loader:
            if multichip and jax.process_count() > 1:
                # assemble the global batch from each process's local rows
                batch = {
                    k: jax.make_array_from_process_local_data(
                        data_shard, np.asarray(v)
                    )
                    for k, v in batch.items()
                }
            elif multichip:
                # direct sharded placement (no staging on device 0)
                batch = {
                    k: jax.device_put(np.asarray(v), data_shard)
                    for k, v in batch.items()
                }
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, aux = train_step(state, batch, rng)
            step_count += 1
            if step_count % print_freq == 0:
                loss = float(aux["total_loss"])
                print(f"epoch {epoch + 1} step {step_count}: loss {loss:.4f}")
                if metric_specs:
                    # cheap metric on the last batch only
                    eval_out = eval_step(state, batch["image"])
                    metrics.evaluate(
                        {k: np.asarray(v) for k, v in eval_out.items()},
                        {k: np.asarray(v) for k, v in batch.items()},
                    )
                    metrics.display()
        print(f"epoch {epoch + 1}/{epochs} done in {time.time() - t_epoch:.1f}s")

        if (epoch + 1) % save_freq == 0 or (epoch + 1) == epochs:
            ckpt = os.path.join(model_dir, f"{model_name}_checkpoint.msgpack")
            save_checkpoint(ckpt, state, config)

        eval_cfg = config.get("EVAL") or {}
        if eval_cfg.get("eval_dir") and (epoch + 1) % eval_cfg.get("epochs_per_eval", 1) == 0:
            validate(config, model, state)

    return model, state


def validate(config: dict, model, state: TrainState):
    """Engine-based validation: run real panoptic postprocessing on eval
    images and compute PQ/F1 (reference train.py:404-482)."""
    eval_cfg = config["EVAL"]
    dataset_cfg = config["DATASET"]
    train_cfg = config["TRAIN"]

    norms = dataset_cfg["norms"]
    tfs = create_augmentations([{"aug": "Normalize", **norms}])
    dataset_class = train_cfg["dataset_class"]
    common = dict(transforms=tfs, **train_cfg.get("dataset_params", {}))
    if dataset_class == "PanopticDataset":
        common.update(
            labels=dataset_cfg["labels"],
            thing_list=dataset_cfg["thing_list"],
            label_divisor=train_cfg.get("label_divisor", 1000),
        )
    eval_set = create_dataset(dataset_class, eval_cfg["eval_dir"], **common)

    engine_params = dict(eval_cfg.get("engine_params", {}))
    engine_params.setdefault("thing_list", dataset_cfg["thing_list"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    engine = PanopticDeepLabEngine(model, variables, **engine_params)

    metrics = ComposeMetrics(
        {
            spec.get("name", spec["metric"]): create_metric(
                spec, AverageMeter, dataset_cfg["labels"]
            )
            for spec in eval_cfg.get("metrics", [])
        },
        dataset_cfg.get("class_names") or {l: str(l) for l in dataset_cfg["labels"]},
    )

    # GT pan_seg comes from running the SAME panoptic postprocess on the
    # ground-truth sem/heatmap/offsets (reference train.py:449-454) — this
    # recovers GT instance identities so PQ/F1 compare instances, not one
    # merged segment per class
    import jax as _jax
    import jax.numpy as _jnp

    from empanada_tpu.data.volume import factor_pad_numpy
    from empanada_tpu.ops import postprocess as pp

    pad_factor = int(eval_cfg.get("padding_factor", 128))

    @_jax.jit
    def _gt_post(sem_hard, ctr_hmp, offsets):
        return pp.get_panoptic_segmentation(
            sem_hard, ctr_hmp, offsets, engine.thing_list, engine.label_divisor,
            engine.stuff_area, engine.void_label, engine.nms_threshold,
            engine.nms_kernel, engine.num_classes, engine.max_centers,
        )

    for idx in range(len(eval_set)):
        item = eval_set[idx]
        image = item["image"][..., 0] if item["image"].ndim == 3 else item["image"]
        h, w = image.shape
        # pad to the model's stride factor; crop the prediction back
        pan = engine(factor_pad_numpy(image.astype(np.float32), pad_factor))
        pan = np.asarray(pan)[:h, :w]
        gt_pan = np.asarray(
            _gt_post(
                _jnp.asarray(item["sem"])[None],
                _jnp.asarray(item["ctr_hmp"])[None],
                _jnp.asarray(item["offsets"])[None],
            )[0]
        )
        metrics.evaluate({"pan_seg": pan}, {"pan_seg": gt_pan})
    metrics.display()
    return metrics


def _crop_size(train_cfg):
    for aug in train_cfg.get("augmentations", []):
        if aug.get("aug") == "RandomCrop":
            return int(aug["height"])
    return 256


def finetune_main(config: dict):
    """Finetune a registered model bundle and register the result
    (reference finetune.py:54 + _train.py:43-101).

    config keys: model_config (registry dict incl. FINETUNE section),
    TRAIN/DATASET/EVAL as in main(), model_name.
    """
    from empanada_tpu.api.utils import load_model_from_config

    model_config = config["model_config"]
    finetune_params = model_config.get("FINETUNE", {})

    # merge finetune defaults into the train config
    train_cfg = config.setdefault("TRAIN", {})
    train_cfg.setdefault("criterion", finetune_params.get("criterion", "PanopticLoss"))
    train_cfg.setdefault("criterion_params", finetune_params.get("criterion_params", {}))
    train_cfg.setdefault("dataset_class", finetune_params.get("dataset_class",
                                                              "SingleClassInstanceDataset"))
    train_cfg.setdefault("dataset_params", finetune_params.get("dataset_params", {}))
    config.setdefault("DATASET", {}).setdefault("norms", model_config["norms"])
    config["DATASET"].setdefault("labels", model_config["labels"])
    config["DATASET"].setdefault("thing_list", model_config["thing_list"])
    config["DATASET"].setdefault("class_names", model_config["class_names"])

    # load the registered bundle
    model, variables = load_model_from_config(model_config)

    # optimizer with optional encoder freezing
    batch_size = train_cfg.get("batch_size", 16)
    crop = _crop_size(train_cfg)
    sched_params = train_cfg.get("schedule_params", {})
    dataset = _build_dataset(config, model_config["norms"])
    loader = WeightedBatchLoader(dataset, batch_size, seed=config.get("seed", 0))
    total_steps = max(1, len(loader)) * train_cfg.get("epochs", 1)
    schedule = onecycle_schedule(sched_params.get("max_lr", 3e-3), total_steps,
                                 sched_params.get("pct_start", 0.3))
    tx = adamw_with_decay_mask(
        schedule, train_cfg.get("optimizer_params", {}).get("weight_decay", 0.1)
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None,
        tx=tx,
        apply_fn=model.apply,
    )
    finetune_layer = train_cfg.get("finetune_layer", "none") or "none"
    if finetune_layer != "none":
        trainable = freeze_encoder_mask(state.params, finetune_layer)
        state = state.replace(tx=_apply_freeze(tx, trainable))
    state = state.replace(opt_state=state.tx.init(state.params))

    model, state = main(config, model_and_state=(model, state))

    # deploy: save a bundle + registry yaml (replaces TorchScript export)
    model_dir = train_cfg.get("model_dir", ".")
    model_name = config.get("model_name", "finetuned")
    bundle_path = save_model_bundle(
        os.path.join(model_dir, model_name),
        model_config.get("arch", type(model).__name__),
        model_config.get("model_kwargs", {}),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    new_config = dict(model_config)
    new_config["model"] = bundle_path
    add_new_model(model_name, new_config, model_file=bundle_path)
    return model, state, bundle_path
