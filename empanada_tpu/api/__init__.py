"""Orchestration/API layer (L4/L6): engines, registry, configs, bundles."""

from empanada_tpu.api.config import load_config, merge_dicts, read_yaml
from empanada_tpu.api.deploy import (
    ServingModel, export_serving_artifact, load_serving_artifact,
)
from empanada_tpu.api.export import archive_model, export_model, import_model
from empanada_tpu.api.inference import (
    Engine2d,
    Engine3d,
    combine_panoptic_maps,
    instance_relabel,
    stack_postprocessing,
    tracker_consensus,
)
from empanada_tpu.api.utils import (
    init_model_from_config,
    MODEL_DIR,
    Preprocessor,
    add_new_model,
    get_configs,
    load_model_bundle,
    cached_model_path,
    load_model_from_config,
    save_model_bundle,
)

__all__ = [
    "load_config", "merge_dicts", "read_yaml",
    "archive_model", "export_model", "import_model",
    "ServingModel", "export_serving_artifact", "load_serving_artifact",
    "Engine2d", "Engine3d", "combine_panoptic_maps", "instance_relabel",
    "stack_postprocessing", "tracker_consensus",
    "MODEL_DIR", "Preprocessor", "add_new_model", "get_configs",
    "load_model_bundle", "load_model_from_config", "save_model_bundle",
    "cached_model_path",
    "init_model_from_config",
]
