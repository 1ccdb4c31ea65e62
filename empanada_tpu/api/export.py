"""Model bundle export/import/archive (reference
``empanada_napari/_export_import_models.py``): a portable ``.empanada_tpu``
zip = registry yaml + model bundle, for moving registered models between
machines."""

from __future__ import annotations

import os
import shutil
import zipfile

import yaml

from empanada_tpu.api.config import read_yaml
from empanada_tpu.api.utils import MODEL_DIR, add_new_model, get_configs

__all__ = ["export_model", "import_model", "archive_model"]

ARCHIVE_EXT = ".empanada_tpu"


def export_model(model_name: str, export_path: str, quantize: bool = False) -> str:
    """Bundle a registered model's yaml + weights into one archive.

    ``quantize=True`` re-saves the weights int8 (api/utils.py:
    requantize_bundle) before archiving — the analog of the reference's
    quantized-model export (_export_import_models.py).
    """
    configs = get_configs()
    if model_name not in configs:
        raise KeyError(f"{model_name} is not a registered model")
    config_path = configs[model_name]
    config = read_yaml(config_path)

    model_file = config["model"]
    if not os.path.isfile(model_file):
        raise FileNotFoundError(f"model file {model_file} not found")

    out = export_path
    if not out.endswith(ARCHIVE_EXT):
        out = out + ARCHIVE_EXT
    if quantize:
        import tempfile

        from empanada_tpu.api.utils import requantize_bundle

        with tempfile.TemporaryDirectory() as td:
            qfile = requantize_bundle(
                model_file, os.path.join(td, os.path.basename(model_file))
            )
            with zipfile.ZipFile(out, "w", compression=zipfile.ZIP_DEFLATED) as zf:
                zf.write(config_path, arcname=f"{model_name}.yaml")
                zf.write(qfile, arcname=os.path.basename(model_file))
        return out
    with zipfile.ZipFile(out, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.write(config_path, arcname=f"{model_name}.yaml")
        zf.write(model_file, arcname=os.path.basename(model_file))
    return out


def import_model(archive_path: str, model_name: str | None = None) -> str:
    """Import an exported archive into the local registry."""
    store_dir = os.path.join(MODEL_DIR, "models")
    os.makedirs(store_dir, exist_ok=True)

    with zipfile.ZipFile(archive_path, "r") as zf:
        yaml_names = [n for n in zf.namelist() if n.endswith(".yaml")]
        assert len(yaml_names) == 1, "archive must contain exactly one yaml"
        name = model_name or os.path.splitext(yaml_names[0])[0]
        config = yaml.safe_load(zf.read(yaml_names[0]))

        weight_names = [n for n in zf.namelist() if not n.endswith(".yaml")]
        assert len(weight_names) >= 1, "archive contains no model weights"
        model_out = None
        for wn in weight_names:
            # flatten to the basename: archives are untrusted cross-machine
            # artifacts, so member paths must never escape the store dir
            # (zip-slip) and subdirectory layouts are normalized away
            flat = os.path.basename(wn.replace("\\", "/"))
            if not flat:
                continue
            target = os.path.join(store_dir, flat)
            with zf.open(wn) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst)
            if flat == os.path.basename(str(config.get("model", ""))) or model_out is None:
                model_out = target

    add_new_model(name, config, model_file=model_out)
    return name


def archive_model(model_name: str, archive_dir: str) -> str:
    """Export into a directory using the model's own name."""
    os.makedirs(archive_dir, exist_ok=True)
    return export_model(model_name, os.path.join(archive_dir, model_name))
