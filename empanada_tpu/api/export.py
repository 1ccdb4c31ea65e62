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
    """Import a model archive into the local registry.

    Accepts both this framework's ``.empanada_tpu`` archives (yaml + flax
    bundle) and the reference's ``.empanada`` zips (yaml + torch ``.pth``,
    ``_export_import_models.py:66-88``).  Torch weights — TorchScript
    archives or state dicts — are ported to a flax bundle on import, with
    the architecture recovered from the weights themselves when the yaml
    (like every reference yaml) carries no ``arch`` field.
    """
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
        torch_weights = []
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
            if flat.endswith((".pth", ".pt")):
                torch_weights.append(target)
            if flat == os.path.basename(str(config.get("model", ""))) or model_out is None:
                model_out = target

    if torch_weights:
        model_out = _port_torch_import(config, torch_weights, store_dir, name)

    add_new_model(name, config, model_file=model_out)
    return name


def _port_torch_import(config: dict, torch_weights: list, store_dir: str,
                       name: str) -> str:
    """Port a reference ``.empanada`` archive's torch weights to a flax
    bundle and record the recovered arch/kwargs in the registry config."""
    from empanada_tpu.api.utils import save_model_bundle
    from empanada_tpu.port import (
        infer_arch_and_kwargs,
        load_torch_checkpoint,
        port_state_dict,
    )

    # prefer the yaml's `model` entry over a `model_quantized` sibling —
    # torch-int8 archives hold packed fbgemm tensors a shape-port can't read
    preferred = os.path.basename(str(config.get("model", "")))
    torch_weights = sorted(
        torch_weights, key=lambda p: os.path.basename(p) != preferred)
    ckpt = torch_weights[0]
    state_dict, ckpt_arch = load_torch_checkpoint(ckpt)
    arch = config.get("arch") or ckpt_arch
    kwargs = config.get("model_kwargs")
    if arch is None or kwargs is None:
        inf_arch, inf_kwargs = infer_arch_and_kwargs(state_dict)
        arch = arch or inf_arch
        kwargs = kwargs if kwargs is not None else inf_kwargs
    variables = port_state_dict(state_dict, arch, kwargs)
    bundle = save_model_bundle(
        os.path.join(store_dir, name), arch, kwargs, variables)
    config["arch"] = arch
    config["model_kwargs"] = kwargs
    config.pop("model_quantized", None)
    for p in torch_weights:
        os.remove(p)
    return bundle


def archive_model(model_name: str, archive_dir: str) -> str:
    """Export into a directory using the model's own name."""
    os.makedirs(archive_dir, exist_ok=True)
    return export_model(model_name, os.path.join(archive_dir, model_name))
