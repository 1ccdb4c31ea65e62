"""Model registry, model bundles, and input preprocessing (reference
``empanada_napari/utils.py``).

The reference deploys TorchScript archives downloaded from Zenodo; this
framework deploys **model bundles**: a zip holding ``config.json`` (the
architecture name + constructor kwargs) and ``params.msgpack`` (flax
variables via ``flax.serialization``).  Registry configs are yaml files with
the reference's schema (class_names, labels, thing_list, model path, norms,
padding_factor, description, FINETUNE) discovered from the packaged
``configs/`` directory plus ``~/.empanada_tpu/configs``.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from flax import serialization

from empanada_tpu.api.config import read_yaml
from empanada_tpu.models import create_model

__all__ = [
    "MODEL_DIR",
    "get_configs",
    "add_new_model",
    "save_model_bundle",
    "load_model_bundle",
    "load_model_from_config",
    "cached_model_path",
    "model_info_text",
    "Preprocessor",
    "normalize",
]

MODEL_DIR = os.path.join(os.path.expanduser("~"), ".empanada_tpu")
BUNDLE_EXT = ".eptpu"
BUNDLE_FORMAT = 2  # bump on any incompatible param-tree rename


def get_configs():
    """Discover registered model configs: packaged + user-registered
    (reference utils.py:64)."""
    pkg_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
    user_dir = os.path.join(MODEL_DIR, "configs")

    model_configs = {}
    for d in (pkg_dir, user_dir):
        if not os.path.isdir(d):
            continue
        for fn in sorted(glob(os.path.join(d, "*.yaml"))):
            name = os.path.splitext(os.path.basename(fn))[0]
            model_configs[name] = fn
    return model_configs


def model_info_text(model_name: str) -> str:
    """Model description + finetuning annotation instructions as text.

    Headless equivalent of the reference "Get model info" widget
    (empanada_napari/_finetune.py:157-202): the patch-divisibility rule,
    the label divisor, and per-class starting labels annotators must use.
    """
    configs = get_configs()
    if model_name not in configs:
        raise KeyError(
            f"unknown model {model_name!r}; registered: {sorted(configs)}"
        )
    config = read_yaml(configs[model_name])

    thing_list = config.get("thing_list", [])
    class_names = config.get("class_names", {})
    pf = config.get("padding_factor", 128)
    finetune = config.get("FINETUNE", {})
    if finetune.get("dataset_class") == "PanopticDataset":
        label_divisor = finetune.get("dataset_params", {}).get("label_divisor")
    else:
        label_divisor = None

    lines = [
        "MODEL INFORMATION",
        "-----------------",
        f"Model name: {model_name}",
        f"Description:\n {str(config.get('description', '')).strip()}",
        "",
        "Finetuning instructions:",
        f"  The size of annotated patches should be divisible by {pf}",
        f"  Use a label divisor of {label_divisor}.",
        "  Classes to annotate:",
    ]
    for cl, cn in class_names.items():
        kind = "instance" if cl in thing_list else "semantic"
        start_label = (cl * label_divisor) + 1 if label_divisor is not None else 1
        lines.append(
            f"    Class {cl} ({cn}) requires {kind} segmentation, "
            f"start annotation at label {start_label}"
        )
    return "\n".join(lines)


def add_new_model(model_name: str, config: dict, model_file: str | None = None):
    """Register a model for the inference/finetune entry points
    (reference utils.py:120)."""
    config_dir = os.path.join(MODEL_DIR, "configs")
    os.makedirs(config_dir, exist_ok=True)
    if model_file is not None:
        assert os.path.isfile(model_file), f"{model_file} not a valid file!"
        config = dict(config)
        config["model"] = model_file
    with open(os.path.join(config_dir, f"{model_name}.yaml"), "w") as f:
        yaml.dump(config, f)


_QUANT_KEY = "__int8__"
_QUANT_MIN_SIZE = 4096


def _quantize_variables(variables):
    """Per-output-channel symmetric int8 quantization of large weight tensors.

    The TPU analog of the reference's exported int8 models
    (models/quantization/*, _export_import_models.py): weights ship as int8 +
    a float32 scale per last-axis channel (HWIO kernels -> per-output-channel)
    and dequantize to the compute dtype at load.  Small tensors (biases, BN
    scales/stats) stay full precision.
    """

    def q(leaf):
        a = np.asarray(leaf)
        if a.ndim >= 2 and a.size >= _QUANT_MIN_SIZE and np.issubdtype(
            a.dtype, np.floating
        ):
            a32 = np.asarray(a, dtype=np.float32)
            axes = tuple(range(a32.ndim - 1))
            scale = np.maximum(np.abs(a32).max(axis=axes), 1e-12) / 127.0
            qa = np.clip(np.rint(a32 / scale), -127, 127).astype(np.int8)
            return {_QUANT_KEY: qa, "scale": scale.astype(np.float32)}
        return a

    return jax.tree.map(q, serialization.to_state_dict(variables))


def _dequantize_tree(tree, dtype):
    if isinstance(tree, dict):
        if _QUANT_KEY in tree:
            w = np.asarray(tree[_QUANT_KEY], np.float32) * np.asarray(tree["scale"])
        else:
            return {k: _dequantize_tree(v, dtype) for k, v in tree.items()}
    else:
        w = np.asarray(tree)
    if np.issubdtype(w.dtype, np.floating):
        return jnp.asarray(w, dtype)
    return jnp.asarray(w)


def save_model_bundle(
    path: str, arch: str, model_kwargs: dict, variables, quantize: bool = False
) -> str:
    """Write a deployable model bundle (zip: config.json + params.msgpack).

    With ``quantize=True`` large weight tensors are stored int8 with
    per-channel scales (~4x smaller bundle); small tensors stay float.
    """
    if not path.endswith(BUNDLE_EXT):
        path = path + BUNDLE_EXT
    if quantize:
        payload = serialization.msgpack_serialize(_quantize_variables(variables))
    else:
        payload = serialization.to_bytes(variables)
    meta = {
        "arch": arch,
        "model_kwargs": model_kwargs,
        "format": BUNDLE_FORMAT,
        "quantized": bool(quantize),
    }
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("config.json", json.dumps(meta))
        zf.writestr("params.msgpack", payload)
    return path


def requantize_bundle(src_path: str, dst_path: str) -> str:
    """Re-save an existing bundle with int8 weight quantization."""
    with zipfile.ZipFile(src_path, "r") as zf:
        meta = json.loads(zf.read("config.json"))
        payload = zf.read("params.msgpack")
    if meta.get("quantized"):
        if src_path != dst_path:
            import shutil

            shutil.copyfile(src_path, dst_path)
        return dst_path
    state = serialization.msgpack_restore(payload)
    return save_model_bundle(
        dst_path, meta["arch"], meta["model_kwargs"], state, quantize=True
    )


def load_model_bundle(path: str, dtype=jnp.float32):
    """Load a model bundle -> (model module, variables)."""
    with zipfile.ZipFile(path, "r") as zf:
        meta = json.loads(zf.read("config.json"))
        payload = zf.read("params.msgpack")
    if meta.get("format", 1) != BUNDLE_FORMAT:
        raise ValueError(
            f"model bundle {path} has format {meta.get('format', 1)}, this "
            f"build expects {BUNDLE_FORMAT}; re-export the model from its "
            "training checkpoint"
        )

    model = create_model(meta["arch"], dtype=dtype, **meta["model_kwargs"])
    if meta.get("quantized"):
        state = serialization.msgpack_restore(payload)
        variables = _dequantize_tree(state, dtype)
        return model, variables
    # build a template pytree to restore into
    sample = jnp.zeros((1, 64, 64, 1), dtype)
    template = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, sample, train=False)
    )
    variables = serialization.from_bytes(template, payload)
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables


def cached_model_path(url: str, cache_dir: str | None = None,
                      sha256: str | None = None, progress: bool = False) -> str:
    """Resolve a model URL to a local file in the download cache.

    Mirrors the reference's Zenodo download-and-cache behavior
    (``empanada_napari/utils.py:80-106``, cache ``~/.empanada``):
    ``http(s)://`` and ``file://`` URLs are fetched once into
    ``~/.empanada_tpu/downloads`` (override with ``$EMPANADA_TPU_CACHE`` or
    ``cache_dir``) and later loads hit the cache with zero network traffic.

    Hardening beyond the reference: the download lands in a temp file and is
    atomically renamed, so an interrupted transfer can never poison the
    cache, and an optional ``sha256`` is verified before the rename and
    re-verified against the actual cached bytes on every hit (a corrupt
    cached copy is refetched, never served).
    """
    import hashlib
    import tempfile
    import urllib.parse
    import urllib.request

    cache_dir = cache_dir or os.environ.get(
        "EMPANADA_TPU_CACHE", os.path.join(MODEL_DIR, "downloads")
    )
    cache_dir = os.path.expanduser(cache_dir)
    base = os.path.basename(urllib.parse.urlparse(url).path) or "model.bin"
    key = hashlib.sha1(url.encode()).hexdigest()[:16]
    dest = os.path.join(cache_dir, f"{key}-{base}")
    if os.path.isfile(dest):
        if sha256 is None:
            return dest  # offline cache hit (trust-on-first-use, like the
            # reference's cache, empanada_napari/utils.py:96-100)
        digest = hashlib.sha256(open(dest, "rb").read()).hexdigest()
        if digest == sha256.lower():
            return dest  # verified offline cache hit
        os.remove(dest)  # stale/corrupt cached copy — refetch below

    os.makedirs(cache_dir, exist_ok=True)
    if progress:
        print(f"downloading {url} -> {dest}")
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".part")
    try:
        hasher = hashlib.sha256()
        with os.fdopen(fd, "wb") as out, urllib.request.urlopen(url) as resp:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                hasher.update(chunk)
                out.write(chunk)
        if sha256 is not None and hasher.hexdigest() != sha256.lower():
            raise RuntimeError(
                f"download {url}: sha256 mismatch "
                f"(got {hasher.hexdigest()}, expected {sha256})"
            )
        os.replace(tmp, dest)  # atomic: readers never see a partial file
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    return dest


def load_model_from_config(model_config: dict, dtype=jnp.float32):
    """Resolve the model field of a registry config to (model, variables).

    ``model:`` may be a local path or an ``http(s)://``/``file://`` URL;
    URLs resolve through :func:`cached_model_path` (download once into
    ``~/.empanada_tpu/downloads``, offline cache hits after), with an
    optional ``model_sha256:`` config key checked on first download."""
    model_path = model_config["model"]
    if isinstance(model_path, str) and model_path.startswith(
        ("http://", "https://", "file://")
    ):
        model_path = cached_model_path(
            model_path, sha256=model_config.get("model_sha256")
        )
    model_path = os.path.expanduser(model_path)
    if not os.path.isfile(model_path):
        raise FileNotFoundError(
            f"model bundle {model_path} not found; train/finetune one, import "
            "an archive, or build an untrained model with init_model_from_config()."
        )
    return load_model_bundle(model_path, dtype=dtype)


def init_model_from_config(model_config: dict, seed: int = 0, dtype=jnp.float32,
                           image_size: int = 128):
    """Instantiate the config's architecture with fresh random weights
    (development/benchmarks; registry configs carry arch + model_kwargs)."""
    model = create_model(model_config["arch"], dtype=dtype, **model_config["model_kwargs"])
    sample = jnp.zeros((1, image_size, image_size, 1), dtype)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(seed)}, sample, train=False
    )
    return model, variables


def normalize(img: np.ndarray, mean, std, max_pixel_value: float = 255.0) -> np.ndarray:
    """(img - mean*max) / (std*max), float32 (reference utils.py:170)."""
    mean = np.float32(mean) * np.float32(max_pixel_value)
    denom = np.reciprocal(np.float32(std) * np.float32(max_pixel_value), dtype=np.float32)
    img = img.astype(np.float32)
    img -= mean
    img *= denom
    return img


class Preprocessor:
    """Rejects float input and normalizes by mean/std scaled to the dtype max
    (reference utils.py:189)."""

    def __init__(self, mean=None, std=None):
        self.mean = mean
        self.std = std

    def __call__(self, image: np.ndarray = None) -> dict:
        assert image is not None
        if np.issubdtype(image.dtype, np.floating):
            raise Exception("Input image cannot be float type!")
        max_value = np.iinfo(image.dtype).max
        image = normalize(image, self.mean, self.std, max_pixel_value=max_value)
        return {"image": image[None]}  # (1, H, W)
