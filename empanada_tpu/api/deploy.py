"""Self-contained serving artifacts via jax.export (StableHLO).

The reference deploys TorchScript archives — weights + graph in one file
that runs without the model's Python code (empanada_napari exports via
``torch.jit.save``).  The TPU-native analog is a serialized
``jax.export`` artifact: the FULL device pipeline (on-device
normalization → model forward → PointRend render → center NMS → pixel
grouping → panoptic merge) lowered to StableHLO with the weights baked in
as constants.  Loading needs only jax — no empanada_tpu model code, no
config, no checkpoint.

Artifact layout (zip):
    meta.json   — format version, model name, input shape/dtype,
                  platforms, engine parameters baked into the graph
    fn.bin      — jax.export serialization

Shape-specialized like any XLA program: one artifact per (H, W).
"""

from __future__ import annotations

import json
import os
import zipfile

import numpy as np

__all__ = ["export_serving_artifact", "load_serving_artifact", "ServingModel"]

_FORMAT = "empanada_tpu-serving-v1"


def export_serving_artifact(
    model_config: dict,
    out_path: str,
    input_shape,
    platforms=("cpu", "tpu"),
    model_and_variables=None,
    label_divisor: int = 1000,
    nms_threshold: float = 0.1,
    nms_kernel: int = 3,
    confidence_thr: float = 0.3,
    stuff_area: int = 64,
    void_label: int = 0,
    max_centers: int = 256,
    fine_boundaries: bool = False,
    render_steps: int = 2,
    compute_dtype=None,
) -> str:
    """Bake config + weights + the whole panoptic pipeline into one file.

    Args:
        model_config: registry config (norms/labels/thing_list/model ...).
        input_shape: (H, W) of the uint8 grayscale input the artifact will
            accept (padded internally to the model's padding factor).
        platforms: jax.export lowering platforms; ("cpu", "tpu") makes one
            artifact that runs on either.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from empanada_tpu.api.utils import load_model_from_config
    from empanada_tpu.ops import postprocess as pp

    if model_and_variables is None:
        model, variables = load_model_from_config(model_config)
    else:
        model, variables = model_and_variables

    dtype = compute_dtype or jnp.float32
    h, w = int(input_shape[0]), int(input_shape[1])
    padding_factor = int(model_config.get("padding_factor", 128))
    mean = float(model_config["norms"]["mean"])
    std = float(model_config["norms"]["std"])
    thing_list = tuple(int(t) for t in model_config["thing_list"])
    num_classes = int(model.num_classes) + 1
    coarse = not fine_boundaries

    # replicate Preprocessor/normalize's EXACT float32 arithmetic
    # (api/utils.py:216-223): subtract mean*max, multiply by the
    # precomputed reciprocal — a different association differs by final
    # ulps and can flip harden_seg at the confidence threshold, breaking
    # the bit-identical engine-parity contract
    norm_sub = np.float32(mean) * np.float32(255.0)
    norm_mul = np.reciprocal(np.float32(std) * np.float32(255.0), dtype=np.float32)

    def pipeline(image_u8):
        x = (image_u8.astype(jnp.float32) - norm_sub) * norm_mul
        x = pp.factor_pad(x[None, :, :, None], padding_factor)
        out = model.apply(
            variables, x.astype(dtype), train=False,
            render_steps=render_steps, interpolate_ins=not coarse,
        )
        cells = pp.get_instance_cells(
            out["ctr_hmp"], out["offsets"], coarse, 1,
            nms_threshold, nms_kernel, max_centers, keep_coarse=True,
        )
        # logit-space hardening, matching the engine's jitted postprocess
        # exactly (pp.harden_logits == harden_seg(logits_to_prob(x)) in real
        # arithmetic; both sides of the parity contract use the same op)
        sem_h = pp.harden_logits(out["sem_logits"], confidence_thr)
        # coarse-grid merge: bit-exact vs the dense merge given the same
        # hardened sem and grouping ids (tests/test_postprocess.py::
        # TestMergeCoarse), so the engine-parity contract holds
        pan = pp.merge_semantic_and_instance_coarse(
            sem_h, cells, label_divisor, thing_list, stuff_area, void_label,
            num_classes, max_centers, step=4 if coarse else 1,
        )
        return pan[0, :h, :w]

    spec = jax.ShapeDtypeStruct((h, w), jnp.uint8)
    exported = jexport.export(
        jax.jit(pipeline), platforms=list(platforms)
    )(spec)
    blob = exported.serialize()

    meta = {
        "format": _FORMAT,
        "model_name": model_config.get("model_name", ""),
        "class_names": {
            str(k): v for k, v in model_config.get("class_names", {}).items()
        },
        "labels": [int(c) for c in model_config.get("labels", [])],
        "thing_list": list(thing_list),
        "input_shape": [h, w],
        "input_dtype": "uint8",
        "platforms": list(platforms),
        "label_divisor": label_divisor,
        "engine_params": {
            "nms_threshold": nms_threshold, "nms_kernel": nms_kernel,
            "confidence_thr": confidence_thr, "stuff_area": stuff_area,
            "void_label": void_label, "max_centers": max_centers,
            "fine_boundaries": fine_boundaries, "render_steps": render_steps,
        },
    }
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=2))
        z.writestr("fn.bin", blob)
    os.replace(tmp, out_path)
    return out_path


class ServingModel:
    """A loaded serving artifact: ``model(image_u8) -> panoptic map``."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self.input_shape = tuple(meta["input_shape"])

    def __call__(self, image: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        image = np.asarray(image)
        if image.shape != self.input_shape:
            raise ValueError(
                f"artifact is specialized for {self.input_shape}, "
                f"got {image.shape} — export one artifact per input shape"
            )
        if image.dtype != np.uint8:
            # silent coercion would wrap uint16 mod 256 / truncate floats;
            # the baked normalization is uint8-specific
            raise ValueError(
                f"artifact expects uint8 input (normalization baked for "
                f"the 0-255 range), got {image.dtype} — rescale to uint8 "
                "first"
            )
        return np.asarray(self._exported.call(jnp.asarray(image, jnp.uint8)))


def load_serving_artifact(path: str) -> ServingModel:
    """Load a serving artifact — requires only jax, no model code."""
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format") != _FORMAT:
            raise ValueError(f"{path}: not a {_FORMAT} artifact")
        exported = jexport.deserialize(z.read("fn.bin"))
    return ServingModel(exported, meta)
