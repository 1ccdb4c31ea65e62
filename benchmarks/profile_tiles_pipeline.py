"""create-tiles -> batched inference -> merge-tiles pipeline throughput.

BASELINE.md's last benchmark config: the offline big-image path (reference
_create_tiles.py + per-tile inference + merge).  Measures the full
disk-to-disk pipeline on a synthetic EM-like mosaic: chop to 1024^2 tiles,
run the flagship 2D engine over every tile (one jit shape), merge label
tiles back, reporting Mvox/s end-to-end and the per-stage split.

NB over the dev tunnel each engine.infer dispatch pays ~14 s of RPC tax for
the ~300 weight handles (see .claude/skills/verify: "TPU job
serialization"), which dominates and says nothing about the pipeline — the
honest per-tile device number is bench.py's 2D metric (~84 Mvox/s).  On a
co-located TPU host dispatch is ~100 us and this script's e2e number is
real.  Keep the mosaic small here so the tunnel run still terminates.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image
from scipy.ndimage import gaussian_filter

from empanada_tpu.api import Engine2d
from empanada_tpu.curation import chop_into_tiles, merge_tiles
from empanada_tpu.models import create_model

H, W = 2048, 3072
PATCH = 1024

KW = dict(
    encoder="resnet50", num_classes=1, stage4_stride=16, decoder_channels=256,
    low_level_stages=(1,), low_level_channels_project=(32,), ins_decoder=True,
    subdivision_num_points=8192,
)

rng = np.random.default_rng(0)
field = gaussian_filter(rng.normal(0, 1, (H, W)), (10, 10))
field /= field.std()
image = ((field > 0.6) * 110 + 90 + rng.normal(0, 6, (H, W))).clip(0, 255).astype(np.uint8)

model = create_model("PanopticDeepLabPR", dtype=jnp.bfloat16, **KW)
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0)}, jnp.zeros((1, PATCH, PATCH, 1), jnp.float32),
    train=False)
config = {
    "model_name": "bench", "class_names": {1: "mito"}, "labels": [1],
    "thing_list": [1], "norms": {"mean": 0.57, "std": 0.12},
    "padding_factor": 128, "description": "",
}
engine = Engine2d(config, model_and_variables=(model, variables))

with tempfile.TemporaryDirectory() as td:
    img_path = os.path.join(td, "mosaic.npy")
    np.save(img_path, image)

    t0 = time.perf_counter()
    meta = chop_into_tiles(img_path, td, patch_size=PATCH)
    t_chop = time.perf_counter() - t0
    tiles = sorted(os.listdir(os.path.join(td, "im")))
    print(f"chop: {len(tiles)} tiles in {t_chop:.2f}s")

    os.makedirs(os.path.join(td, "msk"), exist_ok=True)

    # warmup on one tile (jit compile at the PATCH shape)
    first = np.asarray(Image.open(os.path.join(td, "im", tiles[0])))
    engine.infer(first)

    t0 = time.perf_counter()
    total_inst = 0
    for name in tiles:
        tile = np.asarray(Image.open(os.path.join(td, "im", name)))
        pan = engine.infer(tile)
        total_inst += int((np.unique(pan) > 1000).sum())
        Image.fromarray(pan.astype(np.int32), mode="I").save(
            os.path.join(td, "msk", name))
    t_infer = time.perf_counter() - t0
    print(f"inference: {len(tiles)} tiles, {total_inst} instances, "
          f"{t_infer:.2f}s ({len(tiles)*PATCH*PATCH/t_infer/1e6:.1f} Mvox/s)")

    t0 = time.perf_counter()
    out = merge_tiles(td, td)
    t_merge = time.perf_counter() - t0
    merged = np.asarray(Image.open(out["msk"]))
    assert merged.shape == (H, W)
    print(f"merge: {t_merge:.2f}s, merged instances: "
          f"{int((np.unique(merged) > 1000).sum())}")

    e2e = H * W / (t_chop + t_infer + t_merge) / 1e6
    print(f"end-to-end: {t_chop + t_infer + t_merge:.2f}s = {e2e:.1f} Mvox/s "
          f"(chop {t_chop:.2f} / infer {t_infer:.2f} / merge {t_merge:.2f})")
