"""End-to-end 3D pipeline: MultiChipEngine3d on 64x512x512 uint8 (1 chip).

Device fwd+postprocess + host RLE/matching/tracking/fill.  Over the dev
tunnel the host<->device transfer tax dominates (~1 s per batched
dispatch, and the large-program compile can take 15+ min in degraded
periods), so numbers from this script only lower-bound co-located
hardware; there, device compute (~0.3 s) and host stitching (~0.3-0.8 s,
see profile_host_stitch.py) are the real budget.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter

from empanada_tpu.models import create_model
from empanada_tpu.parallel import MultiChipEngine3d

D, H, W = 64, 512, 512
rng = np.random.default_rng(0)
field = gaussian_filter(rng.normal(0, 1, (D, H, W)), (2, 8, 8))
field /= field.std()
volume = ((field > 0.6) * 110 + 90 + rng.normal(0, 6, (D, H, W))).clip(0, 255).astype(np.uint8)

model = create_model(
    "PanopticDeepLabPR", encoder="resnet50", num_classes=1, stage4_stride=16,
    decoder_channels=256, low_level_stages=(1,), low_level_channels_project=(32,),
    ins_decoder=True, subdivision_num_points=8192, dtype=jnp.bfloat16,
)
variables = jax.jit(model.init, static_argnames=("train",))(
    {"params": jax.random.key(0)}, jnp.zeros((1, H, W, 1), jnp.float32), train=False)

config = {
    "model_name": "bench", "class_names": {1: "mito"}, "labels": [1],
    "thing_list": [1], "norms": {"mean": 0.57, "std": 0.12},
    "padding_factor": 128, "description": "",
}
engine = MultiChipEngine3d(
    config, label_divisor=1000, median_kernel_size=3, batch_size=8,
    compute_dtype=jnp.bfloat16, model_and_variables=(model, variables),
)

# warm up compile on one batch shape
t0 = time.perf_counter()
_, trackers = engine.infer_on_axis(volume[:8], "xy")
t1 = time.perf_counter()
print(f"warmup (8 slices incl compile): {t1-t0:.1f}s")

t2 = time.perf_counter()
_, trackers = engine.infer_on_axis(volume, "xy")
t3 = time.perf_counter()
n_inst = sum(len(t.instances) for t in trackers)
mvox = D * H * W / (t3 - t2) / 1e6
print(f"e2e 3D xy-stack: {t3-t2:.2f}s -> {mvox:.1f} Mvox/s ({n_inst} instances)")
