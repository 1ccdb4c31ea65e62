"""Fused-Pallas-render vs XLA-hybrid per subdivision step (full-model
marginals at 512^2 x B8).  Round-5 verdict: the kernel loses BOTH steps on
the byte-reduced pipeline (step1 +4.4 ms, step2 8.4 vs 7.5 ms) — recorded
in bench.py's render_ab note; fused_render stays 'never' by default."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from empanada_tpu.models import create_model
from empanada_tpu.utils import device_time

H = W = 512; B = 8
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(0, 1, (B, H, W, 1)), jnp.float32)
def p_img(a, i): return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype))

for mode in ("never", "always"):
    model = create_model(
        "PanopticDeepLabPR", encoder="resnet50", num_classes=1, stage4_stride=16,
        decoder_channels=256, low_level_stages=(1,), low_level_channels_project=(32,),
        ins_decoder=True, subdivision_num_points=8192, dtype=jnp.bfloat16,
        fused_render=mode,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((1,H,W,1), jnp.float32), train=False)
    base = None
    for steps in (1, 2):
        fn = lambda v, x, s=steps: model.apply(v, x, train=False, render_steps=s,
                                               interpolate_ins=False)
        dt = device_time(jax.jit(fn), variables, images, iters=8, trials=3, perturb=p_img)
        marg = "" if base is None else f"  (step2 marginal {1e3*(dt-base):6.2f} ms)"
        print(f"mode={mode:7s} render_steps={steps}: {dt*1e3:7.2f} ms{marg}")
        base = dt
