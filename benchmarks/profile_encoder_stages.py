"""Per-stage resnet50-os16 encoder timing at 512^2 x8 bf16."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.resnet import ResNet, resnet_configs
from empanada_tpu.models.blocks import max_pool_2d
from empanada_tpu.utils import device_time

B = 8
rng = np.random.default_rng(0)


class Stem(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        from empanada_tpu.models.blocks import batch_norm
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = batch_norm(x, train, self.dtype, name="stem_bn")
        x = nn.relu(x)
        return max_pool_2d(x, 3, 2, 1)


class Stage(nn.Module):
    planes: int
    blocks: int
    stride: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        from empanada_tpu.models.resnet import Bottleneck
        kw = dict(dtype=self.dtype, dilation=self.dilation)
        need_ds = self.stride != 1 or x.shape[-1] != self.planes * 4
        x = Bottleneck(self.planes, stride=self.stride, downsample=need_ds,
                       name="s_block1", **kw)(x, train)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, name=f"s_block{i+1}", **kw)(x, train)
        return x


def time_mod(name, mod, shape, flops_g=None):
    x = jnp.asarray(rng.normal(0, 1, (B,) + shape), jnp.float32)
    v = jax.jit(mod.init, static_argnames=("train",))(jax.random.key(0), x[:1], train=False)
    f = jax.jit(lambda v, x: mod.apply(v, x, train=False))
    def pert(a, i):
        return (a[0], a[1] + (1e-4 * i).astype(a[1].dtype))
    dt = device_time(f, v, x, iters=10, trials=3, perturb=pert)
    eff = f"  {flops_g/dt/1e3:6.1f} TF/s" if flops_g else ""
    print(f"{name:24s} {dt*1e3:7.2f} ms{eff}")
    return dt


# flops per batch in GFLOP (2*K*H*W*Cin*Cout*k^2 summed, rough)
def conv_g(h, w, cin, cout, k=1, n=B):
    return 2 * h * w * cin * cout * k * k * n / 1e9

g_stem = conv_g(256, 256, 1, 64, 7)
g_l1 = (conv_g(128,128,64,64)+conv_g(128,128,64,64,3)+conv_g(128,128,64,256)+conv_g(128,128,64,256)) \
     + 2*(conv_g(128,128,256,64)+conv_g(128,128,64,64,3)+conv_g(128,128,64,256))
g_l2 = (conv_g(128,128,256,128)+conv_g(64,64,128,128,3)+conv_g(64,64,128,512)+conv_g(64,64,256,512)) \
     + 3*(conv_g(64,64,512,128)+conv_g(64,64,128,128,3)+conv_g(64,64,128,512))
g_l3 = (conv_g(64,64,512,256)+conv_g(32,32,256,256,3)+conv_g(32,32,256,1024)+conv_g(32,32,512,1024)) \
     + 5*(conv_g(32,32,1024,256)+conv_g(32,32,256,256,3)+conv_g(32,32,256,1024))
g_l4 = (conv_g(32,32,1024,512)+conv_g(32,32,512,512,3)+conv_g(32,32,512,2048)+conv_g(32,32,1024,2048)) \
     + 2*(conv_g(32,32,2048,512)+conv_g(32,32,512,512,3)+conv_g(32,32,512,2048))

time_mod("stem 7x7/2 + pool", Stem(), (512, 512, 1), g_stem)
time_mod("layer1 (3 blk @128^2)", Stage(64, 3, 1), (128, 128, 64), g_l1)
time_mod("layer2 (4 blk @64^2)", Stage(128, 4, 2), (128, 128, 256), g_l2)
time_mod("layer3 (6 blk @32^2)", Stage(256, 6, 2), (64, 64, 512), g_l3)
time_mod("layer4 (3 blk dil2 @32^2)", Stage(512, 3, 1, dilation=2), (32, 32, 1024), g_l4)
print(f"flops: stem {g_stem:.0f} l1 {g_l1:.0f} l2 {g_l2:.0f} l3 {g_l3:.0f} l4 {g_l4:.0f} GFLOP/batch")
