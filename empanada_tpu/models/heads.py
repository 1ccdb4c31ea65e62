"""Prediction heads (reference ``empanada/models/heads.py``): 5x5 separable
conv-bn-relu followed by a 1x1 projection."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import SeparableConvBnAct

__all__ = ["PanopticDeepLabHead"]


class PanopticDeepLabHead(nn.Module):
    n_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nin = x.shape[-1]
        x = SeparableConvBnAct(nin, 5, dtype=self.dtype, name="conv")(x, train)
        return nn.Conv(
            self.n_classes, (1, 1), use_bias=True, dtype=self.dtype, name="predict"
        )(x)
