"""Panoptic-BiFPN model assemblies (reference
``empanada/models/panoptic_bifpn.py``) — MitoNet_v1_mini's architecture
(regnety_6p4gf encoder, fpn_dim 160, 3 BiFPN layers).

Same output contract as PanopticDeepLab (see panoptic_deeplab.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import Resample2d
from empanada_tpu.models.decoders import BiFPN, BiFPNDecoder
from empanada_tpu.models.heads import PanopticDeepLabHead
from empanada_tpu.models.panoptic_deeplab import create_encoder
from empanada_tpu.models.point_rend import PointRendSemSegHead
from empanada_tpu.ops.interpolate import bilinear_resize

__all__ = ["PanopticBiFPN", "PanopticBiFPNPR"]


class PanopticBiFPN(nn.Module):
    encoder: str = "regnety_6p4gf"
    num_classes: int = 1
    fpn_dim: int = 160
    fpn_layers: int = 3
    ins_decoder: bool = False
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc, widths = create_encoder(self.encoder, 32, self.dtype)
        self._encoder = enc
        self.p2_resample = Resample2d(self.fpn_dim, dtype=self.dtype)
        self.semantic_fpn = BiFPN(
            self.fpn_dim, self.fpn_layers, self.depthwise, dtype=self.dtype
        )
        self.semantic_decoder = BiFPNDecoder(self.fpn_dim, dtype=self.dtype)
        if self.ins_decoder:
            self.instance_fpn = BiFPN(
                self.fpn_dim, self.fpn_layers, self.depthwise, dtype=self.dtype
            )
            self.instance_decoder = BiFPNDecoder(self.fpn_dim, dtype=self.dtype)
        else:
            self.instance_fpn = None

        self.semantic_head = PanopticDeepLabHead(self.num_classes, dtype=self.dtype)
        self.ins_center = PanopticDeepLabHead(1, dtype=self.dtype)
        self.ins_xy = PanopticDeepLabHead(2, dtype=self.dtype)
        self._setup_extra()

    def _setup_extra(self):
        pass

    @staticmethod
    def _up4(t):
        return bilinear_resize(t, (t.shape[1] * 4, t.shape[2] * 4), align_corners=True)

    def _forward_decoders(self, pyramid, p2_features, train):
        # BiFPN consumes strides 8-32 (P3-P5); the decoder prepends P2 (1/4)
        semantic_pyr = [p2_features] + self.semantic_fpn(pyramid, train)
        semantic_x = self.semantic_decoder(semantic_pyr[::-1], train)
        if self.instance_fpn is not None:
            instance_pyr = [p2_features] + self.instance_fpn(pyramid, train)
            instance_x = self.instance_decoder(instance_pyr[::-1], train)
        else:
            instance_x = semantic_x
        return semantic_x, instance_x

    def _apply_heads(self, semantic_x, instance_x, train, render_steps, interpolate_ins):
        sem = self.semantic_head(semantic_x, train)
        ctr_hmp = self.ins_center(instance_x, train)
        offsets = self.ins_xy(instance_x, train)
        up_ins = train or interpolate_ins
        return {
            "sem_logits": self._up4(sem),
            "ctr_hmp": self._up4(ctr_hmp) if up_ins else ctr_hmp,
            "offsets": self._up4(offsets) if up_ins else offsets,
        }

    def __call__(self, x, train: bool = False, render_steps: int = 2, interpolate_ins: bool = True):
        pyramid = self._encoder(x, train)
        p2_features = self.p2_resample(pyramid[1], train)
        semantic_x, instance_x = self._forward_decoders(pyramid[2:], p2_features, train)
        return self._apply_heads(semantic_x, instance_x, train, render_steps, interpolate_ins)


class PanopticBiFPNPR(PanopticBiFPN):
    num_fc: int = 3
    train_num_points: int = 1024
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_num_points: int = 8192
    fused_render: str = "auto"

    def _setup_extra(self):
        self.semantic_pr = PointRendSemSegHead(
            self.num_classes,
            self.fpn_dim,
            self.num_fc,
            self.train_num_points,
            self.oversample_ratio,
            self.importance_sample_ratio,
            self.subdivision_num_points,
            dtype=self.dtype,
            fused_render=self.fused_render,
        )

    def _apply_heads(self, semantic_x, instance_x, train, render_steps, interpolate_ins):
        heads_out = {}
        sem = self.semantic_head(semantic_x, train)
        ctr_hmp = self.ins_center(instance_x, train)
        offsets = self.ins_xy(instance_x, train)
        pr_out = self.semantic_pr(sem, semantic_x, train, subdivision_steps=render_steps)

        if train:
            heads_out["sem_logits"] = self._up4(pr_out["sem_seg_logits"])
            heads_out["sem_points"] = pr_out["point_logits"]
            heads_out["point_coords"] = pr_out["point_coords"]
            heads_out["ctr_hmp"] = self._up4(ctr_hmp)
            heads_out["offsets"] = self._up4(offsets)
        else:
            heads_out["sem_logits"] = pr_out["sem_seg_logits"]
            heads_out["ctr_hmp"] = self._up4(ctr_hmp) if interpolate_ins else ctr_hmp
            heads_out["offsets"] = self._up4(offsets) if interpolate_ins else offsets
        return heads_out
