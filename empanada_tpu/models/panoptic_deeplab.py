"""Panoptic-DeepLab model assemblies (reference
``empanada/models/panoptic_deeplab.py``).

Output contract (NHWC):
  - ``sem_logits``: (N, H, W, num_classes)
  - ``ctr_hmp``:    (N, H, W, 1) instance-center heatmap logits
  - ``offsets``:    (N, H, W, 2) (dy, dx) offsets to instance centers

In eval mode the PR variant refines ``sem_logits`` with PointRend subdivision
(``render_steps`` controls resolution: 1/4 * 2**render_steps) and, when
``interpolate_ins`` is False, keeps ctr_hmp/offsets at 1/4 resolution for the
coarse-boundaries pixel-grouping path (reference
``quantization/panoptic_deeplab.py:200-246`` — the deployed model contract).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.decoders import PanopticDeepLabDecoder
from empanada_tpu.models.heads import PanopticDeepLabHead
from empanada_tpu.models.point_rend import PointRendSemSegHead
from empanada_tpu.models.regnet import RegNet, RegNetParams, regnet_configs
from empanada_tpu.models.resnet import ResNet, resnet_configs
from empanada_tpu.ops.interpolate import bilinear_resize

__all__ = ["PanopticDeepLab", "PanopticDeepLabPR", "PanopticDeepLabBC", "create_encoder"]


def create_encoder(name: str, output_stride: int = 32, dtype=jnp.float32,
                   int8_execution: bool = False):
    """Returns (encoder_module, stage_widths).  ``int8_execution`` enables
    the selective s8xs8 MXU path for wide 3x3 encoder convs (ResNet family
    only — the RegNet encoders keep bf16)."""
    if name in resnet_configs:
        cfg = resnet_configs[name]
        enc = ResNet(output_stride=output_stride, dtype=dtype,
                     int8_execution=int8_execution, name="encoder", **cfg)
        return enc, enc.widths
    if name in regnet_configs:
        params = RegNetParams(**regnet_configs[name])
        enc = RegNet(
            widths=tuple(params.widths),
            depths=tuple(params.depths),
            groups=tuple(params.groups),
            use_se=params.use_se,
            output_stride=output_stride,
            dtype=dtype,
            name="encoder",
        )
        return enc, tuple(params.widths)
    raise ValueError(f"unknown encoder {name}")


class PanopticDeepLab(nn.Module):
    encoder: str = "resnet50"
    num_classes: int = 1
    stage4_stride: int = 16
    decoder_channels: int = 256
    low_level_stages: Sequence[int] = (3, 2, 1)
    low_level_channels_project: Sequence[int] = (128, 64, 32)
    atrous_rates: Sequence[int] = (2, 4, 6)
    aspp_channels: Optional[int] = None
    aspp_dropout: float = 0.1
    ins_decoder: bool = False
    ins_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32
    # selective int8 encoder execution (TPU analog of the reference's
    # fbgemm int8 deploy path); bf16/f32 stays the default
    int8_execution: bool = False

    def setup(self):
        assert self.stage4_stride in (16, 32)
        enc, widths = create_encoder(self.encoder, self.stage4_stride, self.dtype,
                                     self.int8_execution)
        self._encoder = enc
        if isinstance(self.aspp_dropout, (tuple, list)):
            sem_p, ins_p = self.aspp_dropout
        else:
            sem_p = ins_p = self.aspp_dropout

        self.semantic_decoder = PanopticDeepLabDecoder(
            self.decoder_channels,
            self.low_level_stages,
            self.low_level_channels_project,
            self.atrous_rates,
            self.aspp_channels,
            sem_p,
            dtype=self.dtype,
        )
        if self.ins_decoder:
            self.instance_decoder = PanopticDeepLabDecoder(
                self.decoder_channels,
                self.low_level_stages,
                [int(s * self.ins_ratio) for s in self.low_level_channels_project],
                self.atrous_rates,
                self.aspp_channels,
                ins_p,
                dtype=self.dtype,
            )
        else:
            self.instance_decoder = None

        self.semantic_head = PanopticDeepLabHead(self.num_classes, dtype=self.dtype)
        self.ins_center = PanopticDeepLabHead(1, dtype=self.dtype)
        self.ins_xy = PanopticDeepLabHead(2, dtype=self.dtype)
        self._setup_extra()

    def _setup_extra(self):
        pass

    def _encode_decode(self, x, train):
        pyramid = self._encoder(x, train)
        semantic_x = self.semantic_decoder(pyramid, train)
        if self.instance_decoder is not None:
            instance_x = self.instance_decoder(pyramid, train)
        else:
            instance_x = semantic_x
        return semantic_x, instance_x

    @staticmethod
    def _up4(t):
        return bilinear_resize(t, (t.shape[1] * 4, t.shape[2] * 4), align_corners=True)

    def _apply_heads(self, semantic_x, instance_x, train, render_steps, interpolate_ins):
        sem = self.semantic_head(semantic_x, train)
        ctr_hmp = self.ins_center(instance_x, train)
        offsets = self.ins_xy(instance_x, train)
        # honor the render contract in eval: when interpolate_ins is False the
        # instance maps stay at 1/4 res for coarse-boundaries pixel grouping
        up_ins = train or interpolate_ins
        return {
            "sem_logits": self._up4(sem),
            "ctr_hmp": self._up4(ctr_hmp) if up_ins else ctr_hmp,
            "offsets": self._up4(offsets) if up_ins else offsets,
        }

    def __call__(self, x, train: bool = False, render_steps: int = 2, interpolate_ins: bool = True):
        semantic_x, instance_x = self._encode_decode(x, train)
        return self._apply_heads(semantic_x, instance_x, train, render_steps, interpolate_ins)


class PanopticDeepLabPR(PanopticDeepLab):
    """PointRend semantic head variant — this is MitoNet_v1's architecture."""

    num_fc: int = 3
    train_num_points: int = 1024
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_num_points: int = 8192
    fused_render: str = "auto"

    def _setup_extra(self):
        self.semantic_pr = PointRendSemSegHead(
            self.num_classes,
            self.decoder_channels,
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


class PanopticDeepLabBC(PanopticDeepLab):
    """Boundary-contour variant: sem + cnt heads, both PointRend-refined;
    no center/offset heads (reference panoptic_deeplab.py:162)."""

    num_fc: int = 3
    train_num_points: int = 1024
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_num_points: int = 8192
    fused_render: str = "auto"

    def _setup_extra(self):
        self.boundary_head = PanopticDeepLabHead(1, dtype=self.dtype)
        pr_kwargs = dict(
            num_classes=self.num_classes,
            fc_dim=self.decoder_channels,
            num_fc=self.num_fc,
            train_num_points=self.train_num_points,
            oversample_ratio=self.oversample_ratio,
            importance_sample_ratio=self.importance_sample_ratio,
            subdivision_num_points=self.subdivision_num_points,
            dtype=self.dtype,
            fused_render=self.fused_render,
        )
        self.semantic_pr = PointRendSemSegHead(**pr_kwargs)
        self.boundary_pr = PointRendSemSegHead(**pr_kwargs)

    def _apply_heads(self, semantic_x, instance_x, train, render_steps, interpolate_ins):
        heads_out = {}
        sem = self.semantic_head(semantic_x, train)
        cnt = self.boundary_head(instance_x, train)
        sem_pr = self.semantic_pr(sem, semantic_x, train, subdivision_steps=render_steps)
        cnt_pr = self.boundary_pr(cnt, instance_x, train, subdivision_steps=render_steps)

        if train:
            heads_out["sem_logits"] = self._up4(sem_pr["sem_seg_logits"])
            heads_out["sem_points"] = sem_pr["point_logits"]
            heads_out["sem_point_coords"] = sem_pr["point_coords"]
            heads_out["cnt_logits"] = self._up4(cnt_pr["sem_seg_logits"])
            heads_out["cnt_points"] = cnt_pr["point_logits"]
            heads_out["cnt_point_coords"] = cnt_pr["point_coords"]
        else:
            heads_out["sem_logits"] = sem_pr["sem_seg_logits"]
            heads_out["cnt_logits"] = cnt_pr["sem_seg_logits"]
        return heads_out
