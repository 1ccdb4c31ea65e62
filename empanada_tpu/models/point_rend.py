"""PointRend semantic refinement (reference ``empanada/models/point_rend.py``,
itself derived from detectron2's PointRend project).

TPU-first formulation: every step has static shapes — the per-step number of
refined points is ``min(H*W, subdivision_num_points)`` which is static under
jit because H, W are trace-time constants; top-k + scatter replace
``torch.topk`` + ``scatter_``.  Eval-mode subdivision is an unrolled Python
loop over ``render_steps`` (a static argument), each step doubling resolution.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.ops.interpolate import (
    bilinear_resize,
    point_sample,
    point_sample_packed,
)

__all__ = [
    "calculate_uncertainty",
    "get_uncertain_point_coords_on_grid",
    "get_uncertain_point_coords_with_randomness",
    "StandardPointHead",
    "PointRendSemSegHead",
]


def calculate_uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """Uncertainty = -(top1 - top2) of logits along channels; for binary,
    -(|logit|).  NHWC or (N, P, C) layouts (channel-last)."""
    if logits.shape[-1] == 1:
        return -jnp.abs(logits)
    top2 = jax.lax.top_k(logits, 2)[0]
    return (top2[..., 1] - top2[..., 0])[..., None]


def get_uncertain_point_coords_on_grid(uncertainty_map: jnp.ndarray, num_points: int):
    """Top-``num_points`` most uncertain grid points.

    Args:
        uncertainty_map: (N, H, W, 1).
    Returns:
        point_indices: (N, P) flat indices into H*W.
        point_coords: (N, P, 2) normalized (x, y) in [0, 1] at pixel centers.
    """
    n, h, w, _ = uncertainty_map.shape
    num_points = min(h * w, num_points)
    flat = uncertainty_map.reshape(n, h * w)
    if (flat.dtype == jnp.bfloat16 and h * w % 65536 == 0
            and num_points <= 65536):
        # uncertainties are non-positive bf16 (-|logit| / top2 difference):
        # the segment-packed single-operand sort selects the same top-k set
        # (tie-subsets may differ — documented class) ~2x cheaper than
        # top_k's pair sort (ops/select.py)
        from empanada_tpu.ops.select import top_k_neg_bf16_indices

        point_indices = top_k_neg_bf16_indices(flat, num_points)
    else:
        point_indices = jax.lax.top_k(flat, num_points)[1]
    xs = (1.0 / w) * (0.5 + (point_indices % w).astype(jnp.float32))
    ys = (1.0 / h) * (0.5 + (point_indices // w).astype(jnp.float32))
    return point_indices, jnp.stack([xs, ys], axis=-1)


def get_uncertain_point_coords_with_randomness(
    rng: jax.Array,
    coarse_logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: int,
    importance_sample_ratio: float,
):
    """Training-time point sampling: oversample random points, keep the most
    uncertain fraction, pad with fresh random points (point_rend.py:62)."""
    assert oversample_ratio >= 1
    assert 0 <= importance_sample_ratio <= 1
    n = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    point_coords = jax.random.uniform(k1, (n, num_sampled, 2))
    point_logits = point_sample(coarse_logits, point_coords)
    point_uncertainties = calculate_uncertainty(point_logits)[..., 0]  # (N, S)

    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    idx = jax.lax.top_k(point_uncertainties, num_uncertain)[1]  # (N, U)
    picked = jnp.take_along_axis(point_coords, idx[..., None], axis=1)
    if num_random > 0:
        rand_coords = jax.random.uniform(k2, (n, num_random, 2))
        picked = jnp.concatenate([picked, rand_coords], axis=1)
    return picked


class StandardPointHead(nn.Module):
    """Per-point MLP over [fine features; coarse logits] with the coarse
    logits re-concatenated at every layer (point_rend.py:140)."""

    num_classes: int
    fc_dim: int
    num_fc: int = 3
    coarse_pred_each_layer: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fcs = [
            nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{k + 1}")
            for k in range(self.num_fc)
        ]
        self.predictor = nn.Dense(self.num_classes, dtype=self.dtype,
                                  name="predictor")

    def __call__(self, fine_grained_features, coarse_features):
        # inputs: (N, P, C) channel-last point features
        x = jnp.concatenate([fine_grained_features, coarse_features], axis=-1)
        for layer in self.fcs:
            x = nn.relu(layer(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse_features], axis=-1)
        return self.predictor(x)

    def dense_lowres(self, features_lo, coarse_hi, resize):
        """Dense evaluation on an upsampled grid with the first layer's
        feature matmul done at LOW resolution.

        ``relu(resize(f) @ W_f + coarse * w_c + b)`` equals
        ``relu(resize(f @ W_f) + coarse * w_c + b)`` exactly (bilinear
        resize and the matmul are both linear maps, and zero padding
        commutes with ``@ W_f``), but the latter never materializes the
        upsampled feature map in HBM — at 2x upsampling it does the widest
        matmul at 1/4 the positions and halves the layer-1 memory traffic.
        """
        if self.is_initializing():
            # materialize identical param shapes via the plain path
            return self(resize(features_lo), coarse_hi)
        fdim = features_lo.shape[-1]
        nc = coarse_hi.shape[-1]

        def split_dense(layer, x):
            # [x, coarse] @ W + b  ==  x @ W[:-nc] + coarse @ W[-nc:] + b,
            # skipping the 257-channel concat (and its lane padding) that
            # otherwise dominates the layer's HBM traffic
            p = layer.variables["params"]
            k = p["kernel"].astype(self.dtype)
            b = p["bias"].astype(self.dtype)
            if not self.coarse_pred_each_layer:
                return x @ k + b
            return x @ k[:-nc] + coarse_hi @ k[-nc:] + b

        p0 = self.fcs[0].variables["params"]
        kern = p0["kernel"].astype(self.dtype)       # (C+nc, D)
        bias = p0["bias"].astype(self.dtype)
        g = resize(features_lo @ kern[:fdim])
        x = nn.relu(g + coarse_hi @ kern[fdim:] + bias)
        for layer in self.fcs[1:]:
            x = nn.relu(split_dense(layer, x))
        return split_dense(self.predictor, x)

    def fused_weights(self, feature_dim: int):
        """Extract the layer weights in the split form the fused Pallas
        kernel consumes: per fc layer (W_fine (in, D) in compute dtype,
        W_coarse (1, D), bias (1, D)); predictor as ((1, D), wpc, bp).

        Requires num_classes == 1 and coarse_pred_each_layer.  During
        init each layer is materialized with a dummy call (param shapes
        depend only on input dims, so the tree matches the plain path).
        """
        assert self.num_classes == 1 and self.coarse_pred_each_layer
        dt = self.dtype
        layers = []
        in_dim = feature_dim + 1
        for layer in self.fcs:
            if self.is_initializing():
                layer(jnp.zeros((1, in_dim), dt))
            p = layer.variables["params"]
            kern = p["kernel"].astype(dt)
            layers.append((kern[:-1], kern[-1:], p["bias"].astype(dt)[None, :]))
            in_dim = self.fc_dim + 1
        if self.is_initializing():
            self.predictor(jnp.zeros((1, in_dim), dt))
        p = self.predictor.variables["params"]
        kern = p["kernel"].astype(dt)
        wp = kern[:-1, 0][None, :]          # (1, D)
        wpc = kern[-1, 0].astype(jnp.float32)
        bp = p["bias"][0].astype(jnp.float32)
        return layers, (wp, wpc, bp)


class PointRendSemSegHead(nn.Module):
    """Coarse semantic logits + iterative point refinement
    (point_rend.py:191)."""

    num_classes: int
    fc_dim: int
    num_fc: int = 3
    train_num_points: int = 1024
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_num_points: int = 8192
    dtype: jnp.dtype = jnp.float32
    # eval subdivision backend: "auto" = fused Pallas kernel on TPU when the
    # step geometry allows, XLA hybrid otherwise; "never" = always XLA;
    # "interpret" = fused kernel in interpreter mode (CPU tests)
    fused_render: str = "auto"

    def setup(self):
        # fail fast on misconfiguration: the eval-only check in
        # _fused_step_ok would otherwise accept a typo silently through
        # construction and training
        if self.fused_render not in ("never", "auto", "always", "interpret"):
            raise ValueError(
                f"fused_render={self.fused_render!r}: expected 'auto', "
                "'never', 'always', or 'interpret'"
            )
        self.point_head = StandardPointHead(
            self.num_classes, self.fc_dim, self.num_fc, dtype=self.dtype
        )

    def _fused_step_ok(self, h2: int, w2: int, hc: int, wc: int,
                       feature_dim: int) -> bool:
        """Which subdivision steps route through the fused Pallas kernel.

        Measured verdict (v5e, MitoNet_v1 arch, 512^2x8): in-context XLA
        fuses the dense-regime point head well enough that the kernel's
        tile-masked formulation only wins when uncertain points occupy a
        MINORITY of (16x128) tiles — and with K=8192 against <= 8K-point
        grids nearly every tile holds one by construction.  So "auto"
        keeps the XLA hybrid (with the radix-select K-th threshold), and
        "always" opts into the kernel for workloads whose uncertainty is
        genuinely concentrated (confident trained models, large grids with
        small K).  "interpret" runs the kernel in interpreter mode (CPU
        tests); "never" disables it.
        """
        from empanada_tpu.ops import pallas_pointrend as ppr

        # fused_render is validated once in setup()
        if self.fused_render in ("never", "auto"):
            return False
        if self.fused_render == "always" and jax.default_backend() != "tpu":
            return False
        return ppr.fused_step_supported(
            h2, w2, hc, wc, self.num_classes, feature_dim, self.dtype
        )

    def __call__(
        self,
        coarse_sem_seg_logits: jnp.ndarray,
        features: jnp.ndarray,
        train: bool = False,
        subdivision_steps: int = 2,
    ):
        pr_out = {}
        if train:
            rng = self.make_rng("points")
            point_coords = jax.lax.stop_gradient(
                get_uncertain_point_coords_with_randomness(
                    rng,
                    coarse_sem_seg_logits,
                    self.train_num_points,
                    self.oversample_ratio,
                    self.importance_sample_ratio,
                )
            )
            coarse_points = point_sample(coarse_sem_seg_logits, point_coords)
            fine_points = point_sample(features, point_coords)
            point_logits = self.point_head(fine_points, coarse_points)
            pr_out["sem_seg_logits"] = coarse_sem_seg_logits
            pr_out["point_logits"] = point_logits
            pr_out["point_coords"] = point_coords
        else:
            # TPU-first subdivision: arbitrary-index gathers/scatters are the
            # slowest ops on TPU, while dense MXU compute is nearly free.  So
            # instead of gathering the top-K uncertain points, the point head
            # runs DENSELY on the upsampled grid (its point_sample values at
            # pixel centers equal an align_corners=False bilinear resize) and
            # a top-K-threshold mask selects where refined logits replace the
            # upsampled ones.  Bit-identical to the reference's point loop
            # whenever the K-th uncertainty value is unique (ties select a
            # superset); ~2x faster than the gather/scatter formulation.
            from empanada_tpu.ops import pallas_pointrend as ppr

            hc, wc = features.shape[1], features.shape[2]
            feat_pad = None
            fused_wts = None
            sem_seg_logits = coarse_sem_seg_logits
            for _ in range(subdivision_steps):
                n, h, w, c = sem_seg_logits.shape
                h2, w2 = 2 * h, 2 * w
                num_points = min(h2 * w2, self.subdivision_num_points)

                if self._fused_step_ok(h2, w2, hc, wc, features.shape[-1]):
                    if feat_pad is None:
                        feat_pad = ppr.pack_features(
                            features, coarse_sem_seg_logits
                        )
                        fused_wts = self.point_head.fused_weights(
                            features.shape[-1]
                        )
                    sem_seg_logits = ppr.fused_refine_step(
                        sem_seg_logits,
                        feat_pad,
                        fused_wts,
                        self.subdivision_num_points,
                        interpret=self.fused_render == "interpret",
                    )
                    continue
                sem_seg_logits = bilinear_resize(
                    sem_seg_logits, (h2, w2), align_corners=False
                )
                uncertainty = calculate_uncertainty(sem_seg_logits)

                if h2 * w2 <= 8 * num_points:
                    # dense path: refine EVERY grid point with the MLP (pure
                    # MXU) and keep refined values where uncertainty reaches
                    # the K-th value — identical to top-K point refinement
                    # when the K-th value is unique (ties pick a superset).
                    # The K-th VALUE comes from a radix select (no sort,
                    # bit-identical to top_k[0][:, -1] — ops/select.py)
                    from empanada_tpu.ops.select import kth_largest

                    kth = kth_largest(
                        uncertainty.reshape(n, -1).astype(jnp.float32),
                        num_points,
                    ).astype(uncertainty.dtype)
                    refine_mask = uncertainty >= kth[:, None, None, None]
                    # zeros_padding: stands in for point_sample at pixel
                    # centers, which zero-pads outside the feature map
                    coarse_dense = bilinear_resize(
                        coarse_sem_seg_logits, (h2, w2), align_corners=False,
                        zeros_padding=True,
                    )
                    if self.dtype == jnp.bfloat16:
                        # bf16 production path: first-layer matmul at low
                        # res (exact by linearity; f32 keeps torch's op
                        # order for bit parity)
                        dense_logits = self.point_head.dense_lowres(
                            features,
                            coarse_dense,
                            lambda g: bilinear_resize(
                                g, (h2, w2), align_corners=False,
                                zeros_padding=True,
                            ),
                        )
                    else:
                        fine_dense = bilinear_resize(
                            features, (h2, w2), align_corners=False,
                            zeros_padding=True,
                        )
                        dense_logits = self.point_head(fine_dense, coarse_dense)
                    sem_seg_logits = jnp.where(refine_mask, dense_logits, sem_seg_logits)
                else:
                    # sparse path: for large grids the dense MLP's activation
                    # traffic exceeds the gather cost; select top-K points and
                    # gather/scatter like the reference
                    point_indices, point_coords = get_uncertain_point_coords_on_grid(
                        uncertainty, num_points
                    )
                    # ONE packed gather: TPU point gathers are latency-bound
                    # (a 1-channel point_sample costs the same ~2.6 ms as a
                    # 256-channel one at K=8192), and coarse logits share the
                    # feature map's resolution — so sample both in a single
                    # point_sample on a channel-concat instead of two.
                    fdim = features.shape[-1]
                    if coarse_sem_seg_logits.shape[1:3] == features.shape[1:3]:
                        pk_dt = jnp.promote_types(
                            features.dtype, coarse_sem_seg_logits.dtype
                        )
                        packed = jnp.concatenate(
                            [
                                features.astype(pk_dt),
                                coarse_sem_seg_logits.astype(pk_dt),
                            ],
                            axis=-1,
                        )
                        # grid coords are always in [0,1], so the
                        # corner-packed single-gather variant applies
                        # (same math as point_sample, ~1.8x faster; only
                        # fma-contraction-level fp difference under jit)
                        pts = point_sample_packed(packed, point_coords)
                        fine_points = pts[..., :fdim].astype(features.dtype)
                        coarse_points = pts[..., fdim:].astype(
                            coarse_sem_seg_logits.dtype
                        )
                    else:
                        coarse_points = point_sample(
                            coarse_sem_seg_logits, point_coords
                        )
                        fine_points = point_sample(features, point_coords)
                    point_logits = self.point_head(fine_points, coarse_points)

                    flat = sem_seg_logits.reshape(n, h2 * w2, c)
                    batch_idx = jnp.arange(n)[:, None]
                    # top-k indices are unique per row and in [0, h2*w2) by
                    # construction — let XLA skip scatter dedup/bounds checks
                    flat = flat.at[batch_idx, point_indices].set(
                        point_logits,
                        unique_indices=True,
                        mode="promise_in_bounds",
                    )
                    sem_seg_logits = flat.reshape(n, h2, w2, c)
            pr_out["sem_seg_logits"] = sem_seg_logits
        return pr_out
