"""Training losses (reference ``empanada/losses.py``), functional JAX.

Targets are channel-last: ``sem`` (N, H, W) int or float, ``ctr_hmp``
(N, H, W, 1), ``offsets`` (N, H, W, 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from empanada_tpu.ops.interpolate import point_sample

__all__ = [
    "bootstrap_ce",
    "heatmap_mse",
    "offset_l1",
    "point_rend_loss",
    "PanopticLoss",
    "BCLoss",
]


def bootstrap_ce(logits, labels, top_k_percent: float = 0.2):
    """(B)CE averaged over the top-k% hardest pixels (losses.py:14).

    Cross-entropy and the top-k reduction run in f32 even under bf16
    compute — torch autocast does the same (BCE/CE are fp32-listed ops),
    and reducing ~1M pixel losses in 8 mantissa bits costs percent-level
    error in the dominant loss term."""
    logits = logits.astype(jnp.float32)
    if logits.shape[-1] == 1:
        pixel = optax.sigmoid_binary_cross_entropy(
            logits[..., 0], labels.astype(jnp.float32)
        )
    else:
        pixel = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels.astype(jnp.int32)
        )
    pixel = pixel.reshape(-1)
    if top_k_percent == 1.0:
        return pixel.mean()
    k = int(top_k_percent * pixel.size)
    top = jax.lax.top_k(pixel, k)[0]
    return top.mean()


def heatmap_mse(output, target):
    return jnp.mean((output - target) ** 2)


def offset_l1(output, target, offset_weights):
    """Masked L1: only inside the GT segmentation (losses.py:59)."""
    l1 = jnp.abs(output - target) * offset_weights
    wsum = offset_weights.sum()
    return jnp.where(wsum == 0, 0.0, l1.sum() / jnp.maximum(wsum, 1e-8))


def point_rend_loss(point_logits, point_coords, labels):
    """(B)CE between point logits and nearest-sampled labels (losses.py:77).

    point_logits: (N, P, C); point_coords: (N, P, 2); labels: (N, H, W).
    """
    point_labels = point_sample(
        labels[..., None].astype(jnp.float32), point_coords, mode="nearest"
    )  # (N, P, 1)
    if point_logits.shape[-1] == 1:
        return optax.sigmoid_binary_cross_entropy(
            point_logits[..., 0], point_labels[..., 0]
        ).mean()
    return optax.softmax_cross_entropy_with_integer_labels(
        point_logits, point_labels[..., 0].astype(jnp.int32)
    ).mean()


class PanopticLoss:
    """Weighted sum of semantic CE, heatmap MSE, masked offset L1 and the
    PointRend point CE (losses.py:101)."""

    def __init__(
        self,
        ce_weight: float = 1,
        mse_weight: float = 200,
        l1_weight: float = 0.01,
        pr_weight: float = 1,
        top_k_percent: float = 0.2,
    ):
        self.ce_weight = ce_weight
        self.mse_weight = mse_weight
        self.l1_weight = l1_weight
        self.pr_weight = pr_weight
        self.top_k_percent = top_k_percent

    def __call__(self, output: dict, target: dict):
        mse = heatmap_mse(output["ctr_hmp"], target["ctr_hmp"])
        ce = bootstrap_ce(output["sem_logits"], target["sem"], self.top_k_percent)
        offset_weights = (target["sem"] > 0)[..., None].astype(output["offsets"].dtype)
        l1 = offset_l1(output["offsets"], target["offsets"], offset_weights)

        aux = {"ce": ce, "l1": l1, "mse": mse}
        total = self.ce_weight * ce + self.mse_weight * mse + self.l1_weight * l1
        if "sem_points" in output:
            pr_ce = point_rend_loss(
                output["sem_points"], output["point_coords"], target["sem"]
            )
            aux["pointrend_ce"] = pr_ce
            total = total + self.pr_weight * pr_ce
        aux["total_loss"] = total
        return total, aux


class BCLoss:
    """Semantic + contour bootstrapped CE with optional PointRend terms
    (losses.py:157)."""

    def __init__(self, pr_weight: float = 1, top_k_percent: float = 0.15):
        self.pr_weight = pr_weight
        self.top_k_percent = top_k_percent

    def __call__(self, output: dict, target: dict):
        sem_ce = bootstrap_ce(output["sem_logits"], target["sem"], self.top_k_percent)
        cnt_ce = bootstrap_ce(output["cnt_logits"], target["cnt"], self.top_k_percent)
        aux = {"sem_ce": sem_ce, "cnt_ce": cnt_ce}
        total = sem_ce + cnt_ce
        if "sem_points" in output:
            sem_pr = point_rend_loss(
                output["sem_points"], output["sem_point_coords"], target["sem"]
            )
            cnt_pr = point_rend_loss(
                output["cnt_points"], output["cnt_point_coords"], target["cnt"]
            )
            aux["sem_pr_ce"] = sem_pr
            aux["cnt_pr_ce"] = cnt_pr
            total = total + self.pr_weight * (sem_pr + cnt_pr)
        aux["total_loss"] = total
        return total, aux
