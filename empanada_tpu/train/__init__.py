"""Training layer: losses, train state/steps, metrics, loops."""

from empanada_tpu.train.losses import BCLoss, PanopticLoss, bootstrap_ce, heatmap_mse, offset_l1, point_rend_loss
from empanada_tpu.train.state import (
    TrainState,
    adamw_with_decay_mask,
    create_train_state,
    make_eval_step,
    make_train_step,
    onecycle_schedule,
)

__all__ = [
    "BCLoss", "PanopticLoss", "bootstrap_ce", "heatmap_mse", "offset_l1",
    "point_rend_loss", "TrainState", "adamw_with_decay_mask",
    "create_train_state", "make_eval_step", "make_train_step",
    "onecycle_schedule",
]
