"""Offline evaluation metric functions (reference
``empanada/evaluation/{instance_metrics,panoptic_metrics,semantic_metrics}.py``).

All instance metrics take the matched/unmatched label arrays + matched IoUs
produced by Hungarian matching (see Evaluator) and treat matches below the
IoU threshold as simultaneous FP+FN.  Empty masks score 1 by convention.
"""

from __future__ import annotations

import numpy as np

from empanada_tpu.core import rle_iou

__all__ = [
    "f1", "ap", "precision", "recall", "panoptic_quality", "semantic_iou",
    "f1_50", "f1_75", "precision_50", "precision_75", "recall_50", "recall_75",
]


def _counts(gt_unmatched, pred_unmatched, matched_ious, iou_thr):
    fn = len(gt_unmatched)
    fp = len(pred_unmatched)
    tp = int(np.count_nonzero(matched_ious >= iou_thr))
    failed = int(np.count_nonzero(matched_ious < iou_thr))
    return tp, fp + failed, fn + failed


def f1(gt_matched, gt_unmatched, pred_matched, pred_unmatched, matched_ious, iou_thr=0.5):
    tp, fp, fn = _counts(gt_unmatched, pred_unmatched, matched_ious, iou_thr)
    if tp + fp + fn == 0:
        return 1
    return tp / (tp + 0.5 * fp + 0.5 * fn)


def ap(gt_matched, gt_unmatched, pred_matched, pred_unmatched, matched_ious, iou_thr=0.5):
    tp, fp, fn = _counts(gt_unmatched, pred_unmatched, matched_ious, iou_thr)
    if tp + fp + fn == 0:
        return 1
    return tp / (tp + fp + fn)


def precision(gt_matched, gt_unmatched, pred_matched, pred_unmatched, matched_ious, iou_thr=0.5):
    tp, fp, _ = _counts(gt_unmatched, pred_unmatched, matched_ious, iou_thr)
    if tp + fp == 0:
        return 1
    return tp / (tp + fp)


def recall(gt_matched, gt_unmatched, pred_matched, pred_unmatched, matched_ious, iou_thr=0.5):
    tp, _, fn = _counts(gt_unmatched, pred_unmatched, matched_ious, iou_thr)
    if tp + fn == 0:
        return 1
    return tp / (tp + fn)


def panoptic_quality(gt_matched, gt_unmatched, pred_matched, pred_unmatched, matched_ious):
    tp_ious = matched_ious[matched_ious >= 0.5]
    tp, fp, fn = _counts(gt_unmatched, pred_unmatched, matched_ious, 0.5)
    if tp + fp + fn == 0:
        return 1
    sq = tp_ious.sum() / (tp + 1e-5)
    rq = tp / (tp + 0.5 * fp + 0.5 * fn)
    return sq * rq


def semantic_iou(gt_rle, pred_rle):
    """IoU between merged semantic RLEs, (n, 2) (start, run) arrays."""
    if len(gt_rle) == 0 and len(pred_rle) == 0:
        return 1
    if len(gt_rle) == 0 or len(pred_rle) == 0:
        return 0
    return rle_iou(gt_rle[:, 0], gt_rle[:, 1], pred_rle[:, 0], pred_rle[:, 1])


def f1_50(**kwargs):
    return f1(**kwargs, iou_thr=0.5)


def f1_75(**kwargs):
    return f1(**kwargs, iou_thr=0.75)


def precision_50(**kwargs):
    return precision(**kwargs, iou_thr=0.5)


def precision_75(**kwargs):
    return precision(**kwargs, iou_thr=0.75)


def recall_50(**kwargs):
    return recall(**kwargs, iou_thr=0.5)


def recall_75(**kwargs):
    return recall(**kwargs, iou_thr=0.75)
