"""Offline evaluator over RLE-JSON tracker dumps (reference
``empanada/evaluation/evaluator.py``): compares two InstanceTracker JSON
files (ground truth vs prediction) with semantic, instance, and panoptic
metric function dictionaries."""

from __future__ import annotations

import json

import numpy as np

from empanada_tpu.core import merge_rles, string_to_rle
from empanada_tpu.stitch.matcher import rle_matcher

__all__ = ["Evaluator", "default_evaluator"]


def _merge_encodings_for_semantic(encodings):
    """Merge all instances' RLE strings into one semantic RLE (n, 2)."""
    if len(encodings) == 0:
        return np.empty((0, 2), dtype=np.int64)
    runs = np.concatenate(
        [np.stack(string_to_rle(enc), axis=1) for enc in encodings]
    )
    if len(runs) == 0:
        return np.empty((0, 2), dtype=np.int64)
    return np.stack(merge_rles(runs[:, 0], runs[:, 1]), axis=1)


class Evaluator:
    def __init__(self, semantic_metrics=None, instance_metrics=None, panoptic_metrics=None):
        self.semantic_metrics = semantic_metrics
        self.instance_metrics = instance_metrics
        self.panoptic_metrics = panoptic_metrics

    @staticmethod
    def _load(json_fpath: str) -> dict:
        with open(json_fpath) as f:
            return json.load(f)

    @staticmethod
    def _instances_with_arrays(instance_dict: dict) -> dict:
        out = {}
        for k, attrs in instance_dict.items():
            starts, runs = string_to_rle(attrs["rle"])
            out[int(k)] = {"box": tuple(attrs["box"]), "starts": starts, "runs": runs}
        return out

    def __call__(self, gt_json_fpath: str, pred_json_fpath: str, return_instances: bool = False):
        gt_json = self._load(gt_json_fpath)
        pred_json = self._load(pred_json_fpath)
        assert gt_json["class_id"] == pred_json["class_id"], (
            "Prediction and ground truth classes must match!"
        )

        semantic_results = {}
        instance_results = {}
        panoptic_results = {}
        instances_dict = None

        if self.semantic_metrics is not None:
            gt_rle = _merge_encodings_for_semantic(
                [a["rle"] for a in gt_json["instances"].values()]
            )
            pred_rle = _merge_encodings_for_semantic(
                [a["rle"] for a in pred_json["instances"].values()]
            )
            semantic_results = {
                name: func(gt_rle, pred_rle)
                for name, func in self.semantic_metrics.items()
            }

        if self.instance_metrics is not None or self.panoptic_metrics is not None:
            gt_instances = self._instances_with_arrays(gt_json["instances"])
            pred_instances = self._instances_with_arrays(pred_json["instances"])
            matched_labels, all_labels, matched_ious = rle_matcher(
                gt_instances, pred_instances
            )
            gt_labels, gt_matched = all_labels[0], matched_labels[0]
            pred_labels, pred_matched = all_labels[1], matched_labels[1]
            kwargs = {
                "gt_matched": gt_matched,
                "pred_matched": pred_matched,
                "gt_unmatched": np.setdiff1d(gt_labels, gt_matched),
                "pred_unmatched": np.setdiff1d(pred_labels, pred_matched),
                "matched_ious": matched_ious,
            }
            if self.instance_metrics is not None:
                instance_results = {
                    name: func(**kwargs) for name, func in self.instance_metrics.items()
                }
            if self.panoptic_metrics is not None:
                panoptic_results = {
                    name: func(**kwargs) for name, func in self.panoptic_metrics.items()
                }
            instances_dict = kwargs

        results = {**semantic_results, **instance_results, **panoptic_results}
        if return_instances:
            return results, instances_dict
        return results


def default_evaluator() -> Evaluator:
    """Evaluator with the standard metric set (semantic IoU; F1/precision/
    recall at 50/75; AP; PQ)."""
    from empanada_tpu.eval import metrics as M

    return Evaluator(
        semantic_metrics={"iou": M.semantic_iou},
        instance_metrics={
            "f1_50": M.f1_50, "f1_75": M.f1_75,
            "precision_50": M.precision_50, "precision_75": M.precision_75,
            "recall_50": M.recall_50, "recall_75": M.recall_75,
            "ap_50": M.ap,
        },
        panoptic_metrics={"pq": M.panoptic_quality},
    )
