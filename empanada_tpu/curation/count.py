"""Label counting + spreadsheet export (reference
``empanada_napari/_label_counter_widget.py``)."""

from __future__ import annotations

import csv

import numpy as np

__all__ = ["count_labels", "save_label_lists"]


def count_labels(label_values: np.ndarray, label_divisor: int):
    """Group unique label ids by class via the label divisor
    (reference :105).  Returns ({class_id: [ids]}, [class_ids])."""
    label_values = np.unique(np.asarray(label_values))
    label_values = label_values[label_values > 0]
    if label_divisor == 0:
        return {1: label_values.tolist()}, [1]

    class_ids = np.unique(label_values // label_divisor).tolist()
    label_queue = {}
    for ci in class_ids:
        min_id = ci * label_divisor
        max_id = (ci + 1) * label_divisor
        ids = label_values[(label_values >= min_id) & (label_values < max_id)]
        label_queue[ci] = ids.tolist()
    return label_queue, class_ids


def save_label_lists(label_queues, class_names, file_path: str):
    """Write per-class label id lists to a spreadsheet (xlsx when openpyxl
    exists, else csv — the reference hard-requires openpyxl)."""
    rows = []
    for queue in label_queues:
        for class_id, ids in queue.items():
            name = class_names.get(class_id, str(class_id))
            rows.append([name, class_id, len(ids)] + ids)

    if file_path.endswith(".xlsx"):
        try:
            from openpyxl import Workbook

            wb = Workbook()
            ws = wb.active
            ws.append(["class_name", "class_id", "count", "label_ids..."])
            for row in rows:
                ws.append(row)
            wb.save(file_path)
            return file_path
        except ImportError:
            file_path = file_path[:-5] + ".csv"

    with open(file_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["class_name", "class_id", "count", "label_ids..."])
        writer.writerows(rows)
    return file_path
