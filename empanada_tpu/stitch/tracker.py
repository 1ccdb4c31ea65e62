"""3D instance tracking: accumulates per-slice 2D RLEs into 3D RLEs along an
axis (reference ``empanada/inference/tracker.py``).

The 2D->3D flat-index conversion is axis dependent:
- xy: the 2D flat index maps directly, offset by ``index2d * H * W``;
- xz: run starts are re-raveled with the fixed y plane inserted (runs stay
  intact because x remains the fastest axis);
- yz: every voxel's index must be recomputed (x becomes the slice plane), so
  runs are exploded and re-encoded at ``finish``.
"""

from __future__ import annotations

import json
import math
import os
from copy import deepcopy

import numpy as np

from empanada_tpu.core import (
    merge_boxes,
    rle_decode,
    rle_encode,
    rle_to_string,
    string_to_rle,
)
from empanada_tpu.core.labeling import FlatInstances, flat_matches_dict

__all__ = ["InstanceTracker", "to_box3d"]


def _valid_flat(d):
    """The slice's FlatInstances: the object itself on the flat wire, the
    dict's attached form (validated) otherwise, None when absent/stale."""
    if isinstance(d, FlatInstances):
        return d
    flat = getattr(d, "_flat", None)
    if flat is None or not flat_matches_dict(flat, d):
        return None
    return flat

AXIS_NUMS = {"xy": 0, "xz": 1, "yz": 2}


def to_box3d(index2d: int, box, axis: str):
    assert axis in AXIS_NUMS
    h1, w1, h2, w2 = box
    if axis == "xy":
        return (index2d, h1, w1, index2d + 1, h2, w2)
    if axis == "xz":
        return (h1, index2d, w1, h2, index2d + 1, w2)
    return (h1, w1, index2d, h2, w2, index2d + 1)


class InstanceTracker:
    def __init__(self, class_id=None, label_divisor=None, shape3d=None, axis="xy"):
        assert axis in AXIS_NUMS
        self.class_id = class_id
        self.label_divisor = label_divisor
        self.shape3d = tuple(shape3d) if shape3d is not None else None
        self.axis = axis
        self.finished = False
        self.reset()

    def reset(self):
        self.instances = {}

    def update(self, instance_rles: dict, index2d: int):
        assert self.class_id is not None
        assert self.label_divisor is not None
        assert self.shape3d is not None
        assert not self.finished, "Cannot update tracker after calling finish!"

        ignore_idx = AXIS_NUMS[self.axis]
        shape2d = tuple(s for i, s in enumerate(self.shape3d) if i != ignore_idx)

        # the 2D->3D index conversion is label-independent, so when the
        # slice carries its flat form, convert ALL runs in one vectorized
        # pass and hand out per-instance views
        flat = _valid_flat(instance_rles)
        if flat is not None:
            starts2d_all = flat.starts
            runs2d_all = flat.runs
            if self.axis == "xy":
                starts_all = starts2d_all + index2d * math.prod(shape2d)
                runs_all = runs2d_all
                bounds = flat.offsets
            elif self.axis == "xz":
                ycoords, xcoords = np.unravel_index(starts2d_all, shape2d)
                starts_all = np.ravel_multi_index(
                    (ycoords, np.full_like(ycoords, index2d), xcoords), self.shape3d
                )
                runs_all = runs2d_all
                bounds = flat.offsets
            else:  # yz: explode to voxels, re-encode later
                flat2d = rle_decode(starts2d_all, runs2d_all)
                ycoords, xcoords = np.unravel_index(flat2d, shape2d)
                starts_all = np.ravel_multi_index(
                    (ycoords, xcoords, np.full_like(ycoords, index2d)), self.shape3d
                )
                runs_all = np.ones_like(starts_all)
                bounds = np.concatenate([[0], np.cumsum(flat.areas)])

            boxes2d = flat.boxes.tolist()
            for k, label in enumerate(flat.labels.tolist()):
                box = to_box3d(index2d, boxes2d[k], self.axis)
                starts = starts_all[bounds[k] : bounds[k + 1]]
                runs = runs_all[bounds[k] : bounds[k + 1]]
                inst = self.instances.get(label)
                if inst is None:
                    self.instances[label] = {"box": box, "starts": [starts], "runs": [runs]}
                else:
                    inst["box"] = merge_boxes(box, inst["box"])
                    inst["starts"].append(starts)
                    inst["runs"].append(runs)
            return

        for label, attrs in instance_rles.items():
            box = to_box3d(index2d, attrs["box"], self.axis)
            starts2d = np.asarray(attrs["starts"], dtype=np.int64)
            runs2d = np.asarray(attrs["runs"], dtype=np.int64)

            if self.axis == "xy":
                starts = starts2d + index2d * math.prod(shape2d)
                runs = runs2d
            elif self.axis == "xz":
                ycoords, xcoords = np.unravel_index(starts2d, shape2d)
                starts = np.ravel_multi_index(
                    (ycoords, np.full_like(ycoords, index2d), xcoords), self.shape3d
                )
                runs = runs2d
            else:  # yz: explode to voxels, re-encode later
                flat2d = rle_decode(starts2d, runs2d)
                ycoords, xcoords = np.unravel_index(flat2d, shape2d)
                starts = np.ravel_multi_index(
                    (ycoords, xcoords, np.full_like(ycoords, index2d)), self.shape3d
                )
                runs = np.ones_like(starts)

            if label not in self.instances:
                self.instances[label] = {"box": box, "starts": [starts], "runs": [runs]}
            else:
                inst = self.instances[label]
                inst["box"] = merge_boxes(box, inst["box"])
                inst["starts"].append(starts)
                inst["runs"].append(runs)

    def finish(self):
        if self.axis == "yz":
            # batched re-encode: the per-voxel yz runs of ALL instances are
            # sorted in ONE pass via the key id * prod(shape3d) + voxel
            # (voxel < prod, so runs can never merge across instances:
            # consecutive keys imply same id), then run-length encoded
            # vectorized and split back per instance — the per-instance
            # sort+encode loop dominated 256^3 ortho tracking on 1-core
            # hosts
            pending = [(k, v) for k, v in self.instances.items()
                       if isinstance(v["starts"], list)]
            if pending:
                prod = int(np.prod(self.shape3d))
                # ONE concatenate over every instance's per-slice chunks
                # (per-instance concats of many tiny arrays dominate)
                chunks, chunk_ids = [], []
                for gi, (_, v) in enumerate(pending):
                    chunks.extend(v["starts"])
                    chunk_ids.extend([gi] * len(v["starts"]))
                lens = np.fromiter((len(c) for c in chunks), np.int64,
                                   count=len(chunks))
                ids = np.repeat(np.asarray(chunk_ids, dtype=np.int64), lens)
                keys = np.concatenate(chunks) + ids * prod
                keys.sort(kind="stable")
                starts_all, runs_all = rle_encode(keys)
                run_ids = starts_all // prod
                starts_all = starts_all - run_ids * prod
                bounds = np.searchsorted(run_ids,
                                         np.arange(len(pending) + 1))
                for gi, (_, inst) in enumerate(pending):
                    inst["starts"] = starts_all[bounds[gi]:bounds[gi + 1]]
                    inst["runs"] = runs_all[bounds[gi]:bounds[gi + 1]]
            self.finished = True
            return
        for instance_id in self.instances:
            inst = self.instances[instance_id]
            if not isinstance(inst["starts"], list):
                continue
            starts = np.concatenate(inst["starts"])
            runs = np.concatenate(inst["runs"])
            order = np.argsort(starts, kind="stable")
            starts = starts[order]
            runs = runs[order]
            inst["starts"] = starts
            inst["runs"] = runs
        self.finished = True

    def write_to_json(self, savepath: str):
        if not self.finished:
            self.finish()
        save_dict = {
            "class_id": self.class_id,
            "label_divisor": self.label_divisor,
            "shape3d": list(self.shape3d),
            "axis": self.axis,
            "finished": True,
            "instances": {},
        }
        for k, attrs in self.instances.items():
            save_dict["instances"][str(k)] = {
                "box": [int(b) for b in attrs["box"]],
                "rle": rle_to_string(attrs["starts"], attrs["runs"]),
            }
        # atomic write: a crash mid-dump must not leave a truncated file
        # that later passes existence checks (checkpoint resume relies on
        # this, stitch/checkpoint.py)
        tmp = savepath + ".tmp"
        with open(tmp, "w") as handle:
            json.dump(save_dict, handle, indent=2)
        os.replace(tmp, savepath)

    def load_from_json(self, fpath: str):
        with open(fpath) as handle:
            load_dict = json.load(handle)
        self.class_id = load_dict["class_id"]
        self.label_divisor = load_dict["label_divisor"]
        self.shape3d = tuple(load_dict["shape3d"])
        self.axis = load_dict["axis"]
        self.finished = load_dict.get("finished", True)
        self.instances = {}
        for k, attrs in load_dict["instances"].items():
            starts, runs = string_to_rle(attrs["rle"])
            self.instances[int(k)] = {
                "box": tuple(attrs["box"]),
                "starts": starts,
                "runs": runs,
            }
