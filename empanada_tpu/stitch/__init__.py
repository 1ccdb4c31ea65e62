"""Stitching/tracking layer (L3): RLE codecs, cross-slice matching, 3D
tracking, filters, ortho-plane/tile consensus, tiler, BC watershed."""

from empanada_tpu.stitch.consensus import (
    merge_objects_from_tiles,
    merge_objects_from_trackers,
    merge_semantic_from_tiles,
    merge_semantic_from_trackers,
)
from empanada_tpu.stitch.matcher import RLEMatcher, fast_matcher, rle_matcher
from empanada_tpu.stitch.rle_seg import (
    pan_seg_to_rle_seg,
    rle_seg_to_pan_seg,
    unpack_rle_attrs,
)
from empanada_tpu.stitch.tile import Tiler
from empanada_tpu.stitch.tracker import InstanceTracker
from empanada_tpu.stitch.watershed import bc_watershed

__all__ = [
    "merge_objects_from_tiles",
    "merge_objects_from_trackers",
    "merge_semantic_from_tiles",
    "merge_semantic_from_trackers",
    "RLEMatcher",
    "fast_matcher",
    "rle_matcher",
    "pan_seg_to_rle_seg",
    "rle_seg_to_pan_seg",
    "unpack_rle_attrs",
    "Tiler",
    "InstanceTracker",
    "bc_watershed",
]
