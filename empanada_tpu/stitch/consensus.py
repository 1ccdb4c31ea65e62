"""Graph-based instance consensus across ortho-plane trackers and image tiles
(reference ``empanada/consensus.py``).

Pipeline for instances: box screening -> RLE-IoU weighted object graph ->
connected components (dropping components smaller than the majority cluster
size) -> per-component clustering at ``cluster_iou_thr`` -> iterative cluster
merging by connectivity -> per-cluster pixel voting (k-of-n, via the core
event-sweep) -> merging of overlapping survivors.
"""

from __future__ import annotations

from itertools import combinations

import networkx as nx
import numpy as np

from empanada_tpu.core import (
    overlapping_box_pairs,
    join_ranges,
    merge_boxes,
    merge_rles,
    ranges_to_rle,
    rle_ioa,
    rle_iou,
    vote_by_ranges,
)

MIN_OVERLAP = 100
MIN_IOU = 1e-2

__all__ = [
    "merge_objects_from_trackers",
    "merge_semantic_from_trackers",
    "merge_objects_from_tiles",
    "merge_semantic_from_tiles",
    "bounding_box_screening",
    "object_iou_graph",
]


def create_graph_of_clusters(G, cluster_iou_thr):
    """Group nodes whose IoU exceeds cluster_iou_thr; edges between groups
    carry the average iou/overlap of the underlying object graph.

    Cluster-pair averages come from ONE pass over G's edges (absent edges
    contribute 0, so sum/(|c1|*|c2|) equals the all-pairs average the
    reference computes with nested member loops — which is O(C^2 * m^2)
    and dominated consensus at ~1k instances/axis)."""
    H = G.copy()
    for u, v, d in G.edges(data=True):
        if d["iou"] <= cluster_iou_thr:
            H.remove_edge(u, v)

    cluster_graph = nx.Graph()
    node2cluster = {}
    sizes = {}
    for i, cluster in enumerate(nx.connected_components(H)):
        cluster_graph.add_node(i, cluster=cluster)
        sizes[i] = len(cluster)
        for n in cluster:
            node2cluster[n] = i

    pair_sums = {}
    for u, v, d in G.edges(data=True):
        cu, cv = node2cluster[u], node2cluster[v]
        if cu == cv:
            continue
        key = (cu, cv) if cu < cv else (cv, cu)
        acc = pair_sums.setdefault(key, [0.0, 0.0])
        acc[0] += d["iou"]
        acc[1] += d["overlap"]

    for (i, j), (siou, sov) in pair_sums.items():
        denom = sizes[i] * sizes[j]
        iou_w = siou / denom
        ov_w = sov / denom
        if iou_w > MIN_IOU or ov_w > MIN_OVERLAP:
            cluster_graph.add_edge(i, j, iou=iou_w, overlap=ov_w)

    return cluster_graph


def push_cluster(G, src, dst):
    G.nodes[dst]["cluster"] = G.nodes[dst]["cluster"].union(G.nodes[src]["cluster"])
    G.remove_edge(src, dst)
    return G


def merge_clusters(G):
    """Iteratively resolve the cluster graph: the most-connected node either
    absorbs its neighbors or is distributed among them (consensus.py:86)."""
    H = G.copy()
    while len(H.edges()) > 0:
        most_connected = sorted(
            H.nodes, key=lambda x: len(list(H.neighbors(x))), reverse=True
        )[0]
        neighbors = sorted(
            H.neighbors(most_connected),
            key=lambda x: len(H.nodes[x]["cluster"]),
            reverse=True,
        )
        mc_cluster = H.nodes[most_connected]["cluster"]
        push_most_connected = len(H.nodes[neighbors[0]]["cluster"]) > len(mc_cluster)

        if push_most_connected:
            for neighbor in neighbors:
                push_cluster(H, most_connected, neighbor)
            H.remove_node(most_connected)
        else:
            for neighbor in neighbors:
                push_cluster(H, neighbor, most_connected)
                for sn in list(H.neighbors(neighbor)):
                    if not H.has_edge(most_connected, sn):
                        edge_iou = H[neighbor][sn]["iou"]
                        H.add_edge(most_connected, neighbor, iou=edge_iou)
                H.remove_node(neighbor)
    return H


def merge_instances(instances_dict):
    """Union an arbitrary number of instances into one record.

    One k-way union (join_ranges over all members) replaces the pairwise
    merge_rles fold — identical output (both coalesce overlap/adjacency),
    k-1 fewer passes over the big 3D RLEs."""
    if len(instances_dict) < 2:
        return list(instances_dict.values())[0]
    attrs_list = list(instances_dict.values())
    merged_box = attrs_list[0]["box"]
    for attrs in attrs_list[1:]:
        merged_box = merge_boxes(merged_box, attrs["box"])
    joined = join_ranges([_ranges_of(a["starts"], a["runs"]) for a in attrs_list])
    return dict(box=merged_box, starts=joined[:, 0], runs=joined[:, 1] - joined[:, 0])


def merge_overlapping(cluster_instances):
    """Merge surviving instances with non-trivial mutual overlap."""
    if len(cluster_instances) < 2:
        return list(cluster_instances.values())

    instance_ids = list(cluster_instances.keys())
    merge_graph = nx.Graph()
    merge_graph.add_nodes_from(instance_ids)

    from empanada_tpu.core import native

    pairs = np.asarray(list(combinations(range(len(instance_ids)), 2)), np.int64)
    if native.available() and len(pairs):
        # all pairwise intersections of this cluster in one native call
        from empanada_tpu.stitch.matcher import _batch_intersections, _instance_areas

        starts_list = [cluster_instances[k]["starts"] for k in instance_ids]
        runs_list = [cluster_instances[k]["runs"] for k in instance_ids]
        inters = _batch_intersections(
            starts_list, runs_list, starts_list, runs_list, pairs,
            max_threads=1,  # called from the per-component thread pool
        )
        areas = _instance_areas(runs_list)
        unions = areas[pairs[:, 0]] + areas[pairs[:, 1]] - inters
        ious = np.where(unions > 0, inters / np.maximum(unions, 1), 0.0)
        for (i, j), iou, inter in zip(pairs, ious, inters):
            if iou > MIN_IOU or inter > MIN_OVERLAP:
                merge_graph.add_edge(instance_ids[i], instance_ids[j])
    else:
        for c_i, c_j in combinations(instance_ids, 2):
            pair_iou, inter = rle_iou(
                cluster_instances[c_i]["starts"], cluster_instances[c_i]["runs"],
                cluster_instances[c_j]["starts"], cluster_instances[c_j]["runs"],
                return_intersection=True,
            )
            if pair_iou > MIN_IOU or inter > MIN_OVERLAP:
                merge_graph.add_edge(c_i, c_j)

    merged = []
    for comp in nx.connected_components(merge_graph):
        comp_instances = {k: v for k, v in cluster_instances.items() if k in comp}
        merged.append(merge_instances(comp_instances))
    return merged


def bounding_box_screening(boxes: np.ndarray, source_indices: np.ndarray):
    """Unique cross-source box pairs with non-trivial overlap."""
    box_matches = overlapping_box_pairs(boxes)
    r1 = source_indices[box_matches[:, 0]]
    r2 = source_indices[box_matches[:, 1]]
    box_matches = box_matches[r1 != r2]
    box_matches = np.sort(box_matches, axis=-1)
    return np.unique(box_matches, axis=0)


def object_iou_graph(source_indices, object_labels, object_boxes, object_starts, object_runs):
    """Nodes = objects; edges weighted by RLE IoU/overlap.

    All box-screened pair intersections go through one native batch call
    (stitch/matcher.py:_batch_intersections) — a per-pair Python loop costs
    seconds at ortho-plane scale (3 trackers x thousands of instances)."""
    from empanada_tpu.stitch.matcher import _batch_intersections

    box_matches = bounding_box_screening(object_boxes, source_indices)

    graph = nx.Graph()
    for node_id in range(len(object_labels)):
        graph.add_node(
            node_id,
            box=object_boxes[node_id],
            starts=object_starts[node_id],
            runs=object_runs[node_id],
        )
    if len(box_matches):
        inters = _batch_intersections(
            object_starts, object_runs, object_starts, object_runs, box_matches
        )
        areas = np.array([int(np.asarray(r).sum()) for r in object_runs], dtype=np.int64)
        r1 = box_matches[:, 0]
        r2 = box_matches[:, 1]
        unions = areas[r1] + areas[r2] - inters
        for a, b, inter, union in zip(r1, r2, inters, unions):
            if union > 0 and inter > 0:
                graph.add_edge(int(a), int(b), iou=inter / union, overlap=int(inter))
    return graph


def _ranges_of(starts, runs):
    starts = np.asarray(starts)
    runs = np.asarray(runs)
    return np.stack([starts, starts + runs], axis=1)


def merge_semantic_from_trackers(semantic_trackers, pixel_vote_thr: int = 2) -> dict:
    """Plain pixel vote across trackers of a semantic (stuff) class."""
    boxes, starts, runs = [], [], []
    for tr in semantic_trackers:
        assert len(tr.instances) <= 1, "Semantic classes only have 1 label!"
        for attrs in tr.instances.values():
            boxes.append(attrs["box"])
            starts.append(attrs["starts"])
            runs.append(attrs["runs"])
    if not boxes:
        return {}

    merged_box = boxes[0]
    for box in boxes[1:]:
        merged_box = merge_boxes(merged_box, box)

    seg_ranges = vote_by_ranges([_ranges_of(s, r) for s, r in zip(starts, runs)], pixel_vote_thr)
    if len(seg_ranges) == 0:
        # PARITY: the reference still emits the semantic instance record
        # (key 1) with an empty RLE when the vote clears nothing
        # (consensus.py:340-346) — except when fewer non-empty trackers
        # than vote_thr exist, where its numba vote returns a 1-D empty
        # array and it CRASHES on seg_ranges[:, 0]; we return the
        # empty-RLE record there too instead of reproducing the crash.
        seg_ranges = np.empty((0, 2), dtype=np.int64)
    return {
        1: {
            "box": merged_box,
            "starts": seg_ranges[:, 0],
            "runs": seg_ranges[:, 1] - seg_ranges[:, 0],
        }
    }


def merge_objects_from_trackers(
    object_trackers,
    pixel_vote_thr: int = 2,
    cluster_iou_thr: float = 0.75,
    bypass: bool = False,
) -> dict:
    """Instance consensus across ortho-plane trackers (consensus.py:348)."""
    n_votes = len(object_trackers)
    min_cluster_size = 1 if bypass else (n_votes // 2) + 1
    if pixel_vote_thr < min_cluster_size:
        cluster_iou_thr = 0

    tracker_indices, object_labels = [], []
    object_boxes, object_starts, object_runs = [], [], []
    for tr_index, tr in enumerate(object_trackers):
        for instance_id, attrs in tr.instances.items():
            tracker_indices.append(tr_index)
            object_labels.append(int(instance_id))
            object_boxes.append(attrs["box"])
            object_starts.append(attrs["starts"])
            object_runs.append(attrs["runs"])

    if not object_boxes:
        return {}

    tracker_indices = np.array(tracker_indices)
    object_labels = np.array(object_labels)
    object_boxes = np.array(object_boxes)

    graph = object_iou_graph(
        tracker_indices, object_labels, object_boxes, object_starts, object_runs
    )

    def resolve_component(comp):
        cluster_graph = create_graph_of_clusters(graph.subgraph(comp), cluster_iou_thr)
        cluster_graph = merge_clusters(cluster_graph)

        cluster_id = 1
        cluster_instances = {}
        for node in cluster_graph.nodes:
            cluster = list(cluster_graph.nodes[node]["cluster"])
            if len(cluster) < min_cluster_size:
                continue

            node0 = cluster[0]
            merged_box = graph.nodes[node0]["box"]
            for node_id in cluster[1:]:
                merged_box = merge_boxes(merged_box, graph.nodes[node_id]["box"])

            all_ranges = [
                _ranges_of(graph.nodes[n]["starts"], graph.nodes[n]["runs"])
                for n in cluster
            ]
            voted = vote_by_ranges(all_ranges, pixel_vote_thr)
            if len(voted) > 0:
                cluster_instances[cluster_id] = {
                    "box": tuple(int(b) for b in merged_box),
                    "starts": voted[:, 0],
                    "runs": voted[:, 1] - voted[:, 0],
                }
                cluster_id += 1

        return merge_overlapping(cluster_instances)

    components = [
        comp for comp in nx.connected_components(graph)
        if len(comp) >= min_cluster_size
    ]
    # components are independent; the hot work (native votes/intersections)
    # releases the GIL, so a thread pool parallelizes it.  Results are
    # renumbered in component order, so the output is identical to the
    # sequential loop.
    if len(components) > 3:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(components))) as pool:
            resolved = list(pool.map(resolve_component, components))
    else:
        resolved = [resolve_component(c) for c in components]

    instance_id = 1
    instances = {}
    for merged in resolved:
        for attrs in merged:
            instances[instance_id] = attrs
            instance_id += 1

    return instances


def merge_semantic_from_tiles(tiles) -> dict:
    """Union of semantic RLEs across tiles (consensus.py:471)."""
    label_id = None
    boxes, starts, runs = [], [], []
    for tile_instances in tiles:
        for instance_id, attrs in tile_instances.items():
            if label_id is None:
                label_id = instance_id
            boxes.append(attrs["box"])
            starts.append(attrs["starts"])
            runs.append(attrs["runs"])
    if not boxes:
        return {}

    merged_box = boxes[0]
    for box in boxes[1:]:
        merged_box = merge_boxes(merged_box, box)

    seg_ranges = join_ranges([_ranges_of(s, r) for s, r in zip(starts, runs)])
    return {
        label_id: {
            "box": merged_box,
            "starts": seg_ranges[:, 0],
            "runs": seg_ranges[:, 1] - seg_ranges[:, 0],
        }
    }


def merge_objects_from_tiles(tiles, overlap_rle=None) -> dict:
    """Union-merge of instances across tiles; objects seen by only one tile
    that sit mostly (IoA > 0.1) inside the tile-overlap region are dropped as
    likely false positives (consensus.py:526)."""
    tile_indices, object_labels = [], []
    object_boxes, object_starts, object_runs = [], [], []
    for tile_idx, tile_instances in enumerate(tiles):
        for instance_id, attrs in tile_instances.items():
            tile_indices.append(tile_idx)
            object_labels.append(int(instance_id))
            object_boxes.append(attrs["box"])
            object_starts.append(attrs["starts"])
            object_runs.append(attrs["runs"])

    if not object_boxes:
        return {}

    tile_indices = np.array(tile_indices)
    object_labels = np.array(object_labels)
    object_boxes = np.array(object_boxes)

    graph = object_iou_graph(
        tile_indices, object_labels, object_boxes, object_starts, object_runs
    )

    if overlap_rle is not None:
        overlap_starts, overlap_runs = overlap_rle

    instance_id = int(np.min(object_labels))
    instances = {}
    for cluster in nx.connected_components(graph):
        cluster = list(cluster)
        node0 = cluster[0]
        merged_box = graph.nodes[node0]["box"]
        for node_id in cluster[1:]:
            merged_box = merge_boxes(merged_box, graph.nodes[node_id]["box"])

        all_ranges = [
            _ranges_of(graph.nodes[n]["starts"], graph.nodes[n]["runs"]) for n in cluster
        ]
        voted_ranges = join_ranges(all_ranges)

        if overlap_rle is not None and len(cluster) < 2 and np.any(voted_ranges):
            voted_rle = ranges_to_rle(voted_ranges)
            ov_ioa = rle_ioa(overlap_starts, overlap_runs, voted_rle[:, 0], voted_rle[:, 1])
            if ov_ioa > 0.1:
                voted_ranges = np.empty((0, 2), dtype=np.int64)

        if np.any(voted_ranges):
            instances[instance_id] = {
                "box": tuple(int(b) for b in merged_box),
                "starts": voted_ranges[:, 0],
                "runs": voted_ranges[:, 1] - voted_ranges[:, 0],
            }
            instance_id += 1

    return instances
