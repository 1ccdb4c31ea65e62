"""Plugin-runtime orchestration (reference ``empanada_napari/inference.py``):
``Engine2d`` (single image / parameter testing / tiled big images) and
``Engine3d`` (stack and ortho-plane inference with overlap-threaded
matching), plus the stack-postprocessing and consensus generator workers.

Device placement: the model runs on the default JAX device (TPU when
present); ``use_gpu``/``use_quantized`` knobs from the reference are accepted
for API compatibility (quantization on TPU = bf16 compute, see
``input_dtype``/``compute_dtype``).
"""

from __future__ import annotations

import numpy as np

from empanada_tpu.core.chunked import ChunkedArray, create_chunked
from empanada_tpu.core.labeling import extract_runs, connected_components_runs
from empanada_tpu.data.volume import VolumeDataset, resize_by_factor
from empanada_tpu.engine import (
    PanopticDeepLabRenderEngine,
    PanopticDeepLabRenderEngine3d,
)
from empanada_tpu.stitch import (
    Tiler,
    merge_objects_from_tiles,
    merge_semantic_from_tiles,
    pan_seg_to_rle_seg,
    rle_seg_to_pan_seg,
)
from empanada_tpu.stitch import filters
from empanada_tpu.stitch.patterns import (
    MatcherWorker,
    backward_matching,
    create_instance_consensus,
    create_matchers,
    create_semantic_consensus,
    fill_panoptic_volume,
    fill_volume,
    finish_tracking,
    get_axis_trackers_by_class,
    update_trackers,
)
from empanada_tpu.stitch.tracker import InstanceTracker
from empanada_tpu.api.utils import Preprocessor, load_model_from_config

__all__ = [
    "instance_relabel",
    "stack_postprocessing",
    "tracker_consensus",
    "combine_panoptic_maps",
    "Engine2d",
    "Engine3d",
]


def combine_panoptic_maps(pan_segs, configs, label_divisor: int = 1000):
    """Combine per-model panoptic maps into ONE panoptic id space.

    The reference has no single-map equivalent: its users run one inference
    widget per model (MitoNet + NucleoNet + DropNet, BASELINE.md
    "multi-model panoptic") and view the resulting napari layers stacked.
    This is the headless analog — model order is priority order, i.e. where
    an earlier model predicted a non-background pixel, later models do not
    overwrite it (top layer occludes).

    Class ids are remapped to a disjoint global space: model ``m``'s class
    ``c`` becomes ``offset_m + c`` with ``offset_m`` the cumulative max
    class id of all earlier models; instance ids (``pan % label_divisor``)
    are preserved.  Returns ``(combined, class_names)`` with ``class_names``
    mapping global class id -> ``"<model_name>/<class_name>"``.
    """
    if len(pan_segs) != len(configs):
        raise ValueError(
            f"{len(pan_segs)} maps but {len(configs)} model configs"
        )
    combined = None
    class_names: dict[int, str] = {}
    offset = 0
    for pan, config in zip(pan_segs, configs):
        pan = np.asarray(pan)
        model_name = config.get("model_name", config.get("arch", "model"))
        for cid, cname in (config.get("class_names") or {}).items():
            class_names[offset + int(cid)] = f"{model_name}/{cname}"
        cls = pan // label_divisor
        shifted = np.where(cls > 0, pan + offset * label_divisor, 0)
        if combined is None:
            combined = shifted
        else:
            if pan.shape != combined.shape:
                raise ValueError(
                    f"panoptic map shapes differ: {pan.shape} vs {combined.shape}"
                )
            combined = np.where(combined == 0, shifted, combined)
        labels = [int(v) for v in (config.get("labels") or [0])]
        offset += max(max(labels), int(cls.max(initial=0)))
    return combined, class_names


def instance_relabel(tracker) -> dict:
    """Renumber a tracker's instances from 1, sorting each RLE
    (reference inference.py:31)."""
    instance_id = 1
    instances = {}
    for attrs in tracker.instances.values():
        starts = np.asarray(attrs["starts"])
        runs = np.asarray(attrs["runs"])
        order = np.argsort(starts, kind="stable")
        instances[instance_id] = {
            "box": attrs["box"],
            "starts": starts[order],
            "runs": runs[order],
        }
        instance_id += 1
    return instances


def stack_postprocessing(
    trackers,
    store_url,
    model_config,
    label_divisor: int = 1000,
    min_size: int = 200,
    min_extent: int = 4,
    dtype=np.uint32,
    chunk_size=(256, 256, 256),
):
    """Per-class relabel + filter + fill; yields (volume, class_name,
    instances) (reference inference.py:56)."""
    thing_list = model_config["thing_list"]
    class_names = model_config["class_names"]

    for class_id, class_name in class_names.items():
        class_tracker = get_axis_trackers_by_class(trackers, class_id)[0]
        shape3d = class_tracker.shape3d

        stack_tracker = InstanceTracker(class_id, label_divisor, shape3d, "xy")
        stack_tracker.instances = instance_relabel(class_tracker)
        stack_tracker.finished = True

        if class_id in thing_list:
            filters.remove_small_objects(stack_tracker, min_size=min_size)
            filters.remove_pancakes(stack_tracker, min_span=min_extent)
            class_dtype = dtype
        else:
            class_dtype = np.uint8

        if store_url is not None:
            stack_vol = create_chunked(
                f"{store_url.rstrip('/')}/{class_name}", shape3d, chunk_size, class_dtype
            )
        else:
            stack_vol = np.zeros(shape3d, dtype=class_dtype)

        fill_volume(stack_vol, stack_tracker.instances)
        yield stack_vol, class_name, stack_tracker.instances


def tracker_consensus(
    trackers,
    store_url,
    model_config,
    label_divisor: int = 1000,
    pixel_vote_thr: int = 2,
    cluster_iou_thr: float = 0.75,
    allow_one_view: bool = False,
    min_size: int = 200,
    min_extent: int = 4,
    dtype=np.uint32,
    chunk_size=(256, 256, 256),
):
    """Per-class ortho-plane consensus; yields (volume, class_name,
    instances) (reference inference.py:111)."""
    thing_list = model_config["thing_list"]
    class_names = model_config["class_names"]

    for class_id, class_name in class_names.items():
        class_trackers = get_axis_trackers_by_class(trackers, class_id)
        shape3d = class_trackers[0].shape3d

        if class_id in thing_list:
            consensus_tracker = create_instance_consensus(
                class_trackers, pixel_vote_thr, cluster_iou_thr, allow_one_view
            )
            filters.remove_small_objects(consensus_tracker, min_size=min_size)
            filters.remove_pancakes(consensus_tracker, min_span=min_extent)
            class_dtype = dtype
        else:
            consensus_tracker = create_semantic_consensus(class_trackers, pixel_vote_thr)
            class_dtype = np.uint8

        if store_url is not None:
            consensus_vol = create_chunked(
                f"{store_url.rstrip('/')}/{class_name}", shape3d, chunk_size, class_dtype
            )
        else:
            consensus_vol = np.zeros(shape3d, dtype=class_dtype)

        fill_volume(consensus_vol, consensus_tracker.instances)
        yield consensus_vol, class_name, consensus_tracker.instances


class Engine2d:
    """2D / parameter-testing engine with a tiled big-image path
    (reference inference.py:171)."""

    def __init__(
        self,
        model_config,
        inference_scale: int = 1,
        label_divisor: int = 1000,
        nms_threshold: float = 0.1,
        nms_kernel: int = 3,
        confidence_thr: float = 0.3,
        semantic_only: bool = False,
        fine_boundaries: bool = False,
        tile_size: int = 0,
        max_centers: int = 256,
        shape_buckets: bool = False,
        spatial_shard: bool = False,
        spatial_halo: int = 128,
        spatial_mesh=None,
        model_and_variables=None,
        **kwargs,
    ):
        if model_and_variables is None:
            model, variables = load_model_from_config(model_config)
        else:
            model, variables = model_and_variables

        self.model_config = model_config
        self.thing_list = model_config["thing_list"]
        self.labels = model_config["labels"]
        self.class_names = model_config["class_names"]
        self.label_divisor = label_divisor
        self.padding_factor = model_config.get("padding_factor", 128)
        self.inference_scale = inference_scale
        self.fine_boundaries = fine_boundaries
        self.tile_size = tile_size

        # Seam-free big-slice path: row-shard the slice over the device mesh
        # with halo exchange instead of the serial tile loop (the TPU-native
        # replacement for merge_objects_from_tiles,
        # /root/reference/empanada/consensus.py:526)
        self.spatial_engine = None
        if spatial_shard:
            from empanada_tpu.parallel.spatial import SpatialEngine2d

            self.spatial_engine = SpatialEngine2d(
                model, variables,
                thing_list=[] if semantic_only else model_config["thing_list"],
                mesh=spatial_mesh,
                halo=spatial_halo,
                label_divisor=label_divisor,
                nms_threshold=nms_threshold,
                nms_kernel=nms_kernel,
                confidence_thr=confidence_thr,
                padding_factor=self.padding_factor,
                coarse_boundaries=not fine_boundaries,
                max_centers=max_centers,
            )

        thing_list = [] if semantic_only else self.thing_list

        self.engine = PanopticDeepLabRenderEngine(
            model,
            variables,
            thing_list=thing_list,
            label_divisor=label_divisor,
            nms_threshold=nms_threshold,
            nms_kernel=nms_kernel,
            confidence_thr=confidence_thr,
            padding_factor=self.padding_factor,
            coarse_boundaries=not fine_boundaries,
            max_centers=max_centers,
            shape_buckets=shape_buckets,
        )
        self.last_overflow = 0
        self.preprocessor = Preprocessor(**model_config["norms"])

    def update_params(
        self,
        inference_scale,
        label_divisor,
        nms_threshold,
        nms_kernel,
        confidence_thr,
        fine_boundaries,
        semantic_only: bool = False,
        tile_size: int = 0,
    ):
        self.inference_scale = inference_scale
        self.label_divisor = label_divisor
        self.fine_boundaries = fine_boundaries
        self.tile_size = tile_size
        self.engine.update_params(
            label_divisor=label_divisor,
            nms_threshold=nms_threshold,
            nms_kernel=nms_kernel,
            confidence_thr=confidence_thr,
            coarse_boundaries=not fine_boundaries,
        )
        if self.spatial_engine is not None:
            self.spatial_engine.update_params(
                label_divisor=label_divisor,
                nms_threshold=nms_threshold,
                nms_kernel=nms_kernel,
                confidence_thr=confidence_thr,
                coarse_boundaries=not fine_boundaries,
            )
        self.engine.thing_list = () if semantic_only else tuple(self.thing_list)
        self.engine._build_jits()

    def force_connected(self, pan_seg: np.ndarray) -> np.ndarray:
        """Relabel each thing class's instances as connected components
        (reference inference.py:263)."""
        for label in self.engine.thing_list:
            min_id = label * self.label_divisor
            max_id = min_id + self.label_divisor
            inside = (pan_seg >= min_id) & (pan_seg < max_id)
            masked = np.where(inside, pan_seg, 0)
            v, r, cs, ce = extract_runs(masked)
            if len(v) == 0:
                continue
            comp = connected_components_runs(v, r, cs, ce, connectivity=8)
            for c, row, s, e in zip(comp, r, cs, ce):
                pan_seg[row, s:e] = c + min_id
        return pan_seg

    def _warn_overflow(self):
        dropped = self.engine.dropped_centers()
        self.last_overflow = dropped  # inspectable by tests/benches
        if dropped:
            import sys

            print(
                f"warning: up to {dropped} NMS centers exceeded "
                f"max_centers={self.engine.max_centers} and were dropped "
                "(instances merged into nearest neighbors) — rerun with a "
                "larger max_centers",
                file=sys.stderr,
            )
        self.engine.reset_overflow()

    def infer(self, image: np.ndarray) -> np.ndarray:
        if self.spatial_engine is not None:
            size = image.shape
            image = resize_by_factor(image, self.inference_scale)
            prep = self.preprocessor(image)["image"][0]  # (H, W) float
            # scale > 1 runs the same extra PointRend render steps as the
            # unsharded path (engines.py _forward_out), so the full-res map
            # is ladder-refined, not nearest-upsampled
            pan_seg = self.spatial_engine(
                prep, upsampling=self.inference_scale
            )[: size[0], : size[1]]
            return self.force_connected(pan_seg.astype(np.int64))

        if self.tile_size > 0 and any(s > self.tile_size for s in image.shape):
            tiler = Tiler(
                image.shape,
                tile_size=self.tile_size,
                overlap_width=min(128, int(self.tile_size * 0.1)),
            )
            # pipeline: dispatch tile i's device chain, then do tile i-1's
            # host RLE/translate work while i computes (async JAX dispatch)
            rle_segs = []
            pending = None  # (device pan, tile index)

            def _drain(dev_pan, idx):
                tile_rle = pan_seg_to_rle_seg(
                    np.asarray(dev_pan).astype(np.int64), self.labels,
                    self.label_divisor, self.engine.thing_list,
                )
                rle_segs.append(tiler.translate_rle_seg(tile_rle, idx))

            for i in range(len(tiler)):
                tile = tiler(image, i)
                tile_size = tile.shape
                tile = resize_by_factor(tile, self.inference_scale)
                tile = self.preprocessor(tile)["image"]
                dev_pan = self.engine.dispatch(
                    tile, tile_size, upsampling=self.inference_scale
                )
                if pending is not None:
                    _drain(*pending)
                pending = (dev_pan, i)
            if pending is not None:
                _drain(*pending)

            rle_seg = {}
            for label in self.labels:
                if label in self.engine.thing_list:
                    rle_seg[label] = merge_objects_from_tiles(
                        [rs[label] for rs in rle_segs], tiler.overlap_rle
                    )
                else:
                    rle_seg[label] = merge_semantic_from_tiles(
                        [rs[label] for rs in rle_segs]
                    )
            self._warn_overflow()
            return rle_seg_to_pan_seg(rle_seg, image.shape).astype(np.int64)

        size = image.shape
        image = resize_by_factor(image, self.inference_scale)
        image = self.preprocessor(image)["image"]
        pan_seg = self.engine(image, size, upsampling=self.inference_scale)
        self._warn_overflow()
        return self.force_connected(pan_seg.astype(np.int64))


class Engine3d:
    """3D stack / ortho-plane engine (reference inference.py:327)."""

    def __init__(
        self,
        model_config,
        inference_scale: int = 1,
        label_divisor: int = 1000,
        median_kernel_size: int = 5,
        stuff_area: int = 64,
        void_label: int = 0,
        nms_threshold: float = 0.1,
        nms_kernel: int = 3,
        confidence_thr: float = 0.3,
        force_connected: bool = True,
        min_size: int = 500,
        min_extent: int = 4,
        fine_boundaries: bool = False,
        semantic_only: bool = False,
        store_url=None,
        chunk_size=(256, 256, 256),
        save_panoptic: bool = False,
        label_erosion: int = 0,
        label_dilation: int = 0,
        fill_holes_in_segmentation: bool = False,
        max_centers: int = 256,
        shape_buckets: bool = False,
        merge_iou_thr: float = 0.25,
        merge_ioa_thr: float = 0.25,
        model_and_variables=None,
        **kwargs,
    ):
        if model_and_variables is None:
            model, variables = load_model_from_config(model_config)
        else:
            model, variables = model_and_variables

        self.model_config = model_config
        self.labels = model_config["labels"]
        self.class_names = model_config["class_names"]
        self.label_divisor = label_divisor
        self.padding_factor = model_config.get("padding_factor", 128)
        self.inference_scale = inference_scale
        self.label_erosion = label_erosion
        self.label_dilation = label_dilation
        self.fill_holes_in_segmentation = fill_holes_in_segmentation

        self.thing_list = [] if semantic_only else model_config["thing_list"]

        self.engine = PanopticDeepLabRenderEngine3d(
            model,
            variables,
            thing_list=self.thing_list,
            median_kernel_size=median_kernel_size,
            label_divisor=label_divisor,
            stuff_area=stuff_area,
            void_label=void_label,
            nms_threshold=nms_threshold,
            nms_kernel=nms_kernel,
            confidence_thr=confidence_thr,
            padding_factor=self.padding_factor,
            coarse_boundaries=not fine_boundaries,
            max_centers=max_centers,
            shape_buckets=shape_buckets,
        )
        self.last_overflow = 0
        self.preprocessor = Preprocessor(**model_config["norms"])

        self.axes = {"xy": 0, "xz": 1, "yz": 2}
        # per-engine matcher thresholds (reference exposes these,
        # empanada_napari/inference.py:340-345)
        self.merge_iou_thr = float(merge_iou_thr)
        self.merge_ioa_thr = float(merge_ioa_thr)
        self.force_connected = force_connected
        self.min_size = min_size
        self.min_extent = min_extent
        self.fine_boundaries = fine_boundaries

        self.save_panoptic = save_panoptic
        self.chunk_size = chunk_size
        self.store_url = store_url
        self.dtype = np.int32

    def create_trackers(self, shape3d, axis_name):
        return [
            InstanceTracker(label, self.label_divisor, shape3d, axis_name)
            for label in self.labels
        ]

    def create_panoptic_stack(self, axis_name, shape3d):
        if self.store_url is not None and self.save_panoptic:
            return create_chunked(
                f"{self.store_url.rstrip('/')}/panoptic_{axis_name}",
                shape3d, self.chunk_size, self.dtype,
            )
        if self.save_panoptic:
            return np.zeros(shape3d, dtype=self.dtype)
        return None

    def _checkpoint_meta(self, volume, axis_name: str) -> dict:
        """Run-configuration fingerprint guarding checkpoint resume."""
        from empanada_tpu.stitch import checkpoint as ckpt

        return {
            "axis_name": axis_name,
            "volume_shape": list(volume.shape),
            "volume_fingerprint": ckpt.volume_fingerprint(volume),
            "label_divisor": self.label_divisor,
            "labels": [int(c) for c in self.labels],
            "thing_list": [int(c) for c in self.thing_list],
            "inference_scale": self.inference_scale,
            "median_kernel_size": self.engine.median.ks,
            "force_connected": self.force_connected,
            "merge_iou_thr": self.merge_iou_thr,
            "merge_ioa_thr": self.merge_ioa_thr,
            "model_name": self.model_config.get("model_name", ""),
        }

    def infer_on_axis(self, volume, axis_name: str, timer=None,
                      checkpoint_dir=None, checkpoint_every: int = 64,
                      resume: bool = False, progress: bool = False):
        """Slice-streamed inference with the forward matcher running in a
        thread, backward matching, filters, and optional panoptic fill.

        ``timer``: optional empanada_tpu.utils.StageTimer for per-stage
        wall-clock observability.  ``progress``: rate/ETA lines to stderr
        (the reference's tqdm equivalent).

        ``checkpoint_dir``: when set, the forward-matched RLE stack is
        persisted every ``checkpoint_every`` slices; with ``resume=True`` a
        rerun continues from the last checkpoint and produces a result
        bit-identical to an uninterrupted run (stitch/checkpoint.py).  The
        checkpoint is deleted once the axis completes."""
        import os

        from empanada_tpu.stitch import checkpoint as ckpt
        from empanada_tpu.utils import StageTimer

        timer = timer or StageTimer()
        axis = self.axes[axis_name]
        # a previous aborted run (crash mid-axis) leaves a dirty median
        # window; start clean regardless of how the last run ended
        self.engine.median.reset()

        loaded_stack = []
        fc = None
        if checkpoint_dir is not None:
            os.makedirs(checkpoint_dir, exist_ok=True)
            fc = ckpt.ForwardCheckpoint(
                checkpoint_dir, axis_name, self._checkpoint_meta(volume, axis_name)
            )
            if resume and fc.exists():
                loaded_stack = fc.load()
        start = len(loaded_stack)

        # re-prime the median window: feed from mid slices before the resume
        # point and drop their (already-checkpointed) outputs, so every kept
        # slice sees the same full window an uninterrupted run would have
        mid = (self.engine.median.ks - 1) // 2
        feed_from = max(0, start - mid)
        drop = start - feed_from
        dataset = VolumeDataset(
            volume, axis, self.preprocessor, scale=self.inference_scale,
            start=feed_from,
        )

        trackers = self.create_trackers(volume.shape, axis_name)
        matchers = create_matchers(
            self.thing_list, self.label_divisor, self.merge_iou_thr, self.merge_ioa_thr
        )
        ckpt.prime_matchers(matchers, loaded_stack)
        stack = self.create_panoptic_stack(axis_name, volume.shape)

        worker = MatcherWorker(matchers, self.labels, self.label_divisor,
                               self.thing_list,
                               force_connected=self.force_connected)
        from empanada_tpu.utils import Progress

        axis_total = volume.shape[axis]
        bar = Progress(total=axis_total, desc=f"axis {axis_name}",
                       enabled=progress)
        bar.n = start  # resumed slices count as done
        emitted = 0
        last_saved = 0

        def _put(pan_seg):
            nonlocal emitted, last_saved
            if pan_seg is None:
                return
            if emitted < drop:
                emitted += 1
                return
            emitted += 1
            worker.put(pan_seg)
            bar.update()
            if fc is not None:
                done = len(worker.rle_stack)  # append-only; prefix immutable
                if done - last_saved >= checkpoint_every:
                    fc.append(worker.rle_stack[last_saved:done])
                    last_saved = done

        with timer.stage("device_inference+forward_matching"):
            for batch in dataset:
                # enqueue the UNFETCHED device map: the matcher thread's
                # np.asarray overlaps this thread's next-slice dispatch
                # (queue maxsize bounds in-flight device buffers)
                pan_seg = self.engine.dispatch(
                    batch["image"], batch["size"], self.inference_scale
                )
                _put(pan_seg)
            for pan_seg in self.engine.end(self.inference_scale):
                _put(pan_seg)
            rle_stack = loaded_stack + worker.finish()
        bar.close()

        dropped = self.engine.dropped_centers()
        self.last_overflow = dropped  # inspectable by tests/benches
        if dropped:
            import sys

            print(
                f"warning: axis {axis_name}: up to {dropped} NMS centers per "
                f"slice exceeded max_centers={self.engine.max_centers} and "
                "were dropped (instances merged into nearest neighbors) — "
                "rerun with a larger max_centers",
                file=sys.stderr,
            )
        self.engine.reset_overflow()

        axis_len = volume.shape[axis]
        with timer.stage("backward_matching"):
            for index, rle_seg in backward_matching(rle_stack, matchers, axis_len):
                update_trackers(rle_seg, index, trackers)

        finish_tracking(trackers)
        for tracker in trackers:
            filters.remove_small_objects(tracker, min_size=self.min_size)
            filters.remove_pancakes(tracker, min_span=self.min_extent)

        if self.label_erosion > 0:
            for tracker in trackers:
                filters.erode(
                    tracker, volume.shape, self.labels, self.label_divisor,
                    self.thing_list, iterations=self.label_erosion,
                )
        if self.label_dilation > 0:
            for tracker in trackers:
                filters.dilate(
                    tracker, volume.shape, self.labels, self.label_divisor,
                    self.thing_list, iterations=self.label_dilation,
                )
        if self.fill_holes_in_segmentation:
            for tracker in trackers:
                filters.fill_holes_in_segmentation(
                    tracker, volume.shape, self.labels, self.label_divisor, self.thing_list
                )

        if stack is not None:
            with timer.stage("fill_volume"):
                fill_panoptic_volume(stack, trackers)

        if fc is not None:
            fc.remove()  # axis complete; partial state is stale now
        self.engine.median.reset()
        self.last_timing = timer.report()
        return stack, trackers

    def infer_orthoplane(self, volume, checkpoint_dir=None,
                         checkpoint_every: int = 64, resume: bool = False,
                         progress: bool = False):
        """xy/xz/yz sweeps; returns the combined tracker dict for consensus
        (the reference widget's _orthoplane_inference loop).

        With ``checkpoint_dir``, each completed axis persists its finished
        trackers (JSON) and in-progress axes checkpoint their forward
        stack, so ``resume=True`` skips completed axes entirely and
        continues a partial one mid-volume."""
        from empanada_tpu.stitch import checkpoint as ckpt

        trackers = {}
        for axis_name in self.axes:
            loaded = None
            if checkpoint_dir is not None:
                meta = self._checkpoint_meta(volume, axis_name)
                if resume:
                    loaded = ckpt.load_axis_trackers(
                        checkpoint_dir, axis_name, meta,
                        lambda: self.create_trackers(volume.shape, axis_name),
                    )
            if loaded is not None:
                trackers[axis_name] = loaded
                continue
            _, axis_trackers = self.infer_on_axis(
                volume, axis_name, checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every, resume=resume,
                progress=progress,
            )
            if checkpoint_dir is not None:
                ckpt.save_axis_trackers(
                    checkpoint_dir, axis_name, axis_trackers, meta
                )
            trackers[axis_name] = axis_trackers
        return trackers
