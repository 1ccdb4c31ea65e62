"""Batched, mesh-sharded 3D inference — the TPU-native replacement for the
reference's multi-GPU DDP engine (``empanada_napari/multigpu.py``).

Reference design: one process per GPU, NCCL all_gather of (sem, cells) per
slice, rank-0 CPU does median filtering + panoptic merge + RLE matching.

TPU design: slices are batched (B = chips x per-chip batch) through ONE jitted
forward step whose batch axis is sharded over the mesh — XLA moves data over
ICI, no process spawn, no explicit gather.  Median filtering over z and the
batched panoptic merge run as a second jitted step on sliding windows of the
(sharded) probability stack.  Only dense int32 panoptic maps cross back to the
host, where the RLE/matching thread (stitch.patterns.MatcherWorker) overlaps
with device compute.

Boundary semantics match the reference median queue: slices closer than
``mid = (ks-1)//2`` to either end of the stack pass through unmedianed
(engines.py:47-90 passthrough/drain behavior).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from empanada_tpu.core.chunked import create_chunked
from empanada_tpu.data.volume import VolumeDataset, factor_pad_numpy
from empanada_tpu.ops import postprocess as pp
from empanada_tpu.parallel.mesh import create_mesh, data_sharding, replicated
from empanada_tpu.stitch import filters
from empanada_tpu.stitch.patterns import (
    MatcherWorker,
    backward_matching,
    create_matchers,
    fill_panoptic_volume,
    finish_tracking,
    update_trackers,
)
from empanada_tpu.stitch.tracker import InstanceTracker
from empanada_tpu.api.utils import Preprocessor, load_model_from_config

__all__ = ["MultiChipEngine3d"]


class MultiChipEngine3d:
    """Mesh data-parallel 3D inference engine.

    Same calling surface as ``api.Engine3d`` (``infer_on_axis``,
    ``infer_orthoplane``) but slices are processed ``batch_size`` at a time
    with the batch axis sharded over a device mesh.
    """

    def __init__(
        self,
        model_config,
        inference_scale: int = 1,
        label_divisor: int = 1000,
        median_kernel_size: int = 3,
        stuff_area: int = 64,
        void_label: int = 0,
        nms_threshold: float = 0.1,
        nms_kernel: int = 3,
        confidence_thr: float = 0.3,
        semantic_only: bool = False,
        fine_boundaries: bool = False,
        min_size: int = 500,
        min_extent: int = 4,
        max_centers: int = 256,
        batch_size: Optional[int] = None,
        mesh=None,
        store_url=None,
        chunk_size=(256, 256, 256),
        save_panoptic: bool = False,
        compute_dtype=jnp.float32,
        transfer_compaction: bool = True,
        max_runs_per_row: Optional[int] = None,
        merge_iou_thr: float = 0.25,
        merge_ioa_thr: float = 0.25,
        force_connected: bool = True,
        model_and_variables=None,
        **kwargs,
    ):
        if model_and_variables is None:
            model, variables = load_model_from_config(model_config, dtype=compute_dtype)
        else:
            model, variables = model_and_variables

        self.model = model
        self.mesh = mesh if mesh is not None else create_mesh()
        n_dev = self.n_dev = self.mesh.devices.size
        # batch_size=None -> auto: scaled per axis so each dispatch carries
        # ~auto_batch_target_px pixels (small ortho slices batch wider; a
        # fixed batch starves the device on 64x256 slices — 8x less work
        # per step than a 512^2 sweep at the same batch)
        self.batch_size = batch_size
        if batch_size is not None:
            assert batch_size % n_dev == 0, "batch_size must divide the mesh"
        # 8 Mpx/dispatch: dispatch count (not device occupancy) dominates
        # small-slice sweeps — each dispatch pays a fixed host+RPC tax
        # (~120 ms over the dev tunnel; measured ortho attribution r3:
        # transfer 1.2 s across 13 dispatches at the old 2 Mpx target)
        self.auto_batch_target_px = int(kwargs.pop("auto_batch_target_px",
                                                   8 << 20))
        self.auto_batch_max = int(kwargs.pop("auto_batch_max", 256))
        # fetch+decode on a drainer thread (off the dispatch path) and
        # parallel per-slice rle_seg construction in the matcher
        self.drain_async = bool(kwargs.pop("drain_async", True))
        self.seg_build_workers = kwargs.pop("seg_build_workers", None)
        # whole-sweep fusion: when the volume is device-resident and the
        # outputs fit the budget, forward+postprocess for an ENTIRE axis run
        # as two lax.scan dispatches and results come back in one packed
        # fetch — dispatch/RPC count per sweep drops from O(n_batches) to
        # O(1), which dominates small-slice ortho sweeps on remote-attached
        # devices ("auto"; True forces where possible, False disables)
        self.sweep_fused = kwargs.pop("sweep_fused", "auto")
        self.sweep_fused_max_bytes = int(kwargs.pop("sweep_fused_max_bytes",
                                                    1 << 30))
        # volume residency: upload the uint volume to device memory ONCE and
        # slice/transpose/pad per axis inside the forward jit — ortho-plane
        # sweeps then never re-stream host slices (the reference re-reads the
        # volume per axis, empanada_napari/_volume_inference.py:336-348).
        # "auto": resident when the volume is an integer ndarray, scale==1,
        # and it fits resident_max_bytes per device.
        self.volume_resident = kwargs.pop("volume_resident", "auto")
        self.resident_max_bytes = int(kwargs.pop("resident_max_bytes",
                                                 256 << 20))
        self._vol_cache_key = None
        self._vol_cache_ref = None
        self._vol_cache_dev = None

        self.model_config = model_config
        self.labels = model_config["labels"]
        self.class_names = model_config["class_names"]
        self.label_divisor = int(label_divisor)
        self.padding_factor = model_config.get("padding_factor", 128)
        self.inference_scale = int(inference_scale)
        self.thing_list = () if semantic_only else tuple(model_config["thing_list"])
        self.stuff_area = int(stuff_area)
        self.void_label = int(void_label)
        self.nms_threshold = float(nms_threshold)
        self.nms_kernel = int(nms_kernel)
        self.confidence_thr = float(confidence_thr)
        self.coarse_boundaries = not fine_boundaries
        self.max_centers = int(max_centers)
        self.num_classes = int(model.num_classes) + 1
        assert median_kernel_size % 2 == 1
        self.ks = median_kernel_size
        self.mid = (median_kernel_size - 1) // 2
        self.min_size = min_size
        self.min_extent = min_extent
        # per-engine matcher thresholds (reference exposes these,
        # empanada_napari/inference.py:340-345)
        self.merge_iou_thr = float(merge_iou_thr)
        self.merge_ioa_thr = float(merge_ioa_thr)
        self.force_connected = bool(force_connected)
        self.compute_dtype = compute_dtype

        self.preprocessor = Preprocessor(**model_config["norms"])
        self.axes = {"xy": 0, "xz": 1, "yz": 2}

        self.store_url = store_url
        self.chunk_size = chunk_size
        self.save_panoptic = save_panoptic
        self.dtype = np.int32

        self.transfer_compaction = transfer_compaction
        self.max_runs_per_row = max_runs_per_row

        self._shard = data_sharding(self.mesh)
        self._repl = replicated(self.mesh)
        self.variables = jax.device_put(variables, self._repl)
        self._build_jits()

    # ------------------------------------------------------------------
    def _build_jits(self):
        model = self.model
        mean = float(self.preprocessor.mean)
        std = float(self.preprocessor.std)

        @partial(
            jax.jit,
            static_argnames=("render_steps", "normalize"),
            out_shardings=None,
        )
        def forward(variables, images, max_value, render_steps=2,
                    normalize=False):
            if normalize:
                # normalization on device so raw uint8 crosses the link
                # (4x less upload than f32; reference normalizes on host,
                # empanada_napari/utils.py:170)
                x = images.astype(self.compute_dtype)
                x = (x / max_value - mean) / std
            else:
                x = images.astype(self.compute_dtype)
            out = model.apply(
                variables, x, train=False,
                render_steps=render_steps,
                interpolate_ins=not self.coarse_boundaries,
            )
            # median-space contract (pp.to_median_space): binary models
            # carry raw logits (the odd-window median is a selection, which
            # commutes with the monotone sigmoid — no probability map in
            # HBM); multiclass models carry softmax probs (the per-channel
            # median does not commute through softmax)
            return (pp.to_median_space(out["sem_logits"]),
                    out["ctr_hmp"], out["offsets"])

        def _post_one(sem_med, ctr_hmp, offsets, upsampling):
            """sem_med (H, W, C); ctr (h, w, 1); off (h, w, 2) -> (H, W)."""
            cells, n_over = pp.get_instance_cells(
                ctr_hmp[None], offsets[None], self.coarse_boundaries, upsampling,
                self.nms_threshold, self.nms_kernel, self.max_centers,
                return_overflow=True, keep_coarse=True,
            )
            step = int(upsampling) * (4 if self.coarse_boundaries else 1)
            sem_h = pp.harden_median_space(sem_med[None], self.confidence_thr)
            # coarse-grid merge: exact, ~step^2x less one-hot HBM traffic
            pan = pp.merge_semantic_and_instance_coarse(
                sem_h, cells, self.label_divisor, self.thing_list, self.stuff_area,
                self.void_label, self.num_classes, self.max_centers, step=step,
            )
            return pan[0], n_over

        @partial(jax.jit, static_argnames=("upsampling", "crop", "max_runs"))
        def postprocess_batch(sem_ctx, ctr, off, win_idx, use_median,
                              upsampling=1, crop=None, max_runs=0):
            """Median over sliding windows gathered from a fixed-size rolling
            context of sem batches, then panoptic merge — all inside one jit
            so the host issues a single dispatch per batch (window gathers
            done eagerly cost one RPC each over remote-device links).

            ``sem_ctx``: tuple of 2K+1 sem batches (each (B, H, W, C))
            concatenated inside the jit; ``win_idx`` is ctx-local.

            With ``max_runs > 0`` the padded maps are cropped to ``crop``
            on device and run-length compacted (encode_runs_packed) so only
            a packed int16 buffer crosses the device->host link; the dense
            crop is also returned for the rare overflow fallback.
            """
            stack = jnp.concatenate(sem_ctx, axis=0)    # ((2K+1)*B, H, W, C)
            sem_windows = stack[win_idx]                # (B, ks, H, W, C)
            med = jnp.median(sem_windows, axis=1)
            raw = sem_windows[:, self.mid]
            sem = jnp.where(use_median[:, None, None, None], med, raw)
            pans, n_over = jax.vmap(
                lambda s, c, o: _post_one(s, c, o, upsampling)
            )(sem, ctr, off)
            n_over = n_over.max()
            if max_runs <= 0:
                return pans, None, n_over
            h, w = crop
            pans = pans[:, :h, :w]
            return pans, pp.encode_runs_packed(pans, max_runs), n_over

        @partial(jax.jit, static_argnames=("axis", "pad_axis", "pad_h", "pad_w"))
        def prep_volume(vol, axis, pad_axis, pad_h, pad_w):
            """Per-axis device prep of a resident volume: transpose so the
            sweep axis is leading, edge-pad the axis to a whole number of
            batches (tail batches then read copies of the last slice — the
            exact tail semantics of the streamed host path), and zero-pad
            H/W to the padding factor (factor_pad_numpy equivalent)."""
            v = jnp.moveaxis(vol, axis, 0)
            if pad_axis:
                v = jnp.pad(v, ((0, pad_axis), (0, 0), (0, 0)), mode="edge")
            if pad_h or pad_w:
                v = jnp.pad(v, ((0, 0), (0, pad_h), (0, pad_w)))
            return v

        @partial(jax.jit, static_argnames=("b", "render_steps"))
        def forward_sliced(variables, vol, start, max_value, b, render_steps):
            """Forward over a batch sliced straight out of the resident
            device volume — zero host->device traffic per batch.  The
            volume is replicated over the mesh; the sharding constraint
            re-lays the sliced batch out data-parallel so model compute
            shards exactly like the streamed path."""
            imgs = jax.lax.dynamic_slice_in_dim(vol, start, b, axis=0)
            imgs = imgs[..., None]
            imgs = jax.lax.with_sharding_constraint(imgs, self._shard)
            x = imgs.astype(self.compute_dtype)
            x = (x / max_value - mean) / std
            out = model.apply(
                variables, x, train=False,
                render_steps=render_steps,
                interpolate_ins=not self.coarse_boundaries,
            )
            return (pp.to_median_space(out["sem_logits"]),
                    out["ctr_hmp"], out["offsets"])

        @partial(jax.jit, static_argnames=("b", "render_steps", "n_batches"))
        def forward_all(variables, vol, max_value, b, render_steps,
                        n_batches):
            """Whole-sweep forward in ONE dispatch: lax.scan over the batch
            index, each step running forward_sliced's body on (b, H, W)
            sliced from the resident volume.  The stacked outputs stay in
            HBM (sem at bf16 + quarter-res ctr/off — tens of MB at ortho
            scale)."""

            def body(carry, start):
                sem, ctr, off = forward_sliced(
                    variables, vol, start, max_value, b=b,
                    render_steps=render_steps,
                )
                return carry, (sem, ctr, off)

            _, outs = jax.lax.scan(
                body, 0, jnp.arange(n_batches, dtype=jnp.int32) * b
            )
            return outs

        @partial(jax.jit, static_argnames=("b", "n_batches", "n_slices",
                                           "upsampling", "crop", "max_runs"))
        def post_all(sems, ctrs, offs, b=1, n_batches=1, n_slices=1,
                     upsampling=1, crop=None, max_runs=32):
            """Whole-sweep postprocess in ONE dispatch: median windows
            gather from the full sem stack by absolute slice index (same
            clip-at-edges + raw-edge-slice semantics as the streamed path),
            then the batched merge + packed run-length compaction.  Returns
            (packed (n_batches, b, h, 2R+1) int16, pans (n_batches, b, h, w)
            int32 for the rare run-overflow fallback, worst overflow)."""
            mid = self.mid
            flat = sems.reshape((n_batches * b,) + sems.shape[2:])
            h, w = crop

            def body(carry, j):
                idxs = j * b + jnp.arange(b, dtype=jnp.int32)
                win = jnp.clip(
                    idxs[:, None]
                    + jnp.arange(-mid, mid + 1, dtype=jnp.int32)[None, :],
                    0, n_slices - 1,
                )
                use_med = (idxs >= mid) & (idxs < n_slices - mid)
                sem_windows = flat[win]               # (b, ks, H, W, C)
                med = jnp.median(sem_windows, axis=1)
                raw = sem_windows[:, mid]
                sem = jnp.where(use_med[:, None, None, None], med, raw)
                pans, n_over = jax.vmap(
                    lambda s, c, o: _post_one(s, c, o, upsampling)
                )(sem, ctrs[j], offs[j])
                pans = pans[:, :h, :w]
                return jnp.maximum(carry, n_over.max()), (
                    pp.encode_runs_packed(pans, max_runs), pans)

            n_over, (packed, pans) = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(n_batches, dtype=jnp.int32)
            )
            return packed, pans, n_over

        self._forward = forward
        self._post_batch = postprocess_batch
        self._prep_volume = prep_volume
        self._forward_sliced = forward_sliced
        self._forward_all = forward_all
        self._post_all = post_all

    # ------------------------------------------------------------------
    def _max_runs(self, width: int) -> int:
        """Per-row run capacity for device compaction; 0 disables it.

        int16 packing requires pan ids < 65536 and column indices < 32768;
        otherwise fall back to dense int32 transfer."""
        if not self.transfer_compaction:
            return 0
        if self.num_classes * self.label_divisor > 65535 or width > 32767:
            return 0
        if self.max_runs_per_row is not None:
            return min(int(self.max_runs_per_row), int(width))
        # clamp to the row width: top_k(k) requires k <= axis size
        return min(max(32, width // 8), int(width))

    def _resolve_batch(self, volume_shape, axis: int) -> int:
        """Per-axis batch size: explicit if given, else scaled so one
        dispatch carries ~auto_batch_target_px model-input pixels (padded,
        after inference_scale downsampling), rounded to a mesh multiple and
        capped by the axis length and auto_batch_max."""
        if self.batch_size is not None:
            return self.batch_size
        dims = [s for i, s in enumerate(volume_shape) if i != axis]

        def pad_up(d):
            s = -(-d // self.inference_scale)   # ceil(d / scale)
            return s + (-s) % self.padding_factor

        area = max(1, pad_up(dims[0]) * pad_up(dims[1]))
        b = max(1, round(self.auto_batch_target_px / area))
        n_dev = self.n_dev
        b = max(n_dev, b // n_dev * n_dev)          # mesh multiple, >= n_dev
        n_slices = volume_shape[axis]
        b = min(b, max(n_dev, -(-n_slices // n_dev) * n_dev))
        b = min(b, max(n_dev, self.auto_batch_max // n_dev * n_dev))
        # snap down to the smallest b with the same dispatch count — the
        # tail batch is padded with copies, so a 244-batch over 256 slices
        # wastes 232 padded slices vs two even 128s
        n_batches = -(-n_slices // b)
        per = -(-n_slices // n_batches)
        return max(n_dev, -(-per // n_dev) * n_dev)

    def _resident_volume(self, volume):
        """Device handle for a resident volume, or None to stream from host.

        The raw (untransposed) volume is cached on the engine, so the three
        ortho-plane sweeps — and repeated calls on the same volume — pay for
        ONE host->device upload total."""
        if self.volume_resident is False or self.inference_scale != 1:
            return None
        if not isinstance(volume, np.ndarray) or not np.issubdtype(
                volume.dtype, np.integer):
            return None
        if self.volume_resident == "auto" \
                and volume.nbytes > self.resident_max_bytes:
            return None
        key = (id(volume), volume.shape, str(volume.dtype))
        if self._vol_cache_key != key:
            self._vol_cache_dev = jax.device_put(jnp.asarray(volume),
                                                 self._repl)
            self._vol_cache_key = key
            self._vol_cache_ref = volume  # keeps id() valid for the key
        return self._vol_cache_dev

    def _sweep_eligible(self, volume, axis: int,
                        pipelined: bool = False) -> bool:
        """Whether infer_on_axis may take the whole-sweep-fused path.

        ``pipelined`` is set by infer_orthoplane's all-axes mode, where
        cross-axis overlap (device computes axis i+1 while the host decodes
        axis i) pays for the fused path's within-axis serialization even at
        low dispatch counts.  A STANDALONE sweep with few batches keeps the
        streamed path instead: its drainer thread overlaps host decode with
        device compute, which measured faster than fusion at n_batches <= 2
        (64x512^2 xy: streamed 0.80 s vs fused 0.97 s) while fusion wins
        when the per-batch dispatch/RPC tax dominates (many small batches).
        """
        if self.sweep_fused is False:
            return False
        if jax.process_count() > 1:
            return False  # multi-host keeps the streamed/drained path
        if self._resident_volume(volume) is None:
            return False
        dims = [s for i, s in enumerate(volume.shape) if i != axis]
        if self._max_runs(dims[1]) <= 0:
            return False  # packed compaction is the point of the bulk fetch
        n_slices = volume.shape[axis]
        b = self._resolve_batch(volume.shape, axis)
        n_batches = -(-n_slices // b)
        if self.sweep_fused == "auto" and not pipelined and n_batches < 3:
            return False
        pad = lambda d: d + (-d) % self.padding_factor  # noqa: E731
        sem_bytes = n_batches * b * pad(dims[0]) * pad(dims[1]) * \
            (self.num_classes - 1) * 2
        pan_bytes = n_batches * b * dims[0] * dims[1] * 4
        if self.sweep_fused == "auto" and \
                sem_bytes + pan_bytes > self.sweep_fused_max_bytes:
            return False
        return True

    def _sweep_device(self, volume, axis_name: str, timer):
        """Dispatch one axis' ENTIRE sweep (forward scan + postprocess scan
        + packed compaction) and return unfetched device handles — two
        device calls total.  infer_orthoplane dispatches all three axes
        before fetching any, so the device computes axis i+1 while the host
        decodes axis i."""
        axis = self.axes[axis_name]
        n_slices = volume.shape[axis]
        b = self._resolve_batch(volume.shape, axis)
        n_batches = -(-n_slices // b)
        dims = [s for i, s in enumerate(volume.shape) if i != axis]
        vol_raw = self._resident_volume(volume)
        with timer.stage("upload"):
            vol_axis = self._prep_volume(
                vol_raw, axis=axis,
                pad_axis=n_batches * b - n_slices,
                pad_h=(-dims[0]) % self.padding_factor,
                pad_w=(-dims[1]) % self.padding_factor,
            )
        max_value = float(np.iinfo(volume.dtype).max)
        render_steps = int(2 + math.log2(self.inference_scale))
        with timer.stage("forward_dispatch"):
            sems, ctrs, offs = self._forward_all(
                self.variables, vol_axis, jnp.float32(max_value),
                b=b, render_steps=render_steps, n_batches=n_batches,
            )
        h, w = dims
        with timer.stage("post_dispatch"):
            packed, pans, n_over = self._post_all(
                sems, ctrs, offs, b=b, n_batches=n_batches,
                n_slices=n_slices, upsampling=self.inference_scale,
                crop=(h, w), max_runs=self._max_runs(w),
            )
        try:
            # start the device->host copy so it overlaps any queued device
            # work (the next axis' sweep) instead of blocking at fetch time
            packed.copy_to_host_async()
        except AttributeError:
            pass
        return {"axis_name": axis_name, "b": b, "n_batches": n_batches,
                "n_slices": n_slices, "w": w, "packed": packed,
                "pans": pans, "n_over": n_over}

    def _sweep_host(self, volume, handles, timer, progress: bool = False):
        """Fetch + decode + match + track one dispatched sweep.

        Decode and matching run SYNCHRONOUSLY on the calling thread: by the
        time a fused sweep is fetched, all of its device work is done (and
        in the pipelined ortho mode, the next axis' compute needs no host
        CPU), so the streamed path's MatcherWorker thread would only add
        queue/context-switch overhead (~0.15 s per ortho pass on a 1-core
        host, measured)."""
        from empanada_tpu.stitch.patterns import (apply_matchers_flat,
                                                  build_flat_seg)
        from empanada_tpu.utils import Progress

        axis_name = handles["axis_name"]
        n_slices, b, w = handles["n_slices"], handles["b"], handles["w"]
        self.last_batch_size = b
        trackers = [
            InstanceTracker(label, self.label_divisor, volume.shape, axis_name)
            for label in self.labels
        ]
        matchers = create_matchers(
            self.thing_list, self.label_divisor, self.merge_iou_thr,
            self.merge_ioa_thr,
        )
        bar = Progress(total=n_slices, desc=f"axis {axis_name}",
                       enabled=progress)
        with timer.stage("fetch"):
            packed_np = np.asarray(handles["packed"])
        rcap = (packed_np.shape[-1] - 1) // 2
        rows = packed_np.reshape(-1, *packed_np.shape[2:])[:n_slices]
        self.last_overflow = int(handles["n_over"])
        if self.last_overflow:
            import sys

            print(
                f"warning: axis {axis_name}: up to {self.last_overflow} NMS "
                f"centers per slice exceeded max_centers={self.max_centers} "
                "and were dropped (instances merged into nearest neighbors) "
                "— rerun with a larger max_centers",
                file=sys.stderr,
            )

        # fastest path: the ENTIRE sweep's seg build + forward matching +
        # backward matching in one native call per class (csrc match_sweep;
        # byte-identical to the Python loops below, fuzz-gated) — the
        # per-slice Python/numpy glue is the dominant host cost on this
        # path.  Falls back on packed/CC overflow or a missing native lib.
        if not (rows[..., -1] > rcap).any():
            from empanada_tpu.core import native

            per_class = {}
            for label in self.labels:
                fc = self.force_connected and label in self.thing_list
                min_id = label * self.label_divisor
                with timer.stage("host_decode+enqueue"):
                    res = native.match_sweep(
                        rows, w, min_id, min_id + self.label_divisor, fc,
                        self.merge_iou_thr, self.merge_ioa_thr,
                        min_id + 1,
                    )
                if not isinstance(res, list):
                    per_class = None
                    break
                per_class[label] = res
            if per_class is not None:
                from empanada_tpu.core.labeling import FlatInstances

                bar.n = n_slices
                bar.close()
                # same reverse order as the backward_matching generator so
                # tracker insertion order is identical
                with timer.stage("backward_matching"):
                    for idx in range(n_slices - 1, -1, -1):
                        for tracker in trackers:
                            tracker.update(
                                FlatInstances(*per_class[tracker.class_id][idx]),
                                idx,
                            )
                return self._finalize_trackers(trackers, volume, axis_name,
                                               timer)

        pans_np = None
        rle_stack = []
        with timer.stage("host_decode+enqueue"):
            for s in range(n_slices):
                row_buf = packed_np[s // b, s % b]
                if int(row_buf[..., -1].max()) > rcap:
                    # run-capacity overflow: fall back to the dense map for
                    # this slice only (one indexed fetch; rare by sizing)
                    if pans_np is None:
                        pans_np = np.asarray(handles["pans"])
                    item = pans_np[s // b, s % b].astype(np.int64)
                else:
                    item = ("packed", row_buf, w)
                rle_seg = build_flat_seg(
                    item, self.labels, self.label_divisor, self.thing_list,
                    self.force_connected,
                )
                rle_stack.append(apply_matchers_flat(rle_seg, matchers))
                bar.update()
        bar.close()
        return self._finish_axis(rle_stack, matchers, trackers, volume,
                                 axis_name, timer)

    def _batches(self, dataset: VolumeDataset, b: int):
        """Yield (indices, images (B, H, W, 1) padded+stacked, size)."""
        n = len(dataset)
        batch_imgs, batch_idx, size = [], [], None
        for item in dataset:
            img = item["image"]
            if img.ndim == 3:
                img = img[0]  # (H, W), host-normalized
            size = item["size"]
            img = factor_pad_numpy(img, self.padding_factor)
            batch_imgs.append(img)
            batch_idx.append(item["index"])
            if len(batch_imgs) == b:
                yield batch_idx, np.stack(batch_imgs)[..., None], size
                batch_imgs, batch_idx = [], []
        if batch_imgs:
            # pad the tail with copies of the last slice
            while len(batch_imgs) < b:
                batch_imgs.append(batch_imgs[-1])
                batch_idx.append(-1)
            yield batch_idx, np.stack(batch_imgs)[..., None], size

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
            "median_kernel_size": 2 * self.mid + 1,
            "force_connected": self.force_connected,
            "merge_iou_thr": self.merge_iou_thr,
            "merge_ioa_thr": self.merge_ioa_thr,
            "batch_size": self.batch_size,
            # auto-batch runs record the RESOLVED per-axis batch (plus the
            # knobs it came from), so a resume on a different mesh or with
            # different auto-batch settings is detected as a config
            # mismatch instead of silently replaying other batch boundaries
            "resolved_batch": self._resolve_batch(
                volume.shape, self.axes[axis_name]),
            "n_dev": self.n_dev,
            "auto_batch_target_px": self.auto_batch_target_px,
            "auto_batch_max": self.auto_batch_max,
            "model_name": self.model_config.get("model_name", ""),
        }

    def infer_on_axis(self, volume, axis_name: str, timer=None,
                      checkpoint_dir=None, checkpoint_every: int = 64,
                      resume: bool = False, progress: bool = False):
        """``timer``: optional empanada_tpu.utils.StageTimer — same
        observability surface as Engine3d (last_timing after each call).

        ``checkpoint_dir``/``checkpoint_every``/``resume``: crash-safe
        forward-state persistence, same contract as Engine3d.infer_on_axis
        (stitch/checkpoint.py); a resumed run recomputes from the last
        whole batch boundary and is bit-identical to an uninterrupted one
        (the in-jit median windows index absolute slice positions, so edge
        semantics don't shift)."""
        import os

        from empanada_tpu.stitch import checkpoint as ckpt
        from empanada_tpu.utils import StageTimer

        timer = timer or StageTimer()
        axis = self.axes[axis_name]
        n_slices = volume.shape[axis]
        render_steps = int(2 + math.log2(self.inference_scale))

        loaded_stack = []
        fc = None
        if checkpoint_dir is not None:
            os.makedirs(checkpoint_dir, exist_ok=True)
            fc = ckpt.ForwardCheckpoint(
                checkpoint_dir, axis_name, self._checkpoint_meta(volume, axis_name)
            )
            if resume and fc.exists():
                loaded_stack = fc.load()
        z_done = len(loaded_stack)

        # whole-sweep fusion: without checkpointing, a resident volume's
        # entire axis runs as two scan dispatches + one bulk packed fetch
        # (see _sweep_device) — the per-batch dispatch/RPC tax vanishes
        if fc is None and not loaded_stack and self._sweep_eligible(volume, axis):
            handles = self._sweep_device(volume, axis_name, timer)
            return self._sweep_host(volume, handles, timer, progress=progress)

        # auto batch (batch_size=None) resolves deterministically from the
        # volume shape, so checkpoint resume (meta records batch_size=None +
        # volume_shape) replays the same batch boundaries
        b = self._resolve_batch(volume.shape, axis)
        self.last_batch_size = b
        mid = self.mid
        # context batches needed on each side of the current batch so every
        # window [i-mid, i+mid] is covered
        K = -(-mid // b)
        # resume recomputes from the last whole batch boundary; the batch
        # generator starts K context batches earlier so sliding windows for
        # kept slices see exactly the sem context an uninterrupted run had
        j0 = z_done // b
        feed_batch = max(0, j0 - K)
        drop = z_done - j0 * b

        n_batches = -(-n_slices // b)

        # resident mode: the whole volume lives in device memory (uploaded
        # once, cached across axes); per-batch slicing/transpose/pad happen
        # inside the forward jit and NOTHING crosses host->device per batch
        vol_axis_dev = None
        vol_raw_dev = self._resident_volume(volume)
        if vol_raw_dev is not None:
            dims = [s for i, s in enumerate(volume.shape) if i != axis]
            with timer.stage("upload"):
                vol_axis_dev = self._prep_volume(
                    vol_raw_dev, axis=axis,
                    pad_axis=n_batches * b - n_slices,
                    pad_h=(-dims[0]) % self.padding_factor,
                    pad_w=(-dims[1]) % self.padding_factor,
                )
            max_value = float(np.iinfo(volume.dtype).max)
            dataset = None
            res_size = (dims[0], dims[1])
        # integer volumes: ship raw slices and normalize on device (4x less
        # upload); float inputs are rejected like the reference Preprocessor
        elif np.issubdtype(np.dtype(volume.dtype), np.integer):
            max_value = float(np.iinfo(volume.dtype).max)
            dataset = VolumeDataset(volume, axis, None, scale=self.inference_scale,
                                    start=feed_batch * b)
        else:
            max_value = 1.0
            dataset = VolumeDataset(
                volume, axis, self.preprocessor, scale=self.inference_scale,
                start=feed_batch * b,
            )
        dev_norm = dataset is None or np.issubdtype(
            np.dtype(volume.dtype), np.integer)

        trackers = [
            InstanceTracker(label, self.label_divisor, volume.shape, axis_name)
            for label in self.labels
        ]
        matchers = create_matchers(
            self.thing_list, self.label_divisor, self.merge_iou_thr, self.merge_ioa_thr
        )
        ckpt.prime_matchers(matchers, loaded_stack)
        worker = MatcherWorker(matchers, self.labels, self.label_divisor,
                               self.thing_list,
                               force_connected=self.force_connected,
                               build_workers=self.seg_build_workers)
        from empanada_tpu.utils import Progress

        bar = Progress(total=n_slices, desc=f"axis {axis_name}",
                       enabled=progress)
        bar.n = z_done  # resumed slices count as done
        emitted = 0
        last_saved = 0

        def put(item):
            """Feed the matcher, skipping already-checkpointed slices and
            persisting the forward state periodically."""
            nonlocal emitted, last_saved
            if emitted < drop:
                emitted += 1
                return
            emitted += 1
            worker.put(item)
            bar.update()
            if fc is not None:
                done = len(worker.rle_stack)  # append-only; prefix immutable
                if done - last_saved >= checkpoint_every:
                    fc.append(worker.rle_stack[last_saved:done])
                    last_saved = done

        # Streamed forward + postprocess: only a median-kernel-deep rolling
        # window of sem batches (plus the current batch's ctr/off) is device-
        # resident — memory is O(batch + kernel), not O(volume).  The
        # reference streams one slice at a time through its DataLoader
        # (empanada_napari/inference.py:526-543); this is the batched analog.
        # (Resident mode instead slices batches out of the device volume —
        # O(volume) device memory by design, zero per-batch upload.)
        batch_gen = self._batches(dataset, b) if dataset is not None else None
        sem_buf: dict = {}    # batch index -> device sem (B, H, W, C)
        io_buf: dict = {}     # batch index -> (ctr, off)
        fwd_done = feed_batch - 1
        size = res_size if vol_axis_dev is not None else None
        self._max_resident = 0  # observability: peak sem batches resident

        def ensure_forwarded(upto: int):
            nonlocal fwd_done, size
            # stages split so a sync-mode StageTimer pass attributes the
            # pipeline cleanly: host_prep (pure host), upload (host->device
            # transfer), forward_dispatch (device forward compute when
            # synced; ~0 under normal async operation)
            while fwd_done < min(upto, n_batches - 1):
                if vol_axis_dev is not None:
                    with timer.stage("forward_dispatch"):
                        sem, ctr, off = self._forward_sliced(
                            self.variables, vol_axis_dev,
                            jnp.int32((fwd_done + 1) * b),
                            jnp.float32(max_value),
                            b=b, render_steps=render_steps,
                        )
                else:
                    with timer.stage("host_prep"):
                        _, images, size = next(batch_gen)
                        if not dev_norm:
                            images = images.astype(np.float32)
                    with timer.stage("upload"):
                        images = jax.device_put(jnp.asarray(images), self._shard)
                    with timer.stage("forward_dispatch"):
                        sem, ctr, off = self._forward(
                            self.variables, images, jnp.float32(max_value),
                            render_steps=render_steps, normalize=dev_norm,
                        )
                fwd_done += 1
                sem_buf[fwd_done] = sem
                if fwd_done >= j0:
                    # resume context batches (< j0) only feed sem windows;
                    # retaining their ctr/off would pin full-resolution
                    # device buffers for the rest of the axis
                    io_buf[fwd_done] = (ctr, off)

        def drain(pending):
            """Fetch + decode one completed postprocess batch into the
            matcher worker.  Called one iteration late so the (remote)
            device computes batch j+1 while batch j's packed buffer is in
            flight."""
            pans_dev, packed, n_keep, (h, w) = pending
            if packed is not None:
                # one small packed fetch per batch; dense (already cropped
                # in-jit) only on overflow
                with timer.stage("fetch"):
                    packed_np = np.asarray(packed)[:n_keep]
                pans_np = None
                with timer.stage("host_decode+enqueue"):
                    # per-slice run-capacity screen (counts column); the
                    # raw packed rows go straight to the seg-build pool,
                    # which decodes+builds in one GIL-released native call
                    rcap = (packed_np.shape[-1] - 1) // 2
                    over = packed_np[..., -1].max(axis=-1) > rcap
                    for bi, row_buf in enumerate(packed_np):
                        if over[bi]:
                            if pans_np is None:
                                pans_np = np.asarray(pans_dev)[:n_keep]
                            put(pans_np[bi].astype(np.int64))
                        else:
                            put(("packed", row_buf, w))
            else:
                with timer.stage("fetch"):
                    pans = np.asarray(pans_dev)[:n_keep, :h, :w]
                with timer.stage("host_decode+enqueue"):
                    for pan in pans:
                        put(pan.astype(np.int64))

        # Drainer thread: fetch + decode + enqueue run OFF the dispatch
        # path, so the main loop only issues device work and the blocking
        # np.asarray waits (post compute + packed transfer over the link)
        # overlap both device compute and the matcher.  Bounded queue:
        # each pending item pins a dense device map batch, so depth 2
        # keeps device residency O(batch) as before.
        import queue as queue_mod
        import threading

        drain_q: queue_mod.Queue = queue_mod.Queue(maxsize=2)
        drain_err = []

        def _drain_loop():
            try:
                while True:
                    item = drain_q.get()
                    if item is None:
                        return
                    drain(item)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                drain_err.append(exc)
                # keep consuming so the producer's bounded put never blocks
                while drain_q.get() is not None:
                    pass

        drainer = None
        if self.drain_async:
            drainer = threading.Thread(target=_drain_loop, daemon=True)
            drainer.start()
        pending = None  # sync-drain mode: one-batch-late inline drain

        overflow_dev = None
        max_runs = None  # resolved once size is known (first forward)
        t_stream = timer.stage("device_stream+forward_matching")
        t_stream.__enter__()
        for j in range(j0, n_batches):
            ensure_forwarded(j + K)
            base = j - K
            ctx = tuple(
                sem_buf[min(max(base + i, 0), n_batches - 1)]
                for i in range(2 * K + 1)
            )

            start, stop = j * b, min((j + 1) * b, n_slices)
            idxs = np.arange(start, stop)
            # sliding windows with edge clamping; edge slices use raw sem
            win_idx = np.clip(
                idxs[:, None] + np.arange(-mid, mid + 1)[None, :], 0, n_slices - 1
            )
            use_median = (idxs >= mid) & (idxs < n_slices - mid)
            if stop - start < b:
                pad = b - (stop - start)
                win_idx = np.concatenate([win_idx, np.repeat(win_idx[-1:], pad, 0)])
                use_median = np.concatenate([use_median, np.zeros(pad, bool)])
            # global slice index -> position in the concatenated ctx: batch
            # (g // b) sits at ctx slot (g // b - base); tail padding of the
            # last forward batch holds copies of the last slice, so clamped
            # indices resolve correctly
            win_local = (win_idx // b - base) * b + win_idx % b

            ctr, off = io_buf.pop(j)
            h, w = size
            if max_runs is None:
                max_runs = self._max_runs(w)
            with timer.stage("post_dispatch"):
                pans_dev, packed, n_over = self._post_batch(
                    ctx, ctr, off,
                    jnp.asarray(win_local), jnp.asarray(use_median),
                    upsampling=self.inference_scale,
                    crop=(h, w), max_runs=max_runs,
                )
            # device-side max accumulation (no fetch on the dispatch path)
            overflow_dev = (
                n_over if overflow_dev is None
                else jnp.maximum(overflow_dev, n_over)
            )
            # start the device->host copy now so it overlaps the NEXT
            # batch's compute (np.asarray at drain time then finds the
            # bytes already host-side — saves one blocking RPC per batch
            # over remote links)
            fetch = packed if packed is not None else pans_dev
            try:
                fetch.copy_to_host_async()
            except AttributeError:
                pass
            if drainer is not None:
                if drain_err:
                    break
                drain_q.put((pans_dev, packed, stop - start, (h, w)))
            else:
                if pending is not None:
                    drain(pending)
                pending = (pans_dev, packed, stop - start, (h, w))

            self._max_resident = max(self._max_resident, len(sem_buf))
            # drop sem batches that no future window can reach
            for k in list(sem_buf):
                if k < j + 1 - K:
                    del sem_buf[k]

        if drainer is not None:
            drain_q.put(None)
            drainer.join()
            if drain_err:
                # surface the ORIGINAL exception (checkpoint/crash-resume
                # flows and callers match on it), traceback preserved
                raise drain_err[0]
        elif pending is not None:
            drain(pending)
        rle_stack = loaded_stack + worker.finish()
        timer.add("matcher_busy", worker.stats["busy_s"])
        bar.close()
        # max NMS centers dropped on any slice (0 = overflow-free run) —
        # benches and callers can fail/flag on this instead of scraping stderr
        self.last_overflow = int(overflow_dev) if overflow_dev is not None else 0
        if self.last_overflow:
            import sys

            print(
                f"warning: axis {axis_name}: up to {self.last_overflow} NMS "
                f"centers per slice exceeded max_centers={self.max_centers} "
                "and were dropped (instances merged into nearest neighbors) "
                "— rerun with a larger max_centers",
                file=sys.stderr,
            )
        t_stream.__exit__(None, None, None)

        # phase C: backward matching + tracking + filters (host)
        stack, trackers = self._finish_axis(rle_stack, matchers, trackers,
                                            volume, axis_name, timer)
        if fc is not None:
            fc.remove()  # axis complete; partial state is stale now
        return stack, trackers

    def _finish_axis(self, rle_stack, matchers, trackers, volume,
                     axis_name: str, timer):
        """Backward matching + tracking + filters + optional volume fill —
        the shared host tail of the streamed and sweep-fused paths."""
        n_slices = volume.shape[self.axes[axis_name]]
        with timer.stage("backward_matching"):
            for index, rle_seg in backward_matching(rle_stack, matchers, n_slices):
                update_trackers(rle_seg, index, trackers)
        return self._finalize_trackers(trackers, volume, axis_name, timer)

    def _finalize_trackers(self, trackers, volume, axis_name: str, timer):
        """Finish + filter trackers and optionally fill the output volume —
        the tail shared by the Python backward pass and the native
        match_sweep path (which arrives with trackers already updated)."""
        finish_tracking(trackers)
        for tracker in trackers:
            filters.remove_small_objects(tracker, min_size=self.min_size)
            filters.remove_pancakes(tracker, min_span=self.min_extent)

        stack = None
        if self.save_panoptic:
            if self.store_url is not None:
                stack = create_chunked(
                    f"{self.store_url.rstrip('/')}/panoptic_{axis_name}",
                    volume.shape, self.chunk_size, self.dtype,
                )
            else:
                stack = np.zeros(volume.shape, dtype=self.dtype)
            with timer.stage("fill_volume"):
                fill_panoptic_volume(stack, trackers)
        self.last_timing = timer.report()
        return stack, trackers

    def infer_orthoplane(self, volume, checkpoint_dir=None,
                         checkpoint_every: int = 64, resume: bool = False,
                         progress: bool = False, timer=None):
        """Same per-axis resume contract as Engine3d.infer_orthoplane:
        completed axes persist finished trackers and are skipped on
        resume; a partial axis continues from its forward checkpoint.
        ``timer`` (optional StageTimer) accumulates stages across all three
        sweeps; ``last_overflow`` reports the max across axes."""
        import os

        from empanada_tpu.stitch import checkpoint as ckpt

        def make_trackers(axis_name):
            return [
                InstanceTracker(label, self.label_divisor, volume.shape,
                                axis_name)
                for label in self.labels
            ]

        trackers = {}
        max_overflow = 0

        # pipelined sweep fusion: with no checkpointing and every axis
        # sweep-eligible, dispatch ALL THREE axes' device chains first (the
        # device queues them back-to-back), then fetch+decode per axis — the
        # host processes axis i while the device computes axis i+1.  The
        # reference re-infers serially per axis with zero overlap
        # (empanada_napari/_volume_inference.py:336-348).
        if checkpoint_dir is None:
            if all(self._sweep_eligible(volume, self.axes[ax],
                                        pipelined=True)
                   for ax in self.axes):
                from empanada_tpu.utils import StageTimer

                timer = timer or StageTimer()
                handles = [self._sweep_device(volume, ax, timer)
                           for ax in self.axes]
                for h in handles:
                    trackers[h["axis_name"]] = self._sweep_host(
                        volume, h, timer, progress=progress)[1]
                    max_overflow = max(max_overflow, self.last_overflow)
                self.last_overflow = max_overflow
                return trackers

        for axis_name in self.axes:
            loaded = None
            if checkpoint_dir is not None:
                meta = self._checkpoint_meta(volume, axis_name)
                if resume:
                    loaded = ckpt.load_axis_trackers(
                        checkpoint_dir, axis_name, meta,
                        lambda: make_trackers(axis_name),
                    )
            if loaded is not None:
                trackers[axis_name] = loaded
                continue
            _, axis_trackers = self.infer_on_axis(
                volume, axis_name, checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every, resume=resume,
                progress=progress, timer=timer,
            )
            max_overflow = max(max_overflow, self.last_overflow)
            if checkpoint_dir is not None:
                ckpt.save_axis_trackers(
                    checkpoint_dir, axis_name, axis_trackers, meta
                )
            trackers[axis_name] = axis_trackers
        self.last_overflow = max_overflow
        return trackers
