"""Inference engines (reference ``empanada/inference/engines.py``).

Each engine wraps a flax model + params and exposes the reference's calling
contract: ``engine(image, size, upsampling)`` returns a dense panoptic map
(or ``None`` while the 3D median queue fills).  Design changes for TPU:

- the model forward, probability medians, center NMS, pixel grouping and
  semantic/instance merging each run as jitted XLA graphs with static shapes;
  host code only shuttles slices and maintains the rolling z-window;
- the median queue stores *device* arrays: enqueue is async (JAX dispatch
  returns immediately), so the host RLE/matching thread overlaps with device
  compute without the reference's ``mp.Queue`` process machinery;
- images are padded to ``padding_factor`` (>=128 keeps the lane dimension of
  every conv MXU-aligned).
"""

from __future__ import annotations

import math
from collections import deque
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from empanada_tpu.ops import postprocess as pp


@partial(jax.jit, static_argnames=("hw",))
def _resize_logits(logits, hw):
    """Bilinear logits upsample to a target (H, W) — the reference's
    F.interpolate(..., align_corners=True) for non-PointRend models at
    upsampling > 1."""
    from empanada_tpu.ops.interpolate import bilinear_resize

    return bilinear_resize(logits, hw, align_corners=True)

__all__ = [
    "MedianQueue",
    "PanopticDeepLabEngine",
    "PanopticDeepLabEngine3d",
    "PanopticDeepLabRenderEngine",
    "PanopticDeepLabRenderEngine3d",
    "BCEngine",
    "BCEngine3d",
]


class MedianQueue:
    """Rolling window over consecutive z-slice outputs returning the middle
    element with the median of probabilities (engines.py:47-90).

    Semantics: passthrough of the newest item while the queue has <= mid
    elements, None while filling beyond that, median once full; ``end()``
    drains items past the middle.
    """

    def __init__(self, median_kernel_size: int):
        assert median_kernel_size % 2 == 1, "Kernel size must be odd integer!"
        self.ks = median_kernel_size
        self.mid_idx = (median_kernel_size - 1) // 2
        self.queue = deque(maxlen=median_kernel_size)
        self._median = jax.jit(lambda stack: jnp.median(stack, axis=0))

    def reset(self):
        self.queue.clear()

    def enqueue(self, item: dict):
        self.queue.append(item)

    def get_next(self, keys: Sequence[str]) -> Optional[dict]:
        nq = len(self.queue)
        if nq <= self.mid_idx:
            return self.queue[-1]
        if nq < self.ks:
            return None
        # DELIBERATE DIVERGENCE (PARITY.md "Known divergences"): the
        # reference mutates the middle item IN its deque
        # (engines.py:79-82 `output[key] = self.get_median(key)`), so its
        # later windows median over already-medianed slices — an
        # accidental recursive/IIR filter.  Reproducing that would thread
        # a sequential dependency through the batched multi-chip median
        # and through checkpoint resume (the cascade reaches back to
        # slice 0), so every window here medians RAW slice outputs.
        out = dict(self.queue[self.mid_idx])
        for key in keys:
            stack = jnp.stack([item[key] for item in self.queue], axis=0)
            out[key] = self._median(stack)
        return out

    def end(self):
        """Drain the tail AND clear the queue: a reused engine's next run
        must start from passthrough/fill semantics, not a stale window."""
        tail = list(self.queue)[self.mid_idx + 1:]
        self.queue.clear()
        return tail


class _EngineBase:
    """Holds the model + params and the jit caches."""

    def __init__(self, model, variables, input_dtype=jnp.float32):
        self.model = model
        self.variables = variables
        self.input_dtype = input_dtype

        @partial(jax.jit, static_argnames=("render_steps", "interpolate_ins"))
        def _forward(variables, image, render_steps=2, interpolate_ins=True):
            out = self.model.apply(
                variables, image, train=False,
                render_steps=render_steps, interpolate_ins=interpolate_ins,
            )
            return out

        self._forward = _forward

    def _to_device_image(self, image: np.ndarray) -> jnp.ndarray:
        """(H, W) or (1, H, W) numpy -> (1, H, W, 1) device array."""
        image = np.asarray(image)
        if image.ndim == 2:
            image = image[None]
        assert image.ndim == 3 and image.shape[0] == 1
        return jnp.asarray(image[..., None], dtype=self.input_dtype)


class PanopticDeepLabEngine(_EngineBase):
    """Single-slice engine over a plain (non-render) model
    (engines.py:92-159)."""

    def __init__(
        self,
        model,
        variables,
        thing_list: Sequence[int],
        label_divisor: int = 1000,
        stuff_area: int = 64,
        void_label: int = 0,
        nms_threshold: float = 0.1,
        nms_kernel: int = 7,
        confidence_thr: float = 0.5,
        max_centers: int = 256,
        input_dtype=jnp.float32,
        **kwargs,
    ):
        super().__init__(model, variables, input_dtype)
        self.thing_list = tuple(int(t) for t in thing_list)
        self.label_divisor = int(label_divisor)
        self.stuff_area = int(stuff_area)
        self.void_label = int(void_label)
        self.nms_threshold = float(nms_threshold)
        self.nms_kernel = int(nms_kernel)
        self.confidence_thr = float(confidence_thr)
        self.max_centers = int(max_centers)
        self.num_classes = int(model.num_classes) + 1  # class ids are 1-based

        @jax.jit
        def _post(sem_prob, ctr_hmp, offsets):
            sem = pp.harden_seg(sem_prob, self.confidence_thr)
            return pp.get_panoptic_segmentation(
                sem, ctr_hmp, offsets, self.thing_list, self.label_divisor,
                self.stuff_area, self.void_label, self.nms_threshold,
                self.nms_kernel, self.num_classes, self.max_centers,
            )

        self._post = _post

    def infer(self, image: np.ndarray) -> dict:
        x = self._to_device_image(image)
        out = self._forward(self.variables, x)
        out["sem"] = pp.logits_to_prob(out["sem_logits"])
        return out

    def postprocess(self, out: dict) -> jnp.ndarray:
        return self._post(out["sem"], out["ctr_hmp"], out["offsets"])

    def __call__(self, image: np.ndarray) -> np.ndarray:
        out = self.infer(image)
        pan = self.postprocess(out)
        return np.asarray(pan[0])


class PanopticDeepLabEngine3d(PanopticDeepLabEngine):
    """Adds the median queue over z (engines.py:161-221)."""

    def __init__(self, *args, median_kernel_size: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.median = MedianQueue(median_kernel_size)

    def __call__(self, image: np.ndarray) -> Optional[np.ndarray]:
        out = self.infer(image)
        self.median.enqueue(out)
        median_out = self.median.get_next(keys=["sem"])
        if median_out is None:
            return None
        pan = self.postprocess(median_out)
        return np.asarray(pan[0])

    def end(self):
        return [np.asarray(self.postprocess(o)[0]) for o in self.median.end()]


class PanopticDeepLabRenderEngine(_EngineBase):
    """PointRend-aware engine — the one the plugin runtime uses
    (engines.py:223-325).  ``__call__(image, size, upsampling)``."""

    def __init__(
        self,
        model,
        variables,
        thing_list: Sequence[int],
        label_divisor: int = 1000,
        stuff_area: int = 64,
        void_label: int = 0,
        nms_threshold: float = 0.1,
        nms_kernel: int = 7,
        confidence_thr: float = 0.5,
        padding_factor: int = 16,
        coarse_boundaries: bool = True,
        max_centers: int = 256,
        shape_buckets: bool = False,
        input_dtype=jnp.float32,
        **kwargs,
    ):
        super().__init__(model, variables, input_dtype)
        self.thing_list = tuple(int(t) for t in thing_list)
        self.label_divisor = int(label_divisor)
        self.stuff_area = int(stuff_area)
        self.void_label = int(void_label)
        self.nms_threshold = float(nms_threshold)
        self.nms_kernel = int(nms_kernel)
        self.confidence_thr = float(confidence_thr)
        self.padding_factor = int(padding_factor)
        self.coarse_boundaries = bool(coarse_boundaries)
        self.max_centers = int(max_centers)
        self.shape_buckets = bool(shape_buckets)
        self.num_classes = int(model.num_classes) + 1

        self._build_jits()

    def update_params(self, **params):
        """Update thresholds without rebuilding the model (the reference
        widget's live-update path, empanada_napari/inference.py:226)."""
        for k, v in params.items():
            if hasattr(self, k):
                setattr(self, k, type(getattr(self, k))(v))
        self._build_jits()

    def _build_jits(self):
        self._overflow_dev = None

        @partial(jax.jit, static_argnames=("upsampling",))
        def _cells(ctr_hmp, offsets, upsampling=1):
            return pp.get_instance_cells(
                ctr_hmp, offsets, self.coarse_boundaries, upsampling,
                self.nms_threshold, self.nms_kernel, self.max_centers,
                return_overflow=True,
            )

        @jax.jit
        def _merge(sem_med, cells):
            sem = pp.harden_median_space(sem_med, self.confidence_thr)
            ins = jnp.where(pp._thing_mask(sem, self.thing_list), cells, 0)
            return pp.merge_semantic_and_instance(
                sem, ins, self.label_divisor, self.thing_list, self.stuff_area,
                self.void_label, self.num_classes, self.max_centers,
            )

        @partial(jax.jit, static_argnames=("upsampling",))
        def _post(sem_med, ctr_hmp, offsets, upsampling=1):
            """Fused cells+merge in ONE dispatch, with the instance one-hot
            contractions on the coarse grouping grid (exact — see
            merge_semantic_and_instance_coarse); the full-res instance map
            is never materialized, and hardening happens in logit space so
            no probability map is either.  Returns (pan, n_over)."""
            cells, n_over = pp.get_instance_cells(
                ctr_hmp, offsets, self.coarse_boundaries, upsampling,
                self.nms_threshold, self.nms_kernel, self.max_centers,
                return_overflow=True, keep_coarse=True,
            )
            step = int(upsampling) * (4 if self.coarse_boundaries else 1)
            sem = pp.harden_median_space(sem_med, self.confidence_thr)
            pan = pp.merge_semantic_and_instance_coarse(
                sem, cells, self.label_divisor, self.thing_list,
                self.stuff_area, self.void_label, self.num_classes,
                self.max_centers, step=step,
            )
            return pan, n_over

        self._cells = _cells
        self._merge = _merge
        self._post = _post

    def infer(self, image: jnp.ndarray, render_steps: int = 2,
              out_hw=None) -> dict:
        out = self._forward(
            self.variables, image,
            render_steps=render_steps,
            interpolate_ins=not self.coarse_boundaries,
        )
        # plain (non-PointRend) models ignore render_steps and emit sem at
        # input resolution; at upsampling > 1 the reference interpolates the
        # logits to target resolution (engines.py F.interpolate,
        # align_corners=True) — match that so scale > 1 works for every arch
        if out_hw is not None and tuple(out["sem_logits"].shape[1:3]) != tuple(out_hw):
            out["sem_logits"] = _resize_logits(
                out["sem_logits"], (int(out_hw[0]), int(out_hw[1]))
            )
        # median-space contract (pp.to_median_space): binary models keep raw
        # logits end-to-end (the odd-window median is a per-pixel selection,
        # which commutes with the monotone sigmoid — no probability map in
        # HBM); multiclass models carry softmax probs through the median
        out["sem"] = pp.to_median_space(out["sem_logits"])
        return out

    def get_instance_cells(self, ctr_hmp, offsets, upsampling: int = 1):
        cells, n_over = self._cells(ctr_hmp, offsets, upsampling=int(upsampling))
        self._track_overflow(n_over)
        return cells

    def _track_overflow(self, n_over):
        # device-side max accumulation: no fetch on the dispatch path; one
        # scalar fetch in dropped_centers() reads the whole run's worst case
        self._overflow_dev = (
            n_over if self._overflow_dev is None
            else jnp.maximum(self._overflow_dev, n_over)
        )

    def _post_fused(self, out: dict, upsampling: int):
        """One-dispatch postprocess (coarse-grid merge) + overflow track."""
        pan, n_over = self._post(
            out["sem"], out["ctr_hmp"], out["offsets"],
            upsampling=int(upsampling),
        )
        self._track_overflow(n_over)
        return pan

    def dropped_centers(self) -> int:
        """Worst-case number of NMS centers dropped by the ``max_centers``
        cap in any slice since the last reset (one device fetch).  The
        reference has no cap (unbounded torch.nonzero), so a nonzero value
        means instances were silently merged — raise ``max_centers``."""
        return 0 if self._overflow_dev is None else int(self._overflow_dev)

    def reset_overflow(self):
        self._overflow_dev = None

    def postprocess(self, sem_med, cells) -> jnp.ndarray:
        """``sem_med``: median-space semantic map (raw logits for binary
        models, softmax probs for multiclass — see pp.to_median_space)."""
        return self._merge(sem_med, cells)

    def _prepare(self, image: np.ndarray):
        x = self._to_device_image(image)
        return pp.factor_pad(x, self.padding_factor, buckets=self.shape_buckets)

    def _forward_out(self, image, size, upsampling: int):
        """Shared dispatch prologue: pad/prepare + model forward with
        render_steps = 2 + log2(upsampling); records the crop size."""
        assert math.log2(upsampling).is_integer(), "Upsampling factor not log base 2!"
        x = self._prepare(image)
        u = int(upsampling)
        out = self.infer(x, render_steps=int(2 + math.log2(u)),
                         out_hw=(x.shape[1] * u, x.shape[2] * u))
        out["size"] = tuple(size)
        return out

    def dispatch(self, image: np.ndarray, size, upsampling: int = 1):
        """Launch the device chain and return the (unfetched) panoptic map.

        JAX dispatch is asynchronous: the caller can do host work (RLE
        extraction, tile translation) for a previous slice while this one
        computes, fetching via ``np.asarray`` only when needed — the 2D
        tiled path pipelines tiles this way."""
        out = self._forward_out(image, size, upsampling)
        h, w = out["size"]
        pan = self._post_fused(out, upsampling)
        return pan[0, :h, :w]

    def __call__(self, image: np.ndarray, size, upsampling: int = 1) -> np.ndarray:
        return np.asarray(self.dispatch(image, size, upsampling))


class PanopticDeepLabRenderEngine3d(PanopticDeepLabRenderEngine):
    """Render engine + median queue (engines.py:327-394)."""

    def __init__(self, *args, median_kernel_size: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.median = MedianQueue(median_kernel_size)

    def dispatch(self, image, size, upsampling: int = 1):
        """As the 2D engine's dispatch: unfetched device map (or None while
        the median queue fills) — the caller/matcher thread fetches."""
        out = self._forward_out(image, size, upsampling)
        self.median.enqueue(out)
        median_out = self.median.get_next(keys=["sem"])
        if median_out is None:
            return None
        # crop with the MIDDLE slice's recorded size, not this call's (the
        # per-call size argument permits varying slice sizes; end() already
        # does the same)
        h, w = median_out["size"]
        pan = self._post_fused(median_out, upsampling)
        return pan[0, :h, :w]

    def __call__(self, image, size, upsampling: int = 1) -> Optional[np.ndarray]:
        pan = self.dispatch(image, size, upsampling)
        return None if pan is None else np.asarray(pan)

    def end(self, upsampling: int = 1):
        final = []
        for out in self.median.end():
            h, w = out["size"]
            pan = self._post_fused(out, upsampling)
            final.append(np.asarray(pan[0, :h, :w]))
        return final


class BCEngine(_EngineBase):
    """Boundary-contour engine: returns stacked sigmoid (sem, cnt) maps
    (engines.py:396-434); consumed offline by bc_watershed."""

    def __init__(self, model, variables, padding_factor: int = 16,
                 shape_buckets: bool = False, input_dtype=jnp.float32,
                 **kwargs):
        super().__init__(model, variables, input_dtype)
        self.padding_factor = padding_factor
        self.shape_buckets = bool(shape_buckets)

    def infer(self, image, render_steps: int = 2):
        out = self._forward(self.variables, image, render_steps=render_steps)
        sem = jax.nn.sigmoid(out["sem_logits"])
        cnt = jax.nn.sigmoid(out["cnt_logits"])
        return {"bc": jnp.concatenate([sem, cnt], axis=-1)}  # (1, H, W, 2)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        h, w = image.shape[-2:]
        x = pp.factor_pad(self._to_device_image(image), self.padding_factor,
                          buckets=self.shape_buckets)
        return np.asarray(self.infer(x)["bc"][0, :h, :w])


class BCEngine3d(BCEngine):
    def __init__(self, *args, median_kernel_size: int = 3, **kwargs):
        super().__init__(*args, **kwargs)
        self.median = MedianQueue(median_kernel_size)

    def __call__(self, image, size, upsampling: int = 1):
        assert math.log2(upsampling).is_integer()
        h, w = size
        x = pp.factor_pad(self._to_device_image(image), self.padding_factor,
                          buckets=self.shape_buckets)
        out = self.infer(x, render_steps=int(2 + math.log2(upsampling)))
        out["size"] = (h, w)
        self.median.enqueue(out)
        median_out = self.median.get_next(keys=["bc"])
        if median_out is None:
            return None
        # crop with the MIDDLE slice's recorded size, not this call's
        mh, mw = median_out["size"]
        return np.asarray(median_out["bc"][0, :mh, :mw])

    def end(self, upsampling: int = 1):
        return [np.asarray(o["bc"][0, : o["size"][0], : o["size"][1]]) for o in self.median.end()]
