"""Spatially-sharded inference: one big 2D slice split row-wise across the
device mesh with halo exchange over ICI.

This is the TPU-native replacement for the reference's serial tile loop
(Tiler + per-tile engine + RLE translate + merge_objects_from_tiles,
empanada_napari/inference.py:281-318): instead of overlapping tiles stitched
on the host, ONE jitted step runs the conv stack cooperatively —

- the slice's row axis is sharded over the mesh (shard_map);
- each device exchanges ``halo`` rows with its neighbors via
  ``lax.ppermute`` so every convolution sees real context instead of a tile
  border (seam-free by construction for receptive fields <= halo);
- global-pooling layers (ASPP image pooling, RegNet squeeze-excite) stay
  EXACT via ``lax.pmean`` across the spatial axis (see
  ``spatial_pool_axis`` — the models consult it at trace time);
- outputs come back as full-resolution arrays; panoptic postprocessing then
  runs once on the whole slice, so instance ids are globally consistent —
  no overlap voting or cluster merging needed.

Halo sizing: the padding factor (128) bounds the per-block geometry; the
effective receptive field of PDL/BiFPN (stride 32 + dilated convs) is a few
hundred pixels, so halo=128..256 captures almost all real context.

Known approximations (shared by the reference's tile path, quantified in
test_spatial.py — the sharded forward is >2x closer to the unsharded output
than independent tiles):
- receptive fields larger than the halo are truncated at block borders;
- mesh-edge blocks see ``halo`` explicit zero rows where the unsharded model
  re-pads with zeros at every layer, which differs once activations carry
  conv biases;
- the decoder's align_corners=True upsamplings map coordinates by
  (H_in-1)/(H_out-1), which depends on the (block+halo) extent, shifting
  sample grids by a sub-pixel amount relative to the full-image grid.
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = [
    "spatial_pool_axis",
    "current_spatial_axis",
    "exchange_halo_rows",
    "spatial_sharded_forward",
    "SpatialEngine2d",
]

_AXIS: list = [(None, 0.0)]


@contextlib.contextmanager
def spatial_pool_axis(name: Optional[str], halo_fraction: float = 0.0):
    """Bind the mesh axis name that global-pooling layers should pmean over
    (consulted at trace time by ASPP / SqueezeExcite).  ``halo_fraction`` is
    halo / (block + 2*halo) in rows — pooling layers crop that fraction from
    each row edge so halo rows (including zero padding at mesh edges) don't
    bias the global mean."""
    _AXIS.append((name, halo_fraction))
    try:
        yield
    finally:
        _AXIS.pop()


def current_spatial_axis() -> Optional[str]:
    return _AXIS[-1][0]


def spatial_global_mean(x):
    """Global mean over (H, W) that is exact under spatial sharding: crops
    halo rows, means locally, then pmeans across the axis."""
    import jax

    name, halo_fraction = _AXIS[-1]
    if name is None:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    h = x.shape[1]
    hh = int(round(h * halo_fraction))
    interior = x[:, hh : h - hh] if hh > 0 else x
    pooled = jnp.mean(interior, axis=(1, 2), keepdims=True)
    return jax.lax.pmean(pooled, name)


def exchange_halo_rows(block: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Concat ``halo`` rows from the previous/next shard onto a row block.

    block: (N, H_local, W, C).  Edge shards receive zero padding (matching
    the zero padding an unsharded conv sees at the image border).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        cfg = [(0, 0)] * block.ndim
        cfg[1] = (halo, halo)
        return jnp.pad(block, cfg)
    # my bottom rows -> next shard's top halo
    top_halo = jax.lax.ppermute(
        block[:, -halo:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # my top rows -> previous shard's bottom halo
    bottom_halo = jax.lax.ppermute(
        block[:, :halo], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([top_halo, block, bottom_halo], axis=1)


def spatial_sharded_forward(
    model,
    variables,
    image: jnp.ndarray,
    mesh: Mesh,
    halo: int = 128,
    axis_name: str = "spatial",
    render_steps: int = 2,
    interpolate_ins: bool = True,
    data_axis: Optional[str] = None,
):
    """Run ``model`` over a row-sharded image with halo exchange.

    Args:
        image: (N, H, W, 1) with H divisible by (spatial mesh size * padding
            factor); halo must be a multiple of 4 (the coarsest full-res
            output step).
        data_axis: optional second mesh axis to shard the batch over —
            combined dp x sp: each data-slice of the mesh processes its own
            images, rows cooperatively sharded within it (halo ppermute and
            pooling pmean act along ``axis_name`` only, so they stay local
            to each data row of the mesh).

    Returns the model's output dict at the same resolutions an unsharded
    call would produce, sharded over the mesh.
    """
    if data_axis is not None:
        n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    else:
        n = mesh.devices.size
    h = image.shape[1]
    assert h % n == 0, f"H={h} must divide over {n} shards"
    assert halo % 4 == 0
    assert halo <= h // n, (
        f"halo {halo} exceeds the {h // n}-row shard block; use fewer shards, "
        "a bigger slice, or a smaller halo (multi-hop halos not supported)"
    )

    def block_forward(variables, block):
        with_halo = exchange_halo_rows(block, halo, axis_name)
        halo_fraction = halo / (block.shape[1] + 2 * halo)
        with spatial_pool_axis(axis_name, halo_fraction):
            out = model.apply(
                variables, with_halo, train=False,
                render_steps=render_steps, interpolate_ins=interpolate_ins,
            )
        # crop the halo at each output's own scale
        cropped = {}
        for key, val in out.items():
            scale = with_halo.shape[1] // val.shape[1]
            hh = halo // scale
            cropped[key] = val[:, hh : val.shape[1] - hh]
        return cropped

    spec = P(data_axis, axis_name, None, None)
    fn = shard_map(
        partial(block_forward, variables),
        mesh=mesh,
        in_specs=spec,
        out_specs=spec,
        check_vma=False,
    )
    return fn(image)


class SpatialEngine2d:
    """Seam-free big-slice 2D engine: sharded forward + single global
    panoptic postprocess.  Same knobs as the render engines."""

    def __init__(
        self,
        model,
        variables,
        thing_list,
        mesh: Optional[Mesh] = None,
        halo: int = 128,
        label_divisor: int = 1000,
        stuff_area: int = 64,
        void_label: int = 0,
        nms_threshold: float = 0.1,
        nms_kernel: int = 7,
        confidence_thr: float = 0.5,
        padding_factor: int = 128,
        coarse_boundaries: bool = True,
        max_centers: int = 1024,
    ):
        from empanada_tpu.parallel.mesh import create_mesh

        self.model = model
        self.variables = variables
        self.mesh = mesh if mesh is not None else create_mesh(axis_name="spatial")
        self.halo = halo
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
        self.num_classes = int(model.num_classes) + 1
        self._build()

    def update_params(
        self,
        label_divisor=None,
        nms_threshold=None,
        nms_kernel=None,
        confidence_thr=None,
        coarse_boundaries=None,
    ):
        """Live parameter update without reloading the model (same surface
        as the render engines); the jitted step is rebuilt, so the next call
        recompiles with the new constants."""
        if label_divisor is not None:
            self.label_divisor = int(label_divisor)
        if nms_threshold is not None:
            self.nms_threshold = float(nms_threshold)
        if nms_kernel is not None:
            self.nms_kernel = int(nms_kernel)
        if confidence_thr is not None:
            self.confidence_thr = float(confidence_thr)
        if coarse_boundaries is not None:
            self.coarse_boundaries = bool(coarse_boundaries)
        self._build()

    def _build(self):
        import math

        n = self.mesh.devices.size
        axis = list(self.mesh.axis_names)[0]

        @partial(jax.jit, static_argnames=("upsampling",))
        def _run(variables, image, upsampling=1):
            # same render contract as the unsharded engine
            # (engines.py _forward_out): extra PointRend steps recover full
            # resolution from a downsampled input, so scale > 1 output is
            # refined by the ladder, not nearest-upsampled
            render_steps = int(2 + math.log2(upsampling))
            out = spatial_sharded_forward(
                self.model, variables, image, self.mesh, self.halo, axis,
                render_steps=render_steps,
                interpolate_ins=not self.coarse_boundaries,
            )
            from empanada_tpu.ops import postprocess as pp
            from empanada_tpu.ops.interpolate import bilinear_resize

            # plain (non-PointRend) models ignore render_steps; interpolate
            # the logits to target resolution like the unsharded engine
            # (engines.py _resize_logits) so scale > 1 works for every arch
            want = (image.shape[1] * upsampling, image.shape[2] * upsampling)
            if tuple(out["sem_logits"].shape[1:3]) != want:
                out["sem_logits"] = bilinear_resize(
                    out["sem_logits"], want, align_corners=True
                )
            cells = pp.get_instance_cells(
                out["ctr_hmp"], out["offsets"], self.coarse_boundaries,
                upsampling, self.nms_threshold, self.nms_kernel,
                self.max_centers, keep_coarse=True,
            )
            # logit-space hardening (exact; see pp.harden_logits) — no
            # probability map in HBM
            sem_h = pp.harden_logits(out["sem_logits"], self.confidence_thr)
            # coarse-grid merge: exact, ~16x less one-hot HBM traffic
            step = int(upsampling) * (4 if self.coarse_boundaries else 1)
            pan = pp.merge_semantic_and_instance_coarse(
                sem_h, cells, self.label_divisor, self.thing_list,
                self.stuff_area, self.void_label, self.num_classes,
                self.max_centers, step=step,
            )
            return pan

        self._run = _run
        self._block_multiple = n * self.padding_factor

    def __call__(self, image, upsampling: int = 1) -> "np.ndarray":
        import math

        import numpy as np

        assert math.log2(upsampling).is_integer(), \
            "Upsampling factor not log base 2!"
        h, w = image.shape
        pad_h = (-h) % self._block_multiple
        pad_w = (-w) % self.padding_factor
        x = np.pad(np.asarray(image, np.float32), ((0, pad_h), (0, pad_w)))
        pan = self._run(self.variables, jnp.asarray(x)[None, ..., None],
                        upsampling=int(upsampling))
        up = int(upsampling)
        return np.asarray(pan[0, : h * up, : w * up])
