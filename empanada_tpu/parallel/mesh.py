"""Device-mesh helpers.

The reference scales with one process per GPU + NCCL all_gather
(empanada_napari/multigpu.py).  TPU-native scaling is declarative: build a
``jax.sharding.Mesh`` over the chips, annotate array shardings, and let XLA
insert the collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "data_sharding", "replicated", "pad_to_multiple"]


def create_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 across the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
