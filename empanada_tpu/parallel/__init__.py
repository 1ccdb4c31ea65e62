"""Mesh scaling layer: data-parallel batched inference, sharded training
utilities, spatial (halo) sharding."""

from empanada_tpu.parallel.data_parallel import MultiChipEngine3d
from empanada_tpu.parallel.mesh import create_mesh, data_sharding, replicated
from empanada_tpu.parallel.multihost import initialize_multihost, is_multihost
from empanada_tpu.parallel.spatial import SpatialEngine2d, spatial_sharded_forward

__all__ = [
    "MultiChipEngine3d", "create_mesh", "data_sharding", "replicated",
    "initialize_multihost", "is_multihost", "SpatialEngine2d", "spatial_sharded_forward",
]
