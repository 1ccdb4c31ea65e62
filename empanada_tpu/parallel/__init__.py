"""Mesh scaling layer: data-parallel batched inference, sharded training
utilities, spatial (halo) sharding."""

from empanada_tpu.parallel.data_parallel import MultiChipEngine3d
from empanada_tpu.parallel.mesh import create_mesh, data_sharding, replicated

__all__ = ["MultiChipEngine3d", "create_mesh", "data_sharding", "replicated"]
