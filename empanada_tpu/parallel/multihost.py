"""Multi-host initialization.

The reference's distributed backend is single-node NCCL with a TCP rendezvous
(multigpu.py:32).  The TPU-native equivalent for scaling past one host is
``jax.distributed.initialize`` — afterwards ``jax.devices()`` spans all hosts
and the same ``Mesh``-based code (MultiChipEngine3d, the sharded train step,
spatial sharding) runs unchanged, with XLA routing collectives over ICI
within a slice and DCN across slices.
"""

from __future__ import annotations

import jax

__all__ = ["initialize_multihost", "is_multihost", "local_device_slice"]


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize JAX's multi-host runtime (no-op if already initialized or
    single-process).  On TPU pods the arguments are auto-detected from the
    environment; pass them explicitly elsewhere."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized
        pass
    except ValueError:
        # no coordinator detectable from args/env (jax raises ValueError
        # "coordinator_address should be defined") — the documented
        # single-process no-op
        if coordinator_address is not None:
            raise
    return jax.process_index(), jax.process_count()


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_device_slice():
    """(start, stop) of this process's devices within jax.devices()."""
    local = set(d.id for d in jax.local_devices())
    ids = [d.id for d in jax.devices()]
    idx = [i for i, d in enumerate(ids) if d in local]
    return (min(idx), max(idx) + 1) if idx else (0, 0)
