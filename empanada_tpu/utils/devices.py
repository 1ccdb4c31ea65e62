"""Kill-able device probing.

Initializing a remote TPU backend (PJRT over a dev tunnel) can block
indefinitely inside C++ when the tunnel is degraded — SIGALRM handlers
never run there.  ``probe_device_count`` counts devices in a subprocess
that can actually be killed, so callers (bench.py, __graft_entry__.py)
get a definite answer either way.
"""

from __future__ import annotations

import subprocess
import sys

__all__ = ["probe_device_count"]


def probe_device_count(timeout: float = 180.0) -> int | None:
    """Number of jax devices visible to a fresh interpreter, or None when
    the probe failed or timed out (degraded tunnel)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        if proc.returncode == 0:
            return int(proc.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        pass
    return None
