"""Utilities: profiling/tracing, timing, progress reporting."""

from empanada_tpu.utils.profiling import StageTimer, device_time, trace
from empanada_tpu.utils.progress import Progress

__all__ = ["StageTimer", "device_time", "trace", "Progress"]
