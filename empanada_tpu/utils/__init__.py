"""Utilities: profiling/tracing, timing, progress reporting, device probing."""

from empanada_tpu.utils.devices import probe_device_count
from empanada_tpu.utils.profiling import StageTimer, device_time, trace
from empanada_tpu.utils.progress import Progress

__all__ = ["StageTimer", "device_time", "trace", "Progress", "probe_device_count"]
