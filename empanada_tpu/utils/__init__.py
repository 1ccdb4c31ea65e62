"""Utilities: profiling/tracing, timing."""

from empanada_tpu.utils.profiling import StageTimer, device_time, trace

__all__ = ["StageTimer", "device_time", "trace"]
