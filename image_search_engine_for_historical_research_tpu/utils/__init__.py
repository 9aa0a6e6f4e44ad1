"""Utilities: timing/profiling, metrics logging."""

from .profiling import MetricsLogger, Timer, block, device_trace

__all__ = ["MetricsLogger", "Timer", "block", "device_trace"]
