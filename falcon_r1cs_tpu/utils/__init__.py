"""Auxiliary subsystems: counters, profiling, runtime config (the
tracing/observability/config layer the reference lacks -- SURVEY.md
section 5)."""

from .config import RuntimeConfig, get_config, set_config
from .counters import CounterLog, SectionDelta
from .profiling import device_trace, throughput

__all__ = [
    "CounterLog",
    "RuntimeConfig",
    "SectionDelta",
    "device_trace",
    "get_config",
    "set_config",
    "throughput",
]
