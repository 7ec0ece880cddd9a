"""Utilities: profiling/throughput metering and checkpointing."""
from .profiling import StepsPerSecond, trace_profile
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = ["StepsPerSecond", "trace_profile", "save_checkpoint",
           "restore_checkpoint"]
