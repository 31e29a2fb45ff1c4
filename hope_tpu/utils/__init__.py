from .cache import enable_persistent_cache
from .checkpoint import load_checkpoint, save_checkpoint
from .profiling import (
    MetricsWriter,
    StepTimer,
    annotate,
    compiled_cost,
    time_fn,
    trace,
)

__all__ = ["enable_persistent_cache", "save_checkpoint", "load_checkpoint",
           "trace", "annotate", "time_fn", "compiled_cost", "StepTimer",
           "MetricsWriter"]
