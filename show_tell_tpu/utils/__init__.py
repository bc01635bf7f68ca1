from show_tell_tpu.utils.profiling import StepTimer, trace_profile
from show_tell_tpu.utils.logging import MetricsLogger

__all__ = ["StepTimer", "trace_profile", "MetricsLogger"]
