from densereg_tpu.utils.logging import MetricLogger, TrainLogWriter
from densereg_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["MetricLogger", "TrainLogWriter", "StepTimer", "trace_context"]
