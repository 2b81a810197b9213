from .meters import AverageMeter, StepTimer, append_metric_line
from .profiling import StepProfiler, Throughput

__all__ = ["AverageMeter", "StepProfiler", "StepTimer", "Throughput",
           "append_metric_line"]
