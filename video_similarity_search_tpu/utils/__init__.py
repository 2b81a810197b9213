from .meters import AverageMeter, StepTimer, append_metric_line

__all__ = ["AverageMeter", "StepTimer", "append_metric_line"]
