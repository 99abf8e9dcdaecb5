from .profiler import Timer, tick, tock
from .logging import MetricLogger

__all__ = ["Timer", "tick", "tock", "MetricLogger"]
