from .host import init_on_host, on_cpu
from .logging import MetricLogger, getColorEntry

__all__ = ["init_on_host", "on_cpu", "MetricLogger", "getColorEntry"]
