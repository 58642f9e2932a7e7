from .logging import Logger
from .metrics import MetricsWriter
from .jobs import JobManager, JobRegistry

__all__ = ["Logger", "MetricsWriter", "JobManager", "JobRegistry"]
