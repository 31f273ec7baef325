from .sampling import SamplingParams
from .scheduler import Request, RequestState, ScheduledBatch, Scheduler

__all__ = ["SamplingParams", "Request", "RequestState", "ScheduledBatch", "Scheduler"]
