from .async_engine import AsyncEngine
from .engine import AdaptiveBatchSizer, Engine, GenerationResult
from .runner import ModelRunner

__all__ = [
    "AdaptiveBatchSizer",
    "AsyncEngine",
    "Engine",
    "GenerationResult",
    "ModelRunner",
]
