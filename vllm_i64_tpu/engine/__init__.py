from .engine import Engine, GenerationResult
from .runner import ModelRunner

__all__ = ["Engine", "GenerationResult", "ModelRunner"]
