from .server import Server
from .types import CompletionRequest, CompletionResponse, compute_partition

__all__ = ["Server", "CompletionRequest", "CompletionResponse",
           "compute_partition"]
