from . import complexity_deep
from .registry import get_model_entry, list_models, register_model

__all__ = ["complexity_deep", "get_model_entry", "list_models", "register_model"]
