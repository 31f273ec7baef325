"""Model registry: name -> (module, checkpoint id, metadata).

Mirrors the reference registry (ref: vllm_i64/core/registry.py:113-138) —
the three Complexity-ML deterministic token-routed checkpoints — plus
architecture auto-resolution from a checkpoint config.json (:87-110).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Optional

from ..config import ModelConfig


@dataclass
class ModelEntry:
    name: str
    module: str  # python module under vllm_i64_tpu.models
    checkpoint: str  # HF hub id or local path
    parameters: str = ""
    description: str = ""
    config_loader: Callable[[str], ModelConfig] = field(default=ModelConfig.from_json)


_REGISTRY: Dict[str, ModelEntry] = {}

# config.json "architectures" -> registry module
_ARCHITECTURE_MAP = {
    "DeepForCausalLM": "complexity_deep",
    "ComplexityDeepForCausalLM": "complexity_deep",
}


def register_model(
    name: str,
    module: str,
    checkpoint: str,
    parameters: str = "",
    description: str = "",
) -> None:
    _REGISTRY[name] = ModelEntry(
        name=name,
        module=module,
        checkpoint=checkpoint,
        parameters=parameters,
        description=description,
    )


def get_model_entry(name: str) -> ModelEntry:
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {', '.join(sorted(_REGISTRY))}"
        )
    return _REGISTRY[name]


def list_models():
    return list(_REGISTRY.values())


def resolve_architecture(config_path: str) -> Optional[str]:
    """Auto-detect the model module from a checkpoint config.json
    (ref: registry.py:87-110)."""
    p = Path(config_path)
    if p.is_dir():
        p = p / "config.json"
    if not p.exists():
        return None
    with open(p, "r", encoding="utf-8") as f:
        data = json.load(f)
    for arch in data.get("architectures", []):
        if arch in _ARCHITECTURE_MAP:
            return _ARCHITECTURE_MAP[arch]
    if data.get("model_type") == "complexity-deep":
        return "complexity_deep"
    return None


register_model(
    name="tr-hash-moe-500m",
    module="complexity_deep",
    checkpoint="Pacific-i64/TR-HASH-MOE-500M-HF",
    parameters="492.1M",
    description="Balanced token-ID hash top-2 residual experts with shared SwiGLU",
)
register_model(
    name="tr-moe-306",
    module="complexity_deep",
    checkpoint="Pacific-i64/TR-MOE-306",
    parameters="306.5M",
    description="Fixed top-2 token-routed residual experts with shared SwiGLU",
)
register_model(
    name="dense-306",
    module="complexity_deep",
    checkpoint="Pacific-i64/Dense-306",
    parameters="306.5M",
    description="Width-matched dense SwiGLU baseline",
)
