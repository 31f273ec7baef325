"""vllm-i64-tpu: TPU-native inference engine for deterministic token-routed
(integer-routed MoE) models.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
Complexity-ML/vllm-i64: integers everywhere — routing is token_id-indexed
table lookup (i64), scheduling and KV-block management are pure integer,
sampling returns i64 token ids — and float only inside the pjit-compiled
model step function.
"""

__version__ = "0.1.0"

from .config import EngineConfig, ModelConfig

__all__ = ["EngineConfig", "ModelConfig", "__version__"]
