"""Model preset configs for the three Complexity-ML checkpoints.

Dimensions follow the reference's published defaults
(ref: complexity_deep/config.py:27-64 — hidden 1024, inter 3200, 20 layers,
16 heads / 4 KV heads, vocab 32000) with layer counts chosen to match the
registry's parameter counts (ref: registry.py:113-138 — 492.1M / 306.5M).
When a checkpoint is loaded its config.json overrides these presets; they
exist so benches and the graft entry can build the right-shaped model
without network access.
"""

from __future__ import annotations

from ..config import ModelConfig

# tr-moe-306: 306.5M = 32.8M embed + 20 layers x ~13.7M
TR_MOE_306 = ModelConfig(
    vocab_size=32000,
    hidden_size=1024,
    intermediate_size=3200,
    num_hidden_layers=20,
    num_attention_heads=16,
    num_key_value_heads=4,
    max_position_embeddings=2048,
    num_experts=4,
    top_k=2,
    top_k_primary_weight=0.5,  # TR top-2 mixes 0.5/0.5 (SURVEY §2.3)
    shared_expert=True,
    use_qk_norm=True,
)

# tr-hash-moe-500m: 492.1M ≈ 32.8M embed + 30 layers x ~15.3M
TR_HASH_MOE_500M = TR_MOE_306.replace(num_hidden_layers=30)

# dense-306: width-matched dense SwiGLU baseline — same per-layer MLP params
# as 4 experts x 800 + shared 800 => dense intermediate 4000
DENSE_306 = ModelConfig(
    vocab_size=32000,
    hidden_size=1024,
    intermediate_size=4000,
    num_hidden_layers=20,
    num_attention_heads=16,
    num_key_value_heads=4,
    max_position_embeddings=2048,
    use_token_routed_mlp=False,
    num_experts=1,
    shared_expert=False,
    use_qk_norm=True,
)

PRESETS = {
    "tr-hash-moe-500m": TR_HASH_MOE_500M,
    "tr-moe-306": TR_MOE_306,
    "dense-306": DENSE_306,
}


def get_preset(name: str) -> ModelConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset '{name}'; have {sorted(PRESETS)}")
    return PRESETS[name]
