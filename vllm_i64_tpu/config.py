"""Configuration for vllm-i64-tpu.

Two config layers, mirroring the reference's split
(ref: vllm_i64/models/complexity_deep/config.py, vllm_i64/engine/config.py):

- ``ModelConfig``: frozen/hashable so it can be a static argument to ``jax.jit``.
  Mirrors the checkpoint ``config.json`` fields of the Complexity-Deep family
  (ref: complexity_deep/config.py:16-78).
- ``EngineConfig``: runtime knobs for the serving engine
  (ref: engine/config.py:1-50).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters (hashable -> usable as jit static arg).

    Field names mirror the checkpoint config.json of Complexity-Deep models
    (ref: complexity_deep/config.py:16-78) so checkpoints load unchanged.
    """

    # Architecture identity
    model_type: str = "complexity-deep"
    architecture: str = "DeepForCausalLM"

    # Dimensions
    vocab_size: int = 32000
    hidden_size: int = 1024
    intermediate_size: int = 3200
    num_hidden_layers: int = 20
    num_attention_heads: int = 16
    num_key_value_heads: int = 4

    # Positions
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0

    # Norm / activation
    rms_norm_eps: float = 1e-6
    hidden_act: str = "silu"

    # Embeddings
    tie_word_embeddings: bool = True

    # Special tokens (</s>=0, <pad>=1, <s>=2)
    pad_token_id: int = 1
    bos_token_id: int = 2
    eos_token_id: int = 0
    # VLM image-placeholder token: soft (vision) tokens occupy prompt
    # positions holding this id; it also drives their deterministic MoE
    # routing (ref analog: pixel_values threading, i64_engine.py:1129-1151)
    image_token_id: Optional[int] = None

    # Token-routed MoE (integer routing)
    use_token_routed_mlp: bool = True
    num_experts: int = 4
    shared_expert: bool = True
    shared_intermediate_size: Optional[int] = None
    top_k: int = 1
    top_k_primary_weight: Optional[float] = None
    use_shared_routed_gates: bool = False
    shared_gate_init: float = 1.0
    routed_gate_init: float = 1.0
    shared_output_scale: float = 1.0
    routed_output_scale: float = 1.0
    # Routing strategy:
    #   "modulo_cyclic" — deterministic token-id routing (token-routed MLP;
    #     TR-HASH checkpoints overwrite the table with their exact hashes)
    #   "learned_gate" / "learned_gate_integer" — Mixtral-style softmax
    #     router over a learned (H, E) gate, top-k renormalized; the
    #     integer variant uses the Q16 LUT softmax (ref: layers/moe.py
    #     MixtralMoE :133-233). Selected when use_token_routed_mlp=False
    #     and num_experts > 1; weights live at mlp.router.
    routing_strategy: str = "modulo_cyclic"
    # MoE execution backend:
    #   "masked_dense" — every device computes its E/ep_size local experts
    #     for ALL tokens with the routing folded into a weight mask (default;
    #     optimal for the E=4 production models).
    #   "ep_a2a" — expert-parallel dispatch: each device computes only the
    #     capacity-bounded (route, token) pairs destined for its local
    #     experts, combined with one psum over the ep/tp mesh axes (servable
    #     integration of ops/ep_dispatch.py; ref semantics:
    #     token_routed_i64/layer.py:229-299). Requires a mesh; wins for
    #     many-expert configs when ep_size > top_k * capacity_factor.
    moe_backend: str = "masked_dense"
    # ep_a2a capacity: per-destination slots C = ceil(K*N/ep * factor).
    ep_capacity_factor: float = 1.5
    # What to do when a batch's deterministic routing exceeds capacity
    # (exact host-side prediction, ops/ep_dispatch.count_ep_overflow):
    #   "warn"       — count into step_mix["ep_overflow_pairs"] + log once
    #                  per step; dropped pairs degrade (their mix-weighted
    #                  expert term is simply missing), never corrupt.
    #   "error"      — fail the step before dispatch (crash recovery fails
    #                  the running requests; nothing silently degrades).
    #   "never_drop" — at engine init raise ep_capacity_factor to the
    #                  table-audit bound that makes overflow IMPOSSIBLE for
    #                  any token batch (ops/ep_dispatch.audit_route_table).
    ep_overflow_policy: str = "warn"

    # Attention features
    use_qk_norm: bool = True
    sliding_window: Optional[int] = None
    # Integer attention (ref: attention.py naive_integer_* :265-466): float
    # scores and V multiply, but the softmax runs through the Q7->Q16 LUT
    # integer softmax with -1e4 masks — the bit-exactness experiment path.
    use_integer_attention: bool = False

    # Mu-guidance (learnable equilibrium vector threaded between layers)
    use_mu_guidance: bool = False
    disable_mu_guidance: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def expert_intermediate_size(self) -> int:
        return self.intermediate_size // self.num_experts

    @property
    def resolved_shared_intermediate_size(self) -> int:
        s = self.shared_intermediate_size
        return s if (s is not None and s > 0) else self.expert_intermediate_size

    @property
    def effective_top_k(self) -> int:
        return max(1, int(self.top_k))

    @property
    def primary_weight(self) -> float:
        """Weight of route 0; remaining (1-w)/(k-1) split between other routes.

        Mirrors the clamp rules of the reference MoE layer
        (ref: layers/token_routed_mlp.py:53-58).
        """
        if self.effective_top_k <= 1:
            return 1.0
        w = self.top_k_primary_weight
        if w is None:
            w = 0.95
        return min(1.0, max(0.0, float(w)))

    @property
    def mu_enabled(self) -> bool:
        return self.use_mu_guidance and not self.disable_mu_guidance

    @property
    def learned_moe_enabled(self) -> bool:
        """Mixtral-style learned-gate MoE (ref: layers/moe.py:133-233) —
        the non-token-routed many-expert configuration."""
        return (
            not self.use_token_routed_mlp
            and self.num_experts > 1
            and self.routing_strategy in ("learned_gate",
                                          "learned_gate_integer")
        )

    @property
    def resolved_image_token_id(self) -> int:
        return self.pad_token_id if self.image_token_id is None else self.image_token_id

    @staticmethod
    def from_json(path: str) -> "ModelConfig":
        """Build from a checkpoint config.json (deep or framework format).

        Field mapping mirrors ref complexity_deep/config.py:88-114.
        """
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
        return ModelConfig.from_dict(data)

    @staticmethod
    def from_dict(data: dict) -> "ModelConfig":
        field_map = {"norm_eps": "rms_norm_eps"}
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        kwargs = {}
        for key, val in data.items():
            if key in ("parameters", "innovations", "extra_config"):
                continue
            mapped = field_map.get(key, key)
            if mapped in known:
                kwargs[mapped] = val
        # Framework format: mlp_type selects routed vs dense
        if data.get("mlp_type") == "token_routed":
            kwargs["use_token_routed_mlp"] = True
        elif data.get("mlp_type") == "swiglu":
            kwargs["use_token_routed_mlp"] = False
            kwargs["num_experts"] = 1
        return ModelConfig(**kwargs)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass
class EngineConfig:
    """Engine runtime knobs (ref: engine/config.py:1-50)."""

    max_batch_size: int = 32
    max_seq_len: int = 2048
    kv_block_size: int = 16
    max_kv_blocks: int = 0  # 0 = auto
    max_prefill_tokens: int = 512
    enable_preemption: bool = True
    enable_prefix_caching: bool = True
    request_timeout_s: float = 0.0  # 0 = no timeout

    # Numerics
    dtype: str = "bfloat16"          # activations/weights compute dtype
    kv_cache_dtype: str = "bfloat16"  # also: float8_e4m3fn | float8_e5m2
    quantization: str = "none"        # none | int8 | int4 | fp8
    # W8A8: dynamic per-token INT8 activation quant feeding native
    # int8xint8 MXU matmuls (ref: quantization.py:119-224). Applies to
    # int8-quantized weights (and as W4A8 to int4); logits stay on the
    # dequant path for accuracy. ON by default: this matches the
    # reference's production numerics (torch quantize_dynamic is
    # activation-quantizing, loader.py:57-76) and is the measured-fastest
    # path on v5e (bench headline recorded with it). No effect without
    # quantized weights.
    w8a8: bool = True
    # Fuse rmsnorm + per-row int8 activation quant into one kernel feeding
    # the W8A8 GEMMs (cuts 2 of the 4 per-layer activation quantizes;
    # numerics identical — the kernel replicates quantize_activations_int8).
    # ON by default per the 2026-08-19 v5e A/B (+3.5% inside the compiled
    # step); only active when w8a8 applies.
    fused_norm_quant: bool = True
    # auto-upgrade the KV cache to fp8 when block usage crosses 70%
    # (ref: kv_cache.py maybe_enable_fp8 :819-831)
    kv_fp8_auto: bool = False
    # KV swap on preemption: save the victim's KV blocks to host memory and
    # restore them verbatim at re-admission instead of preempting-and-
    # recomputing (ref: kv_cache.py enable_swap/swap_out/swap_in :711-813,
    # engine pinning i64_engine.py:822-828). Bounded by kv_swap_max_mb;
    # over-budget victims fall back to recompute.
    enable_kv_swap: bool = False
    kv_swap_max_mb: int = 512

    # Compilation buckets (static shapes replace CUDA graphs;
    # ref analog: core/cuda_graph.py batch-size buckets {1..64})
    decode_batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32)
    prefill_token_buckets: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    # up to max_batch rows per prefill dispatch: one 64-request wave of
    # short prompts is ONE program execution (fixed per-dispatch host cost
    # was 8x'd by the old 8-row cap); the engine's _budget_split keeps
    # bucketed batch x token <= max_prefill_tokens, and warmup prunes the
    # program space by the same rule, so the axis growth stays bounded
    prefill_batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)

    # Scheduling extras
    enable_request_merging: bool = True

    # Multi-step decode: run K decode iterations in one device dispatch
    # (sampled tokens feed back on device). 1 = off. Amortizes dispatch
    # latency; admission of new requests waits at most K steps.
    multistep_decode: int = 8
    # Cap the multistep window when prefill chunks share the step: a full
    # K-window between prefill chunks delays later requests' first tokens
    # by K decode iterations per chunk. Deferred iterations run in the
    # chained pure-decode phase (round-trips hidden there), so this trades
    # ~nothing for TTFT. 0 = no cap.
    multistep_mixed: int = 4
    # Prefill row packing: split prefill chunks into subrows of at most
    # this many tokens before batching, so one long prompt no longer pads
    # every other row in its group to its length (true-varlen analog; the
    # per-row ctx_lens/positions make split rows attend correctly, and all
    # KV writes in a step land before any attention reads them). 0 = off.
    prefill_pack_tokens: int = 256
    # Deferred KV writes in multistep decode: each iteration's K/V rows go
    # to a (L, B, K) window side buffer and attend in-band; the paged cache
    # is merged ONCE per window instead of scatter+gather per layer per
    # iteration (which measured ~60% of a decode iteration on v5e).
    # Disabled automatically for models with sliding-window attention.
    deferred_kv_decode: bool = True
    # Pipeline consecutive multistep windows: dispatch window N+1 from
    # window N's on-device carry BEFORE reading window N's tokens back, so
    # host readback overlaps device execution (steady-state decode pays no
    # dispatch round-trip). Breaks automatically on admissions, finishes,
    # host-sampled rows, or stop sequences.
    decode_chaining: bool = True

    # Fuse q/k/v projections into one GEMM per layer (ref: model.py
    # fuse_qkv :114-145). Decode at small batch is launch-latency-bound.
    fuse_qkv: bool = True
    # Fold the shared lexical expert into the flat-expert MoE layout as an
    # always-on segment (ref: token_routed_mlp.py:164-186 computes it as a
    # separate dense SwiGLU): one gate/up/down GEMM set per layer instead of
    # two, with the output scales folded into the routing mask. The shared
    # segment is zero-padded to a multiple of 128 columns so the fused
    # widths stay lane-aligned for the MXU. Disabled under a mesh (the
    # shared segment would need replication while experts shard).
    fuse_shared_expert: bool = True

    # KV auto-sizing: with max_kv_blocks=0, fill free device memory up to
    # this fraction (vLLM's gpu_memory_utilization analog). Falls back to
    # the static heuristic when the backend exposes no memory stats.
    hbm_utilization: float = 0.9

    def resolve_kv_blocks(self) -> int:
        """Static auto KV block count (ref: engine/config.py
        resolve_kv_blocks). The runner upgrades this to an HBM-measured
        count when device memory stats are available (see
        engine/runner._auto_kv_blocks)."""
        if self.max_kv_blocks and self.max_kv_blocks > 0:
            return self.max_kv_blocks
        per_seq = -(-self.max_seq_len // self.kv_block_size)
        return max(256, self.max_batch_size * 8, self.max_batch_size * per_seq // 2)

    @property
    def max_blocks_per_seq(self) -> int:
        return -(-self.max_seq_len // self.kv_block_size)
