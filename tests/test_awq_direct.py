"""Direct int4 serving of AWQ checkpoints — no dequant->requant round-trip.

A synthetic AWQ fixture checkpoint (safetensors + quantization_config) loads
two ways: int4_direct=True (Q4Tensor leaves served as-is) and =False (float
conversion). Logits must be BIT-IDENTICAL (VERDICT r1 item 10; ref: the
reference serves its internal INT4 format straight from the unpack,
core/quantization.py:307-421).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import ModelConfig
from vllm_i64_tpu.core.loader import load_model
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.ops.quant import Q4Tensor

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,  # per-expert I = 32
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    num_experts=4,
    top_k=2,
    shared_expert=True,
    use_qk_norm=True,
)
GS = 32  # group size dividing every input dim (64 and 32)


def pack_rows_lsb(q: np.ndarray) -> np.ndarray:
    n_in, n_out = q.shape
    out = np.zeros((n_in // 8, n_out), np.uint32)
    for i in range(8):
        out |= q[i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def pack_cols_lsb(z: np.ndarray) -> np.ndarray:
    g, n_out = z.shape
    out = np.zeros((g, n_out // 8), np.uint32)
    for i in range(8):
        out |= z[:, i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def awq_group(rng, n_in: int, n_out: int) -> dict:
    """Synthesize one AWQ-packed linear: qweight/qzeros/scales."""
    q = rng.integers(0, 16, (n_in, n_out)).astype(np.uint8)
    groups = n_in // GS
    scales = (rng.random((groups, n_out)).astype(np.float32) + 0.2) * 0.05
    zeros = rng.integers(1, 15, (groups, n_out)).astype(np.uint8)
    return {
        "qweight": pack_rows_lsb(q),
        "qzeros": pack_cols_lsb((zeros - 1).astype(np.uint8)),
        "scales": scales,
    }


@pytest.fixture(scope="module")
def awq_checkpoint(tmp_path_factory):
    """Write a full synthetic AWQ checkpoint for the tiny routed model."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(7)
    H, E = CFG.hidden_size, CFG.num_experts
    I = CFG.expert_intermediate_size
    S = CFG.resolved_shared_intermediate_size
    sd = {}

    def put(prefix, n_in, n_out):
        for k, v in awq_group(rng, n_in, n_out).items():
            sd[f"{prefix}.{k}"] = v

    sd["embed_tokens.weight"] = (
        rng.standard_normal((CFG.vocab_size, H)).astype(np.float32) * 0.02)
    sd["norm.weight"] = np.ones((H,), np.float32)
    for layer in range(CFG.num_hidden_layers):
        p = f"layers.{layer}"
        sd[f"{p}.input_layernorm.weight"] = np.ones((H,), np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones((H,), np.float32)
        sd[f"{p}.self_attn.q_norm.weight"] = np.ones((CFG.head_dim,), np.float32)
        sd[f"{p}.self_attn.k_norm.weight"] = np.ones((CFG.head_dim,), np.float32)
        put(f"{p}.self_attn.q_proj", H, H)
        put(f"{p}.self_attn.k_proj", H,
            CFG.num_key_value_heads * CFG.head_dim)
        put(f"{p}.self_attn.v_proj", H,
            CFG.num_key_value_heads * CFG.head_dim)
        put(f"{p}.self_attn.o_proj", H, H)
        for e in range(E):
            put(f"{p}.mlp.experts.{e}.gate_proj", H, I)
            put(f"{p}.mlp.experts.{e}.up_proj", H, I)
            put(f"{p}.mlp.experts.{e}.down_proj", I, H)
        put(f"{p}.mlp.shared_gate", H, S)
        put(f"{p}.mlp.shared_up", H, S)
        put(f"{p}.mlp.shared_down", S, H)
        table = rng.integers(0, E, (CFG.effective_top_k, CFG.vocab_size))
        sd[f"{p}.mlp.topk_token_to_expert"] = table.astype(np.int32)

    d = tmp_path_factory.mktemp("awq_ckpt")
    save_file(sd, str(d / "model.safetensors"))
    cfg_json = {
        "model_type": "complexity-deep",
        "vocab_size": CFG.vocab_size,
        "hidden_size": CFG.hidden_size,
        "intermediate_size": CFG.intermediate_size,
        "num_hidden_layers": CFG.num_hidden_layers,
        "num_attention_heads": CFG.num_attention_heads,
        "num_key_value_heads": CFG.num_key_value_heads,
        "max_position_embeddings": CFG.max_position_embeddings,
        "num_experts": CFG.num_experts,
        "top_k": CFG.top_k,
        "shared_expert": True,
        "use_qk_norm": True,
        "quantization_config": {
            "quant_method": "awq", "bits": 4, "group_size": GS,
        },
    }
    (d / "config.json").write_text(json.dumps(cfg_json))
    return str(d)


def count_q4(params) -> int:
    return sum(
        1 for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, Q4Tensor))
        if isinstance(leaf, Q4Tensor)
    )


def test_direct_int4_serves_q4tensors(awq_checkpoint):
    params, cfg, stats = load_model(
        awq_checkpoint, dtype=jnp.float32, int4_direct=True)
    # attention q/k/v/o + expert gate/up/down + shared gate/up/down = 10
    assert count_q4(params) == 10
    assert stats["unloaded_params"] == 0


def test_direct_int4_logits_bit_identical_to_float_dequant(awq_checkpoint):
    params_d, cfg, _ = load_model(
        awq_checkpoint, dtype=jnp.float32, int4_direct=True)
    params_f, _, _ = load_model(
        awq_checkpoint, dtype=jnp.float32, int4_direct=False)
    assert count_q4(params_f) == 0

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(3, 120, size=(2, 10)), jnp.int32)
    logits_d = np.asarray(cdm.forward(params_d, cfg, tokens))
    logits_f = np.asarray(cdm.forward(params_f, cfg, tokens))
    np.testing.assert_array_equal(logits_d, logits_f)


def test_direct_int4_generates_through_engine(awq_checkpoint):
    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine

    params, cfg, _ = load_model(
        awq_checkpoint, dtype=jnp.float32, int4_direct=True)
    params_f, _, _ = load_model(
        awq_checkpoint, dtype=jnp.float32, int4_direct=False)
    ecfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, kv_block_size=8, max_kv_blocks=32,
        max_prefill_tokens=32, dtype="float32", kv_cache_dtype="float32",
        decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
        prefill_token_buckets=(16, 32), multistep_decode=1,
        decode_chaining=False, fuse_qkv=False, fuse_shared_expert=False,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    got = Engine(params, cfg, ecfg).generate(list(range(3, 12)), sp)
    want = Engine(params_f, cfg, ecfg).generate(list(range(3, 12)), sp)
    assert got.output_tokens == want.output_tokens
