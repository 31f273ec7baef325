"""Shared-expert fusion: folding the shared lexical expert into the
flat-expert MoE layout (core/quantize_model.fuse_shared_expert_params)
must be exact for float weights and within quantization noise for int8.

Reference semantics being preserved: token_routed_mlp.py:164-186 — shared
expert = dense SwiGLU over all tokens, mixed with the routed output via
trained scales or learnable scalar gates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu import EngineConfig, ModelConfig
from vllm_i64_tpu.core.quantize_model import (
    fuse_qkv_params,
    fuse_shared_expert_params,
    quantize_params,
)
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.ops.quant import QTensor


CFG = ModelConfig(
    vocab_size=512, hidden_size=128, intermediate_size=256,
    num_hidden_layers=3, num_attention_heads=8, num_key_value_heads=2,
    max_position_embeddings=128, num_experts=4, top_k=2,
    shared_expert=True, use_qk_norm=True,
)


def _logits(params, cfg, ids, seq_lens):
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    h, _ = cdm.forward_hidden(params, cfg, ids, pos, seq_lens=seq_lens)
    return cdm.lm_logits(params, cfg, h)


@pytest.fixture(scope="module")
def ids_and_lens():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
    return ids, jnp.array([16, 11], jnp.int32)


def test_float_fusion_exact(ids_and_lens):
    ids, sl = ids_and_lens
    params = cdm.init_params(CFG, jax.random.PRNGKey(0))
    base = _logits(params, CFG, ids, sl)
    fused = _logits(fuse_shared_expert_params(params, CFG), CFG, ids, sl)
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(fused), atol=1e-5, rtol=1e-5)


def test_int8_fusion_close(ids_and_lens):
    ids, sl = ids_and_lens
    params = quantize_params(cdm.init_params(CFG, jax.random.PRNGKey(0)), CFG, "int8")
    base = _logits(params, CFG, ids, sl)
    fused = _logits(fuse_shared_expert_params(params, CFG), CFG, ids, sl)
    # joint requantization of the down projection perturbs within int8 noise
    rel = float(jnp.max(jnp.abs(base - fused)) / jnp.max(jnp.abs(base)))
    assert rel < 5e-3
    assert bool(jnp.all(jnp.argmax(base[:, -1], -1) == jnp.argmax(fused[:, -1], -1)))


def test_scalar_gates_fusion_exact(ids_and_lens):
    ids, sl = ids_and_lens
    cfg = dataclasses.replace(CFG, use_shared_routed_gates=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(1))
    base = _logits(params, cfg, ids, sl)
    fused = _logits(fuse_shared_expert_params(params, cfg), cfg, ids, sl)
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(fused), atol=1e-5, rtol=1e-5)


def test_fused_widths_lane_aligned():
    """Shared segment is zero-padded so the fused width is a multiple of 128
    whenever the routed width is (keeps the Pallas kernels eligible)."""
    cfg = dataclasses.replace(
        CFG, hidden_size=256, intermediate_size=512,
        shared_intermediate_size=200)
    params = quantize_params(cdm.init_params(cfg, jax.random.PRNGKey(2)), cfg, "int8")
    fused = fuse_shared_expert_params(params, cfg)
    gate = fused["layers"]["mlp"]["gate"]
    assert isinstance(gate, QTensor)
    w = gate.q.shape[-1]
    assert w % 128 == 0 and w > cfg.intermediate_size
    down = fused["layers"]["mlp"]["down"]
    assert down.q.shape[-2] == w


def test_fusion_idempotent_and_no_shared_noop():
    params = cdm.init_params(CFG, jax.random.PRNGKey(0))
    fused = fuse_shared_expert_params(params, CFG)
    assert "shared_gate" not in fused["layers"]["mlp"]
    again = fuse_shared_expert_params(fused, CFG)
    assert again is fused  # no shared keys left -> no-op

    cfg = dataclasses.replace(CFG, shared_expert=False)
    p2 = cdm.init_params(cfg, jax.random.PRNGKey(0))
    assert fuse_shared_expert_params(p2, cfg) is p2


def test_engine_greedy_identical_fused_vs_unfused():
    params = cdm.init_params(CFG, jax.random.PRNGKey(3))
    ecfg_kw = dict(
        max_batch_size=4, max_seq_len=64, kv_block_size=4, max_kv_blocks=64,
        max_prefill_tokens=32, decode_batch_buckets=(1, 2, 4),
        prefill_batch_buckets=(1, 2, 4), prefill_token_buckets=(8, 16, 32),
        multistep_decode=2,
    )
    e_off = Engine(params, CFG, EngineConfig(fuse_shared_expert=False, **ecfg_kw))
    e_on = Engine(params, CFG, EngineConfig(fuse_shared_expert=True, **ecfg_kw))
    prompts = [[5, 17, 42, 7], [9, 9, 1, 400, 23]]
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    for p in prompts:
        a = e_off.generate(p, sp).output_tokens
        b = e_on.generate(p, sp).output_tokens
        assert a == b


def test_gate_up_fusion_exact_both_paths():
    """fuse_gate_up_params: one concatenated gate|up weight must be
    bit-exact vs separate weights under W8A8 (single int8 GEMM + split)
    AND under weight-only dequant (weight split, two GEMMs)."""
    from vllm_i64_tpu.core.quantize_model import fuse_gate_up_params
    from vllm_i64_tpu.ops import dequant_matmul as dm

    params = quantize_params(cdm.init_params(CFG, jax.random.PRNGKey(5)), CFG, "int8")
    base_p = fuse_shared_expert_params(params, CFG)
    fused_p = fuse_gate_up_params(base_p)
    assert "gate_up" in fused_p["layers"]["mlp"]

    ids = jnp.asarray([[3, 7, 11, 200]], jnp.int32)
    sl = jnp.array([4], jnp.int32)
    for w8a8 in (False, True):
        dm.set_w8a8(w8a8)
        try:
            a = _logits(base_p, CFG, ids, sl)
            b = _logits(fused_p, CFG, ids, sl)
        finally:
            dm.set_w8a8(False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_applies_gate_up_only_with_w8a8():
    params = quantize_params(cdm.init_params(CFG, jax.random.PRNGKey(6)), CFG, "int8")
    kw = dict(max_batch_size=2, max_seq_len=32, kv_block_size=4,
              max_kv_blocks=32, max_prefill_tokens=16,
              decode_batch_buckets=(2,), prefill_batch_buckets=(2,),
              prefill_token_buckets=(16,), quantization="int8")
    on = Engine(params, CFG, EngineConfig(w8a8=True, **kw))
    off = Engine(params, CFG, EngineConfig(w8a8=False, **kw))
    assert "gate_up" in on.runner.params["layers"]["mlp"]
    assert "gate_up" not in off.runner.params["layers"]["mlp"]


def test_fusion_composes_with_fuse_qkv():
    params = quantize_params(cdm.init_params(CFG, jax.random.PRNGKey(4)), CFG, "int8")
    both = fuse_shared_expert_params(fuse_qkv_params(params), CFG)
    assert "qkv" in both["layers"] and "shared_gate" not in both["layers"]["mlp"]
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    sl = jnp.array([4], jnp.int32)
    base = _logits(params, CFG, ids, sl)
    fused = _logits(both, CFG, ids, sl)
    rel = float(jnp.max(jnp.abs(base - fused)) / jnp.max(jnp.abs(base)))
    assert rel < 5e-3
