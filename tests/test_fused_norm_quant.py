"""Fused rmsnorm + int8-activation-quant wiring (EngineConfig.
fused_norm_quant): the W8A8 step must produce BIT-IDENTICAL outputs with
the flag on and off — the fused path quantizes once per norm with the same
scale math the GEMMs would apply internally (ref analog:
kernels/triton/I64_fused_rmsnorm_quant.py feeding the int8 GEMM)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.quantize_model import quantize_params
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    num_experts=4,
    top_k=2,
    shared_expert=True,
)


def make_engine(params, fused: bool, multistep: int = 1):
    ecfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, kv_block_size=8, max_kv_blocks=32,
        max_prefill_tokens=32, dtype="float32", kv_cache_dtype="float32",
        quantization="int8", w8a8=True, fused_norm_quant=fused,
        decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
        prefill_token_buckets=(16,), multistep_decode=multistep,
        decode_chaining=False, enable_request_merging=False,
    )
    return Engine(params, CFG, ecfg)


def test_flag_is_bit_identical_under_w8a8():
    params = cdm.init_params(CFG, jax.random.PRNGKey(0))
    qp = quantize_params(params, CFG, "int8")
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    base = make_engine(qp, fused=False).generate(list(range(3, 15)), sp)
    fused = make_engine(qp, fused=True).generate(list(range(3, 15)), sp)
    assert fused.output_tokens == base.output_tokens


def test_flag_bit_identical_multistep_window():
    params = cdm.init_params(CFG, jax.random.PRNGKey(1))
    qp = quantize_params(params, CFG, "int8")
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    base = make_engine(qp, fused=False, multistep=4).generate(
        list(range(3, 15)), sp)
    fused = make_engine(qp, fused=True, multistep=4).generate(
        list(range(3, 15)), sp)
    assert fused.output_tokens == base.output_tokens


def test_prequant_linear_matches_inline_quant():
    """linear(PreQuantActs) == linear(float) under W8A8 for int8 weights."""
    from vllm_i64_tpu.ops.dequant_matmul import set_fused_norm_quant, set_w8a8
    from vllm_i64_tpu.ops.linear import linear
    from vllm_i64_tpu.ops.quant import (
        PreQuantActs,
        quantize_activations_int8,
        quantize_int8,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = quantize_int8(jnp.asarray(
        rng.standard_normal((64, 32)).astype(np.float32)))
    set_w8a8(True)
    try:
        want = np.asarray(linear(x, w))
        q, s = quantize_activations_int8(x)
        pre = PreQuantActs(q, s, (4, 64), x.dtype)
        got = np.asarray(linear(pre, w))
        np.testing.assert_array_equal(got, want)
    finally:
        set_w8a8(False)
        set_fused_norm_quant(False)


def test_prequant_falls_back_for_float_weights():
    from vllm_i64_tpu.ops.linear import linear
    from vllm_i64_tpu.ops.quant import PreQuantActs, quantize_activations_int8

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, s = quantize_activations_int8(x)
    pre = PreQuantActs(q, s, (4, 64), x.dtype)
    got = np.asarray(linear(pre, w))
    want = np.asarray(linear(pre.to_float(), w))
    np.testing.assert_array_equal(got, want)


def test_pallas_kernel_matches_xla_semantics():
    """rmsnorm_quant_pallas (interpret) == rms_norm + quantize_activations."""
    from vllm_i64_tpu.ops.fused_norm import rmsnorm_quant_pallas
    from vllm_i64_tpu.ops.norms import rms_norm
    from vllm_i64_tpu.ops.quant import quantize_activations_int8

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    qk, sk = rmsnorm_quant_pallas(x, w, 1e-6, interpret=True)
    qx, sx = quantize_activations_int8(rms_norm(x, w, 1e-6))
    np.testing.assert_array_equal(np.asarray(qk), np.asarray(qx))
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-7)
