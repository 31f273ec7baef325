"""int4 serving across the feature matrix: AWQ-layout checkpoints, learned-
gate MoE, integer attention, fp8 KV, and fusion-flag combinations — every
path must serve through the engine-side quantize+repack pipeline
(ref int4 surface: vllm_i64/core/quantization.py:307-421, awq_gptq.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.quantize_model import quantize_params
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.ops.quant import Q4Tensor


def _cfg(**kw):
    base = dict(vocab_size=256, hidden_size=256, intermediate_size=512,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=128,
                num_experts=4, top_k=2, shared_expert=True)
    base.update(kw)
    return ModelConfig(**base)


def _ecfg(**kw):
    base = dict(max_batch_size=2, max_seq_len=64, kv_block_size=16,
                max_kv_blocks=32, max_prefill_tokens=32,
                decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
                prefill_token_buckets=(16,), multistep_decode=4,
                quantization="int4")
    base.update(kw)
    return EngineConfig(**base)


def _gen(eng, n=5):
    return eng.generate(
        list(range(7, 23)),
        SamplingParams(temperature=0.0, max_tokens=n)).output_tokens


def _q4_leaves(params):
    out = []

    def walk(x):
        if isinstance(x, Q4Tensor):
            out.append(x)
        return x

    jax.tree_util.tree_map(walk, params,
                           is_leaf=lambda x: isinstance(x, Q4Tensor))
    return out


class TestRepackPipeline:
    def test_prequantized_interleaved_params_get_repacked(self):
        """A checkpoint loaded as interleaved Q4 (the AWQ/GPTQ direct path)
        must serve through the split-layout kernels: engine init repacks
        every Q4 leaf."""
        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(0))
        qparams = quantize_params(params, cfg, "int4")  # interleaved
        assert all(q.layout == "interleaved" for q in _q4_leaves(qparams))
        eng = Engine(qparams, cfg, _ecfg(fuse_qkv=False,
                                         fuse_shared_expert=False))
        leaves = _q4_leaves(eng.runner.params)
        assert leaves and all(q.layout == "split" for q in leaves)
        assert len(_gen(eng)) == 5

    def test_engine_and_prequantized_outputs_match(self):
        """Serving engine-quantized vs pre-quantized (same fusion flags)
        must be numerically identical — the repack is layout-only."""
        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(1))
        e1 = Engine(params, cfg, _ecfg(fuse_qkv=False,
                                       fuse_shared_expert=False))
        e2 = Engine(quantize_params(params, cfg, "int4"), cfg,
                    _ecfg(fuse_qkv=False, fuse_shared_expert=False))
        assert _gen(e1) == _gen(e2)


class TestFeatureCombos:
    def test_int4_dense_model(self):
        cfg = _cfg(use_token_routed_mlp=False, num_experts=1,
                   shared_expert=False)
        params = cdm.init_params(cfg, jax.random.PRNGKey(2))
        eng = Engine(params, cfg, _ecfg())
        assert len(_gen(eng)) == 5

    def test_int4_learned_gate_moe(self):
        cfg = _cfg(use_token_routed_mlp=False,
                   routing_strategy="learned_gate", top_k=2)
        params = cdm.init_params(cfg, jax.random.PRNGKey(3))
        eng = Engine(params, cfg, _ecfg())
        assert len(_gen(eng)) == 5

    def test_int4_integer_attention(self):
        cfg = _cfg(use_integer_attention=True)
        params = cdm.init_params(cfg, jax.random.PRNGKey(4))
        eng = Engine(params, cfg, _ecfg())
        assert len(_gen(eng)) == 5

    def test_int4_fp8_kv_cache(self):
        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(5))
        eng = Engine(params, cfg, _ecfg(kv_cache_dtype="float8_e4m3fn",
                                        dtype="float32"))
        assert len(_gen(eng)) == 5

    def test_int4_without_w8a8(self):
        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(6))
        eng = Engine(params, cfg, _ecfg(w8a8=False,
                                        fused_norm_quant=False))
        assert len(_gen(eng)) == 5

    def test_int4_mu_guidance(self):
        cfg = _cfg(use_mu_guidance=True)
        params = cdm.init_params(cfg, jax.random.PRNGKey(7))
        eng = Engine(params, cfg, _ecfg())
        assert len(_gen(eng)) == 5


class TestShapeFallbacks:
    def test_unaligned_dims_fall_back_to_int8(self):
        """in-dims not divisible by the group size quantize as int8
        (quantize_params fallback) and still serve."""
        cfg = _cfg(hidden_size=192, intermediate_size=384,
                   num_attention_heads=4, num_key_value_heads=2)
        params = cdm.init_params(cfg, jax.random.PRNGKey(8))
        eng = Engine(params, cfg, _ecfg())
        assert len(_gen(eng)) == 5

    def test_int4_weight_bytes_halve(self):
        from vllm_i64_tpu.core.quantize_model import param_bytes

        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(9))
        e8 = Engine(params, cfg, _ecfg(quantization="int8"))
        e4 = Engine(params, cfg, _ecfg(quantization="int4"))
        b8 = param_bytes(e8.runner.params)
        b4 = param_bytes(e4.runner.params)
        # matmul payloads halve; embeddings/norms/scales stay, so the ratio
        # lands between 0.5 and 1
        assert b4 < 0.85 * b8
