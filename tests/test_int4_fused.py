"""Fused int4 dequant GEMM path (ops/int4_matmul.py).

Parity targets: the dequantize_int4 + matmul reference semantics
(ref: vllm_i64/core/quantization.py:307-421 — the GPU in-kernel int4
dequant GEMM these kernels replace) and the engine-level int4 serving path.
Kernels run in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.ops.int4_matmul import _eligible, int4_matmul, int4_swiglu
from vllm_i64_tpu.ops.quant import (
    PreQuantActs,
    Q4Tensor,
    dequantize_int4,
    quantize_activations_int8,
    quantize_int4,
    repack_int4_split,
)

rng = np.random.default_rng(7)


def _mk(k, n, scale=0.02):
    return jnp.asarray(rng.normal(size=(k, n)) * scale, jnp.float32)


class TestSplitLayout:
    def test_split_layout_dequant_identical(self):
        w = _mk(512, 256)
        qi = quantize_int4(w)
        qs = repack_int4_split(qi)
        assert qs.layout == "split"
        np.testing.assert_array_equal(
            np.asarray(dequantize_int4(qi)), np.asarray(dequantize_int4(qs)))

    def test_direct_split_quantization_matches_repack(self):
        w = _mk(512, 256)
        direct = quantize_int4(w, layout="split")
        repacked = repack_int4_split(quantize_int4(w))
        np.testing.assert_array_equal(
            np.asarray(direct.packed), np.asarray(repacked.packed))

    def test_repack_idempotent(self):
        qs = repack_int4_split(quantize_int4(_mk(256, 128)))
        assert repack_int4_split(qs) is qs

    def test_repack_stacked_layers(self):
        w = jnp.asarray(rng.normal(size=(3, 256, 128)) * 0.02, jnp.float32)
        qi = quantize_int4(w)
        qs = repack_int4_split(qi)
        np.testing.assert_array_equal(
            np.asarray(dequantize_int4(qi)), np.asarray(dequantize_int4(qs)))

    def test_pytree_roundtrip_keeps_layout(self):
        qs = repack_int4_split(quantize_int4(_mk(256, 128)))
        leaves, treedef = jax.tree_util.tree_flatten(qs)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert back.layout == "split"
        assert back.group_size == qs.group_size


class TestKernelParity:
    def test_float_x_matmul(self):
        w = _mk(1024, 512)
        x = jnp.asarray(rng.normal(size=(16, 1024)), jnp.float32)
        q4 = repack_int4_split(quantize_int4(w))
        ref = np.asarray(x) @ np.asarray(dequantize_int4(q4))
        out = np.asarray(int4_matmul(x, q4, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_w4a8_matmul_matches_quantized_reference(self):
        w = _mk(512, 384 if False else 512)
        x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
        q4 = repack_int4_split(quantize_int4(w))
        xq, xs = quantize_activations_int8(x)
        pq = PreQuantActs(xq, xs, x.shape, x.dtype)
        ref = (np.asarray(xq, np.float64) * np.asarray(xs)) @ np.asarray(
            dequantize_int4(q4), np.float64)
        out = np.asarray(int4_matmul(pq, q4, interpret=True), np.float64)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_swiglu_float_and_w4a8(self):
        g, u = _mk(512, 256), _mk(512, 256)
        x = jnp.asarray(rng.normal(size=(8, 512)), jnp.float32)
        qg = repack_int4_split(quantize_int4(g))
        qu = repack_int4_split(quantize_int4(u))
        gd = np.asarray(x) @ np.asarray(dequantize_int4(qg))
        ud = np.asarray(x) @ np.asarray(dequantize_int4(qu))
        ref = gd / (1 + np.exp(-gd)) * ud
        out = np.asarray(int4_swiglu(x, qg, qu, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

        xq, xs = quantize_activations_int8(x)
        pq = PreQuantActs(xq, xs, x.shape, x.dtype)
        xd = np.asarray(xq, np.float64) * np.asarray(xs)
        gd = xd @ np.asarray(dequantize_int4(qg), np.float64)
        ud = xd @ np.asarray(dequantize_int4(qu), np.float64)
        ref8 = gd / (1 + np.exp(-gd)) * ud
        out8 = np.asarray(int4_swiglu(pq, qg, qu, interpret=True), np.float64)
        np.testing.assert_allclose(out8, ref8, rtol=1e-4, atol=1e-5)

    def test_multi_group_kstep_odd_group_count(self):
        # 3 groups: K-step spans all 3 (not a power-of-4 count)
        w = _mk(384, 256)
        x = jnp.asarray(rng.normal(size=(8, 384)), jnp.float32)
        q4 = repack_int4_split(quantize_int4(w))
        ref = np.asarray(x) @ np.asarray(dequantize_int4(q4))
        out = np.asarray(int4_matmul(x, q4, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_fallback_interleaved_layout(self):
        # interleaved (reference/AWQ) layout is NOT kernel-eligible; the
        # dequantize fallback must be used and stay correct
        w = _mk(256, 128)
        x = jnp.asarray(rng.normal(size=(4, 256)), jnp.float32)
        q4 = quantize_int4(w)
        assert not _eligible(q4, 8)
        ref = np.asarray(x) @ np.asarray(dequantize_int4(q4))
        out = np.asarray(int4_matmul(x, q4))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_fallback_unaligned_n(self):
        w = _mk(256, 200)  # N % 128 != 0
        x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
        q4 = repack_int4_split(quantize_int4(w))
        assert not _eligible(q4, 8)
        out = np.asarray(int4_matmul(x, q4))
        ref = np.asarray(x) @ np.asarray(dequantize_int4(q4))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


class TestEngineInt4:
    """End-to-end int4 serving through the engine (CPU fallback paths)."""

    def _cfg(self):
        from vllm_i64_tpu.config import ModelConfig

        return ModelConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, num_experts=4,
            max_position_embeddings=256,
        )

    def test_engine_quantizes_after_fusion_and_generates(self):
        from vllm_i64_tpu.config import EngineConfig
        from vllm_i64_tpu.core.sampling import SamplingParams
        from vllm_i64_tpu.engine import Engine
        from vllm_i64_tpu.models import complexity_deep as cdm
        from vllm_i64_tpu.ops.quant import Q4Tensor

        cfg = self._cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(0))
        ecfg = EngineConfig(max_batch_size=2, max_seq_len=128,
                            kv_block_size=16, max_kv_blocks=64,
                            quantization="int4")
        eng = Engine(params, cfg, ecfg)
        # fused qkv quantized as ONE int4 tensor in serving (split) layout
        qkv = eng.runner.params["layers"]["qkv"]
        assert isinstance(qkv, Q4Tensor) and qkv.layout == "split"
        mlp = eng.runner.params["layers"]["mlp"]
        assert isinstance(mlp["gate"], Q4Tensor)
        # shared expert folded in -> widths are 128-aligned beyond E*I
        assert mlp["gate"].packed.shape[-1] % 128 == 0
        assert mlp["gate"].packed.shape[-1] > cfg.intermediate_size
        assert "shared_gate" not in mlp

        res = eng.generate([5, 6, 7, 8], SamplingParams(
            temperature=0.0, max_tokens=6))
        assert len(res.output_tokens) == 6

    def test_int4_forward_close_to_dequantized_reference(self):
        """The int4-served model's logits match a float model built from the
        SAME dequantized int4 weights (flat-quantization grouping equals
        per-expert grouping when the group size divides the expert width)."""
        from vllm_i64_tpu.core.quantize_model import quantize_params
        from vllm_i64_tpu.models import complexity_deep as cdm
        from vllm_i64_tpu.ops.quant import Q4Tensor

        cfg = self._cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(1))
        qparams = quantize_params(params, cfg, "int4")

        def deq_stacked(x, *, stacked_in=None):
            w = dequantize_int4(x, jnp.float32)
            return w

        # float reference: dequantize each Q4 leaf; the flat MoE layouts go
        # back to stacked (L, E, H, I) / (L, E, I, H) so the float model
        # code can serve them
        L, E = cfg.num_hidden_layers, cfg.num_experts
        H, EI = cfg.hidden_size, cfg.intermediate_size
        I = EI // E
        fparams = jax.tree_util.tree_map(
            lambda x: dequantize_int4(x, jnp.float32)
            if isinstance(x, Q4Tensor) else x,
            qparams, is_leaf=lambda x: isinstance(x, Q4Tensor))
        mlp = dict(fparams["layers"]["mlp"])
        for key in ("gate", "up"):
            mlp[key] = mlp[key].reshape(L, H, E, I).transpose(0, 2, 1, 3)
        mlp["down"] = mlp["down"].reshape(L, E, I, H)
        layers = dict(fparams["layers"])
        layers["mlp"] = mlp
        fparams = dict(fparams)
        fparams["layers"] = layers

        tokens = jnp.asarray([[3, 11, 42, 7, 19, 200, 8, 9]], jnp.int32)
        got = cdm.forward(qparams, cfg, tokens)
        ref = cdm.forward(fparams, cfg, tokens)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=2e-3)


class TestQ4FuseQkv:
    def test_fuse_qkv_threads_layout(self):
        from vllm_i64_tpu.core.quantize_model import fuse_qkv_params

        h, hq, hkv = 256, 256, 128
        params = {"layers": {
            "q": quantize_int4(_mk(h, hq), layout="split"),
            "k": quantize_int4(_mk(h, hkv), layout="split"),
            "v": quantize_int4(_mk(h, hkv), layout="split"),
        }}
        out = fuse_qkv_params(params)
        qkv = out["layers"]["qkv"]
        assert isinstance(qkv, Q4Tensor)
        assert qkv.layout == "split"
        assert qkv.packed.shape == (h // 2, hq + 2 * hkv)
