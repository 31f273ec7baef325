"""INT4 / FP8 / AWQ-GPTQ import / fp8 KV / KV swap tests
(ref: core/quantization.py:307-421, core/fp8.py, core/awq_gptq.py,
core/kv_cache.py:711-831)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.awq_gptq import (
    QuantConfig,
    convert_quantized_state_dict,
    dequantize_awq_gptq,
    detect_quant_config,
)
from vllm_i64_tpu.core.quantize_model import quantize_params
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.ops.linear import linear
from vllm_i64_tpu.ops.quant import (
    Q4Tensor,
    dequantize_int4,
    quantize_fp8,
    quantize_int4,
)

# ---------------------------------------------------------------------------
# int4
# ---------------------------------------------------------------------------


def test_int4_roundtrip_error_bounded(rng):
    w = rng.standard_normal((256, 64)).astype(np.float32) * 0.1
    qt = quantize_int4(jnp.asarray(w), group_size=128)
    assert qt.packed.shape == (128, 64) and qt.packed.dtype == jnp.uint8
    deq = np.asarray(dequantize_int4(qt))
    # error bound: half a quantization step per group
    step = np.asarray(qt.scales).max()
    assert np.abs(deq - w).max() <= step * 0.51 + 1e-6


def test_int4_stacked_leading_dims(rng):
    w = rng.standard_normal((3, 2, 128, 32)).astype(np.float32)
    qt = quantize_int4(jnp.asarray(w), group_size=128)
    assert qt.shape == (3, 2, 128, 32)
    deq = np.asarray(dequantize_int4(qt))
    assert deq.shape == w.shape
    assert np.abs(deq - w).max() < np.asarray(qt.scales).max()


def test_int4_linear_dispatch(rng):
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.1
    qt = quantize_int4(jnp.asarray(w))
    got = np.asarray(linear(x, qt))
    want = np.asarray(x) @ np.asarray(dequantize_int4(qt))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# fp8
# ---------------------------------------------------------------------------


def test_fp8_quantize_and_linear(rng):
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.3
    qt = quantize_fp8(jnp.asarray(w))
    assert qt.q.dtype == jnp.float8_e4m3fn
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    got = np.asarray(linear(x, qt))
    want = np.asarray(x) @ w
    # e4m3 keeps ~4% per-element precision; over a K=128 reduction the
    # accumulated error is ~sqrt(K)*|w|*4% ≈ 0.14 std, so bound at ~3 sigma
    np.testing.assert_allclose(got, want, atol=0.45)
    # and the bulk must be tight
    assert np.abs(got - want).mean() < 0.08


def test_quantize_params_all_methods(tiny_config):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    for method in ("int8", "int4", "fp8"):
        qp = quantize_params(params, tiny_config, method)
        logits = cdm.forward(qp, tiny_config,
                             jnp.asarray([[5, 17, 42]], jnp.int32))
        assert bool(jnp.all(jnp.isfinite(logits))), method


def test_int4_engine_end_to_end(tiny_config):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    qp = quantize_params(params, tiny_config, "int4")
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=32, dtype="float32",
                        kv_cache_dtype="float32", quantization="int4",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,))
    eng = Engine(qp, tiny_config, ecfg)
    r = eng.generate([5, 17, 42], SamplingParams(temperature=0.0, max_tokens=4))
    assert len(r.output_tokens) >= 1


# ---------------------------------------------------------------------------
# AWQ / GPTQ import
# ---------------------------------------------------------------------------


def pack_rows_lsb(q: np.ndarray) -> np.ndarray:
    """(in, out) uint4 -> (in//8, out) int32, LSB-first (test helper)."""
    n_in, n_out = q.shape
    out = np.zeros((n_in // 8, n_out), np.uint32)
    for i in range(8):
        out |= q[i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def pack_cols_lsb(z: np.ndarray) -> np.ndarray:
    """(groups, out) uint4 -> (groups, out//8) int32, LSB-first."""
    g, n_out = z.shape
    out = np.zeros((g, n_out // 8), np.uint32)
    for i in range(8):
        out |= z[:, i::8].astype(np.uint32) << (4 * i)
    return out.astype(np.int32)


def test_awq_dequant_roundtrip(rng):
    n_in, n_out, gs = 256, 64, 128
    q = rng.integers(0, 16, (n_in, n_out)).astype(np.uint8)
    groups = n_in // gs
    scales = (rng.random((groups, n_out)).astype(np.float32) + 0.1) * 0.02
    zeros = rng.integers(1, 15, (groups, n_out)).astype(np.uint8)

    qweight = pack_rows_lsb(q)
    qzeros = pack_cols_lsb((zeros - 1).astype(np.uint8))  # packer subtracts 1
    cfg = QuantConfig(method="awq", bits=4, group_size=gs)
    w = dequantize_awq_gptq(qweight, scales, qzeros, None, cfg)
    want = ((q.reshape(groups, gs, n_out).astype(np.float32)
             - zeros[:, None]) * scales[:, None]).reshape(n_in, n_out)
    np.testing.assert_allclose(w, want, rtol=1e-6)


def test_gptq_desc_act_reorder(rng):
    n_in, n_out, gs = 256, 32, 128
    q = rng.integers(0, 16, (n_in, n_out)).astype(np.uint8)
    groups = n_in // gs
    scales = np.ones((groups, n_out), np.float32)
    zeros = np.full((groups, n_out), 8, np.uint8)
    perm = rng.permutation(n_in)
    g_idx = (perm // gs).astype(np.int32)  # channel i belongs to group of perm

    cfg = QuantConfig(method="gptq", bits=4, group_size=gs, desc_act=True)
    scales = rng.random((groups, n_out)).astype(np.float32) + 0.5
    w = dequantize_awq_gptq(pack_rows_lsb(q), scales,
                            pack_cols_lsb(zeros - 1), g_idx, cfg)
    # per-ROW group dequant: row i uses (scales/zeros)[g_idx[i]] with NO
    # reordering, so the weight stays aligned with the activations
    want = (q.astype(np.float32) - 8.0) * scales[g_idx]
    np.testing.assert_allclose(w, want)


def test_convert_quantized_state_dict(rng):
    cfg = QuantConfig(method="awq", bits=4, group_size=128)
    q = rng.integers(0, 16, (128, 64)).astype(np.uint8)
    sd = {
        "layers.0.self_attn.q_proj.qweight": pack_rows_lsb(q),
        "layers.0.self_attn.q_proj.qzeros": pack_cols_lsb(
            np.full((1, 64), 7, np.uint8)),
        "layers.0.self_attn.q_proj.scales": np.ones((1, 64), np.float32),
        "norm.weight": np.ones(16, np.float32),
    }
    out = convert_quantized_state_dict(sd, cfg, direct=False)
    assert "layers.0.self_attn.q_proj.weight" in out
    assert out["layers.0.self_attn.q_proj.weight"].shape == (64, 128)
    assert "layers.0.self_attn.q_proj.qweight" not in out
    assert "norm.weight" in out

    # direct path (default): still-int4 Q4Parts in (in, out) orientation,
    # bit-identical under dequant to the float conversion
    from vllm_i64_tpu.core.awq_gptq import Q4Parts

    out_d = convert_quantized_state_dict(sd, cfg)
    parts = out_d["layers.0.self_attn.q_proj.weight"]
    assert isinstance(parts, Q4Parts)
    assert parts.shape == (128, 64)
    gs = parts.group_size
    high = (parts.packed >> 4) & 0xF
    low = parts.packed & 0xF
    qq = np.stack([high, low], axis=1).reshape(128, 64).astype(np.float32)
    w_direct = ((qq.reshape(-1, gs, 64) - parts.zeros[:, None])
                * parts.scales[:, None]).reshape(128, 64)
    np.testing.assert_array_equal(
        w_direct, out["layers.0.self_attn.q_proj.weight"].T)


def test_detect_quant_config(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps({
        "quantization_config": {"quant_method": "awq", "bits": 4,
                                "group_size": 64}}))
    method, cfg = detect_quant_config(str(tmp_path))
    assert method == "awq" and cfg.group_size == 64
    (tmp_path / "config.json").write_text(json.dumps({"vocab_size": 10}))
    assert detect_quant_config(str(tmp_path)) is None


# ---------------------------------------------------------------------------
# fp8 KV cache + swap
# ---------------------------------------------------------------------------


def make_engine(tiny_config, **kw):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=32, dtype="float32",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,), **kw)
    return Engine(params, tiny_config, ecfg)


def test_fp8_kv_cache_generates(tiny_config):
    eng = make_engine(tiny_config, kv_cache_dtype="float8_e4m3fn")
    assert eng.runner.kv_k.dtype == jnp.float8_e4m3fn
    r = eng.generate([5, 17, 42], SamplingParams(temperature=0.0, max_tokens=4))
    assert len(r.output_tokens) >= 1


def test_fp8_auto_upgrade(tiny_config):
    eng = make_engine(tiny_config, kv_cache_dtype="float32", kv_fp8_auto=True)
    assert eng.runner.kv_k.dtype == jnp.float32
    # drive usage over 70% artificially
    taken = eng.scheduler.blocks.allocate(23)  # 23/31 > 0.7
    eng.generate([5, 6, 7], SamplingParams(temperature=0.0, max_tokens=2))
    assert eng.runner.kv_k.dtype == jnp.float8_e4m3fn
    eng.scheduler.blocks.free(taken)


def test_kv_swap_roundtrip(tiny_config):
    eng = make_engine(tiny_config)
    runner = eng.runner
    # write recognizable data into blocks 3 and 5
    runner.kv_k = runner.kv_k.at[:, 3].set(1.5)
    runner.kv_v = runner.kv_v.at[:, 5].set(-2.5)
    saved = runner.swap_out_blocks([3, 5])
    assert set(saved) == {3, 5}
    assert saved[3][0].shape[0] == tiny_config.num_hidden_layers
    runner.kv_k = runner.kv_k.at[:, [3, 5]].set(0.0)
    runner.kv_v = runner.kv_v.at[:, [3, 5]].set(0.0)
    # restore to different physical blocks
    runner.swap_in_blocks(saved, [7, 9])
    assert float(runner.kv_k[0, 7, 0, 0]) == 1.5
    assert float(runner.kv_v[0, 9, 0, 0]) == -2.5
    assert float(runner.kv_k[0, 3, 0, 0]) == 0.0


# ---------------------------------------------------------------------------
# W8A8: dynamic int8 activations into int8xint8 matmuls
# (ref: core/quantization.py:119-224 int8_linear_native,
#  :227-286 int8_fused_gate_up_native)
# ---------------------------------------------------------------------------


def test_w8a8_matmul_close_to_dequant(rng):
    from vllm_i64_tpu.ops.dequant_matmul import int8_int8_matmul
    from vllm_i64_tpu.ops.quant import dequantize, quantize_int8

    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    w = quantize_int8(jnp.asarray(rng.standard_normal((256, 128)), jnp.float32))
    got = np.asarray(int8_int8_matmul(x, w), np.float64)
    ref = np.asarray(x @ dequantize(w, jnp.float32), np.float64)
    # activation quantization adds ~1/255 per-element noise that averages
    # out over K=256; row cosine similarity is the robust check
    for r in range(got.shape[0]):
        cos = np.dot(got[r], ref[r]) / (
            np.linalg.norm(got[r]) * np.linalg.norm(ref[r]) + 1e-12)
        assert cos > 0.995, cos


def test_w8a8_fused_swiglu_close(rng):
    from vllm_i64_tpu.ops.dequant_matmul import set_w8a8
    from vllm_i64_tpu.ops.fused_swiglu import fused_swiglu
    from vllm_i64_tpu.ops.quant import quantize_int8

    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    g = quantize_int8(jnp.asarray(rng.standard_normal((256, 128)), jnp.float32))
    u = quantize_int8(jnp.asarray(rng.standard_normal((256, 128)), jnp.float32))
    ref = np.asarray(fused_swiglu(x, g, u), np.float64)
    set_w8a8(True)
    try:
        got = np.asarray(fused_swiglu(x, g, u), np.float64)
    finally:
        set_w8a8(False)
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12)
    assert cos > 0.99, cos


def test_w8a8_engine_end_to_end(tiny_config):
    from vllm_i64_tpu.ops.dequant_matmul import set_w8a8

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    qp = quantize_params(params, tiny_config, "int8")
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=32, dtype="float32",
                        kv_cache_dtype="float32", quantization="int8",
                        w8a8=True,
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,))
    try:
        eng = Engine(qp, tiny_config, ecfg)
        r = eng.generate([5, 17, 42],
                         SamplingParams(temperature=0.0, max_tokens=4))
        assert len(r.output_tokens) >= 1
        assert all(0 <= t < tiny_config.vocab_size for t in r.output_tokens)
    finally:
        set_w8a8(False)


def test_no_float_matmul_residue_any_prep_order(tiny_config):
    """EVERY param-prep ordering must leave zero un-quantized matmul
    weights. A pre-fused float gate_up was invisible to quantize_params
    (key not in _MLP_MATMUL_KEYS) and silently kept a 503 MB bf16 weight
    inside an 'int4' flagship model — the model streamed MORE bytes than
    int8 and every in-engine int4 measurement was invalid."""
    from vllm_i64_tpu.core.quantize_model import (
        fuse_gate_up_params, fuse_qkv_params, fuse_shared_expert_params,
        repack_int4_serving)
    from vllm_i64_tpu.ops.quant import Q4Tensor, QTensor

    def float_matmul_leaves(params):
        bad = []
        layers = params["layers"]
        for key, w in list(layers.items()) + list(layers["mlp"].items()):
            if key in ("mlp", "route_table") or not hasattr(w, "dtype"):
                continue
            if key.endswith("norm") or "mu_vec" in key or key == "gate_vec":
                continue
            if isinstance(w, (QTensor, Q4Tensor)):
                continue
            if hasattr(w, "ndim") and w.ndim >= 3:  # matmul-shaped
                bad.append(key)
        return bad

    for method in ("int8", "int4"):
        for fuse_first in (False, True):
            params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
            params = fuse_qkv_params(params)
            params = fuse_shared_expert_params(params, tiny_config)
            if fuse_first:
                # after the shared-expert fold the expert weights are flat
                # 3-d, so a float pre-fuse produces the 'gate_up' key
                # quantize_params must recognize
                params = fuse_gate_up_params(params)
                assert "gate_up" in params["layers"]["mlp"]
            params = quantize_params(params, tiny_config, method)
            params = repack_int4_serving(params)
            if not fuse_first:
                params = fuse_gate_up_params(params)
            bad = float_matmul_leaves(params)
            assert not bad, (
                f"{method} fuse_first={fuse_first}: float matmul leaves "
                f"survived quantization: {bad}")
