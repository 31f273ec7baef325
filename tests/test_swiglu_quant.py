"""Fused SwiGLU + routing-mask + int8-quantize epilogue
(ops/fused_swiglu.fused_swiglu_quant, decode lever of VERDICT r3 #2).

The kernel must be BIT-identical to the unfused chain it replaces:
int8 gate_up GEMM -> rescale -> silu*up -> bf16 -> mask multiply -> bf16
-> quantize_activations_int8.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.ops import fused_swiglu as fsw
from vllm_i64_tpu.ops.dequant_matmul import (
    int8_dot_rescale,
    set_w8a8,
    w8a8_enabled,
)
from vllm_i64_tpu.ops.moe import token_routed_mlp
from vllm_i64_tpu.ops.quant import (
    PreQuantActs,
    QTensor,
    quantize_activations_int8,
    quantize_int8,
)

M, K, W = 32, 256, 512  # W = flat [gate|up] half-width


@pytest.fixture(autouse=True)
def _interpret_and_w8a8():
    prev = os.environ.get("VLLM_I64_TPU_PALLAS_INTERPRET")
    os.environ["VLLM_I64_TPU_PALLAS_INTERPRET"] = "1"
    was = w8a8_enabled()
    set_w8a8(True)
    was_sq = fsw._SWIGLU_QUANT
    fsw.set_swiglu_quant(True)  # default OFF (measured in-engine loss)
    yield
    fsw.set_swiglu_quant(was_sq)
    set_w8a8(was)
    if prev is None:
        os.environ.pop("VLLM_I64_TPU_PALLAS_INTERPRET", None)
    else:
        os.environ["VLLM_I64_TPU_PALLAS_INTERPRET"] = prev


def make_inputs(seed=0, m=M, k=K, w=W):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    xq, xs = quantize_activations_int8(x)
    pre = PreQuantActs(xq, xs, (m, k), jnp.bfloat16)
    wf = jnp.asarray(rng.standard_normal((k, 2 * w)) * 0.05, jnp.float32)
    gate_up = quantize_int8(wf)
    mask = jnp.asarray(
        rng.choice([0.0, 0.5, 1.0], size=(m, w)), jnp.float32)
    return pre, gate_up, mask


def unfused_chain(pre, gate_up, mask):
    xq, xs = pre.rows()
    w = gate_up.q.shape[1] // 2
    gu = int8_dot_rescale(xq, xs, gate_up)
    inter = (jax.nn.silu(gu[:, :w]) * gu[:, w:]).astype(jnp.bfloat16)
    inter = (inter.astype(jnp.float32) * mask).astype(jnp.bfloat16)
    return quantize_activations_int8(inter)


class TestKernelExactness:
    def test_bit_exact_vs_unfused(self):
        pre, gate_up, mask = make_inputs()
        got = fsw.fused_swiglu_quant(pre, gate_up, mask, interpret=True)
        want_q, want_s = unfused_chain(pre, gate_up, mask)
        np.testing.assert_array_equal(np.asarray(got.q), np.asarray(want_q))
        np.testing.assert_allclose(np.asarray(got.s), np.asarray(want_s),
                                   rtol=0, atol=0)

    def test_bit_exact_multiple_tile_shapes(self):
        # 1024 rows exercises the r5 M grid axis (multiple 256-row tiles,
        # per-tile row-max/quantize) that admits prefill-sized dispatches
        for m, k, w in ((32, 128, 256), (64, 512, 1024), (96, 256, 768),
                        (1024, 256, 512)):
            pre, gate_up, mask = make_inputs(seed=m + k, m=m, k=k, w=w)
            got = fsw.fused_swiglu_quant(pre, gate_up, mask, interpret=True)
            want_q, want_s = unfused_chain(pre, gate_up, mask)
            np.testing.assert_array_equal(
                np.asarray(got.q), np.asarray(want_q),
                err_msg=f"m={m} k={k} w={w}")

    def test_eligibility_gates(self):
        pre, gate_up, _ = make_inputs()
        assert fsw.fused_swiglu_quant_eligible(pre, gate_up, M, 2 * W, K)
        # float (non-prequant) input: not eligible
        assert not fsw.fused_swiglu_quant_eligible(
            jnp.zeros((M, K), jnp.bfloat16), gate_up, M, 2 * W, K)
        # misaligned rows / cols: not eligible
        assert not fsw.fused_swiglu_quant_eligible(pre, gate_up, 33, 2 * W, K)
        assert not fsw.fused_swiglu_quant_eligible(pre, gate_up, M, 2 * W + 8, K)
        # flag off
        fsw.set_swiglu_quant(False)
        try:
            assert not fsw.fused_swiglu_quant_eligible(
                pre, gate_up, M, 2 * W, K)
        finally:
            fsw.set_swiglu_quant(True)


class TestMoEIntegration:
    def make_mlp(self, seed=1):
        """Flat shared-fold layout: E=2 experts x i_size=128 + shared 256."""
        rng = np.random.default_rng(seed)
        E, i_size, shared = 2, 128, 256
        w_half = E * i_size + shared  # 512
        k = K
        wf = jnp.asarray(rng.standard_normal((k, 2 * w_half)) * 0.05,
                         jnp.float32)
        gate_up = quantize_int8(wf)
        down = quantize_int8(
            jnp.asarray(rng.standard_normal((w_half, k)) * 0.05, jnp.float32))
        table = jnp.asarray(
            np.stack([(np.arange(64) + r) % E for r in range(2)]))
        return gate_up, down, table, E, shared

    def run_mlp(self, pre, gate_up, down, table, E, shared):
        return np.asarray(token_routed_mlp(
            pre,
            jnp.asarray(np.arange(M) % 64, jnp.int32),
            gate_w=gate_up, up_w=None, down_w=down,
            topk_table=table, num_experts=E, vocab_size=64,
            primary_weight=0.6, routed_output_scale=0.9,
            shared_output_scale=1.1, shared_fused_cols=shared))

    def test_token_routed_mlp_fused_matches_unfused(self):
        gate_up, down, table, E, shared = self.make_mlp()
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        xq, xs = quantize_activations_int8(x)
        pre = PreQuantActs(xq, xs, (M, K), jnp.bfloat16)

        got = self.run_mlp(pre, gate_up, down, table, E, shared)
        fsw.set_swiglu_quant(False)
        try:
            want = self.run_mlp(pre, gate_up, down, table, E, shared)
        finally:
            fsw.set_swiglu_quant(True)
        np.testing.assert_array_equal(got, want)
