"""Linear / matmul entry points that dispatch on weight representation.

All model matmuls go through ``linear`` so the quantization format is a
pure data question (plain array vs QTensor), not a model-code branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import QTensor


def linear(x: jax.Array, w, *, precision=None) -> jax.Array:
    """y = x @ w with w either a float array (in, out) or an int8 QTensor.

    Per-output-channel scales commute with the contraction, so the quantized
    path is (x @ q) * s — one MXU matmul with int8 weights loaded at
    1 byte/weight (the HBM-bandwidth win that I64_gemm.cu:1-60 gets on GPU).
    """
    from .quant import PreQuantActs, Q4Tensor

    if isinstance(w, Q4Tensor):
        # fused in-kernel dequant: the packed weight streams from HBM at
        # 0.5 byte/weight (ref: triton_fused_expert.py:502,
        # quantization.py:307-421 — the GPU in-kernel int4 dequant GEMMs)
        from .int4_matmul import int4_matmul

        return int4_matmul(x, w)
    if isinstance(x, PreQuantActs):
        # activations pre-quantized by the fused rmsnorm+quant kernel
        if isinstance(w, QTensor) and w.q.ndim == 2 and w.q.dtype == jnp.int8:
            from .dequant_matmul import int8_dot_rescale

            out = int8_dot_rescale(*x.rows(), w).astype(x.dtype)
            return out.reshape(*x.shape[:-1], out.shape[-1])
        x = x.to_float()  # non-int8 consumer: identical-numerics fallback
    if isinstance(w, QTensor):
        from .dequant_matmul import dequant_matmul, int8_int8_matmul, w8a8_enabled

        if w8a8_enabled() and w.q.ndim == 2 and w.q.dtype == jnp.int8:
            return int8_int8_matmul(x, w)
        return dequant_matmul(x, w)
    return jnp.dot(x, w, precision=precision, preferred_element_type=x.dtype)


def linear_f32(x: jax.Array, w) -> jax.Array:
    """Matmul with fp32 accumulation and fp32 output (for logits;
    ref computes tied-embedding logits in fp32: complexity_deep/model.py:436-439).
    """
    if isinstance(w, QTensor):
        from .dequant_matmul import dequant_matmul

        return dequant_matmul(x.astype(jnp.float32), w)
    # fp32 ACCUMULATION on the MXU without materializing an fp32 copy of
    # the weights: bf16 operands with preferred_element_type=f32 is the
    # native TPU path (upcasting the tied embedding costs a 131 MB HBM
    # round-trip per logits call). fp32 params still compute fully in fp32.
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)
