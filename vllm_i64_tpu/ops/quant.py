"""Quantized tensor container + quantize/dequantize math.

TPU-native replacement for the reference INT8 path
(ref: vllm_i64/core/quantization.py:80-116 — per-channel symmetric INT8 with
scale = abs_max / 127, round + clamp to [-128, 127]).

Weights are stored as ``QTensor(q=int8, s=f32 per-out-channel scale)``; the
fused dequant-GEMM lives in ops/dequant_matmul.py (Pallas) with an XLA
fallback here. Scale semantics match the reference bit-for-bit so perplexity
parity holds at the same bit width.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QTensor:
    """Per-channel symmetric quantized tensor.

    q: integer payload (int8 or packed int4-in-int8), logical shape (..., in, out)
    s: float32 scales broadcastable against the matmul *output* axis.

    For a weight of shape (in, out), s has shape (out,): scales apply per
    output channel, so dequant commutes with the matmul:
        x @ (q * s) == (x @ q) * s
    which is what makes the int8 MXU path exact.
    """

    __slots__ = ("q", "s")

    def __init__(self, q, s):
        self.q = q
        self.s = s

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype

    def tree_flatten(self):
        return (self.q, self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return f"QTensor(q={self.q.shape}:{self.q.dtype}, s={self.s.shape})"


def quantize_int8(w: jax.Array, axis: int = -2) -> QTensor:
    """Per-output-channel symmetric INT8 quantization.

    ``axis`` is the contraction (input) axis that gets reduced in the matmul;
    scales are computed by reducing |w| over it. For a (in, out) weight use
    axis=-2 (the default), giving per-out-channel scales of shape (out,).

    Matches ref core/quantization.py:80-91: scale = abs_max/127 (min 1e-8),
    q = clamp(round(w/scale), -128, 127).
    """
    w = w.astype(jnp.float32)
    abs_max = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(abs_max / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -128, 127).astype(jnp.int8)
    return QTensor(q=q, s=jnp.squeeze(scale, axis=axis))


def dequantize(qt: QTensor, dtype=jnp.float32, axis: int = -2) -> jax.Array:
    """Materialize the float weight (test/debug path only)."""
    s = jnp.expand_dims(qt.s, axis=axis)
    return (qt.q.astype(jnp.float32) * s).astype(dtype)


def quantize_activations_int8(x: jax.Array):
    """Dynamic per-token (per-row) INT8 activation quantization.

    Mirrors ref core/quantization.py:103-116. Returns (q_int8, row_scale_f32).
    """
    x = x.astype(jnp.float32)
    abs_max = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(abs_max / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return q, scale
