"""Integer fixed-point ops — LUT activations, integer softmax/rmsnorm/rope.

JAX parity implementations of the reference's "integers everywhere"
numerics (ref: vllm_i64/layers/integer_activations.py, moe.py:39-82
softmax_integer, rmsnorm.py:88-110, rotary.py:1-60, csrc/I64_softmax.cu).
On TPU these are gathers + integer VPU math; the tables are tiny
device-resident constants.

Fixed-point conventions (identical to the reference):
- activations:  Q7 (x128) over [-8, 8], 2049-entry LUTs
- exp for softmax: input Q7 clamped to [-1024, 0], output Q16 (1025 entries)
- rmsnorm weight:  Q12 int16; normalized x in Q7 -> product Q19
- rope cos/sin:    Q14 int16 tables; input Q7 -> rotation in Q21
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Q7 = 128
Q12 = 4096
Q14 = 16384
Q16 = 1 << 16
_LUT_MIN = -1024
_LUT_MAX = 1024


@functools.lru_cache(maxsize=None)
def _silu_lut() -> np.ndarray:
    idx = np.arange(_LUT_MIN, _LUT_MAX + 1, dtype=np.float32)
    x = idx / Q7
    return np.round(x / (1.0 + np.exp(-x)) * Q7).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _sigmoid_lut() -> np.ndarray:
    idx = np.arange(_LUT_MIN, _LUT_MAX + 1, dtype=np.float32)
    return np.round(1.0 / (1.0 + np.exp(-idx / Q7)) * Q7).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _softplus_lut() -> np.ndarray:
    idx = np.arange(_LUT_MIN, _LUT_MAX + 1, dtype=np.float32)
    return np.round(np.log1p(np.exp(idx / Q7)) * Q7).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _exp_lut() -> np.ndarray:
    """exp(i/128) * 2^16 for i in [-1024, 0] (ref: moe.py:44-48,
    csrc/I64_softmax.cu __constant__ table)."""
    idx = np.arange(_LUT_MIN, 1, dtype=np.float32)
    return (np.exp(idx / Q7) * Q16).astype(np.int32)


def _lut_apply(x_q7: jax.Array, lut: np.ndarray,
               above, below) -> jax.Array:
    """Clamp to LUT range, gather, patch the out-of-range tails."""
    x_q7 = x_q7.astype(jnp.int32)
    clamped = jnp.clip(x_q7, _LUT_MIN, _LUT_MAX)
    out = jnp.take(jnp.asarray(lut), clamped - _LUT_MIN)
    out = jnp.where(x_q7 > _LUT_MAX, above(x_q7), out)
    out = jnp.where(x_q7 < _LUT_MIN, below(x_q7), out)
    return out


def silu_integer(x_q7: jax.Array) -> jax.Array:
    """Q7 -> Q7 SiLU; silu(x) ~ x above 8, ~ 0 below -8
    (ref: integer_activations.py silu_integer)."""
    return _lut_apply(x_q7, _silu_lut(),
                      above=lambda x: x, below=jnp.zeros_like)


def sigmoid_integer(x_q7: jax.Array) -> jax.Array:
    return _lut_apply(x_q7, _sigmoid_lut(),
                      above=lambda x: jnp.full_like(x, Q7),
                      below=jnp.zeros_like)


def softplus_integer(x_q7: jax.Array) -> jax.Array:
    return _lut_apply(x_q7, _softplus_lut(),
                      above=lambda x: x, below=jnp.zeros_like)


def silu_multiply_integer(gate: jax.Array, up: jax.Array) -> jax.Array:
    """float -> float silu(gate)*up computed in INT32 fixed point
    (Q7 x Q7 -> Q14; ref: integer_activations.py silu_multiply_integer)."""
    gate_q7 = jnp.round(gate.astype(jnp.float32) * Q7).astype(jnp.int32)
    up_q7 = jnp.round(up.astype(jnp.float32) * Q7).astype(jnp.int32)
    inter_q14 = silu_integer(gate_q7) * up_q7
    return inter_q14.astype(jnp.float32) / (Q7 * Q7)


def softmax_integer(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Fixed-point softmax, drop-in for jax.nn.softmax
    (ref: moe.py softmax_integer :39-82): Q7 quantize -> row-max subtract ->
    clamp [-1024, 0] -> Q16 exp LUT -> integer normalize."""
    q = jnp.round(logits.astype(jnp.float32) * Q7).astype(jnp.int32)
    shifted = q - jnp.max(q, axis=axis, keepdims=True)
    shifted = jnp.clip(shifted, _LUT_MIN, 0)
    exp_vals = jnp.take(jnp.asarray(_exp_lut()), shifted - _LUT_MIN)
    denom = jnp.maximum(jnp.sum(exp_vals, axis=axis, keepdims=True), 1)
    return exp_vals.astype(jnp.float32) / denom.astype(jnp.float32)


# ---------------------------------------------------------------------------
# integer rmsnorm / rope
# ---------------------------------------------------------------------------


def quantize_rmsnorm_weight(w: jax.Array) -> jax.Array:
    """Q12 int16 weight (ref: rmsnorm.py quantize_rmsnorm)."""
    return jnp.clip(jnp.round(w.astype(jnp.float32) * Q12),
                    -32768, 32767).astype(jnp.int16)


def rms_norm_integer(x: jax.Array, w_q12: jax.Array,
                     eps: float = 1e-6) -> jax.Array:
    """Float rsqrt (irreducible) + INT32 weight multiply
    (ref: rmsnorm.py:88-110): Q7 normalized x Q12 weight -> Q19."""
    xf = x.astype(jnp.float32)
    norm = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xn_q7 = jnp.round(xf * norm * Q7).astype(jnp.int32)
    out_q19 = xn_q7 * w_q12.astype(jnp.int32)
    return (out_q19.astype(jnp.float32) / (Q7 * Q12)).astype(x.dtype)


def build_rope_tables_integer(max_seq_len: int, dim: int,
                              theta: float = 10000.0
                              ) -> Tuple[jax.Array, jax.Array]:
    """Q14 int16 cos/sin tables (ref: rotary.py build_integer_tables)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(max_seq_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos = np.clip(np.round(np.cos(emb) * Q14), -32768, 32767).astype(np.int16)
    sin = np.clip(np.round(np.sin(emb) * Q14), -32768, 32767).astype(np.int16)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope_integer(x: jax.Array, cos_q14: jax.Array,
                       sin_q14: jax.Array) -> jax.Array:
    """Q7 input x Q14 tables -> Q21 rotation, dequantized to float
    (ref: csrc/I64_rope.cu:60-70, rotary.py forward_integer).

    x: (..., d); cos/sin: broadcastable (..., d) int16.
    """
    x_q7 = jnp.round(x.astype(jnp.float32) * Q7).astype(jnp.int32)
    d = x.shape[-1]
    x1, x2 = x_q7[..., : d // 2], x_q7[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    out_q21 = (x_q7 * cos_q14.astype(jnp.int32)
               + rot * sin_q14.astype(jnp.int32))
    return (out_q21.astype(jnp.float32) / (Q7 * Q14)).astype(x.dtype)
