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


@jax.tree_util.register_pytree_node_class
class Q4Tensor:
    """Per-group asymmetric INT4, packed two nibbles per uint8.

    Logical weight shape (in, out); groups run over the *input* axis
    (ref: core/quantization.py:307-421 — group_size=128, scale=(max-min)/15,
    zero=round(-min/scale)).

    Two pack layouts over the input axis (``layout``):
    - "interleaved" (default; matches the reference/AWQ unpack order):
      packed row i stores nibbles for input rows 2i (high) and 2i+1 (low).
    - "split" (TPU serving layout, ops/int4_matmul.py): within each group g
      of ``group_size`` rows, packed row g*gs/2+j stores rows g*gs+j (high)
      and g*gs+gs/2+j (low) — unpacking is then ONE sublane concat with no
      row interleave, which is what lets the Pallas kernel dequantize in
      register at full VPU rate. Numerics are identical; convert with
      ``repack_int4_split``.

    packed: (in // 2, out) uint8
    scales: (num_groups, out) f32
    zeros:  (num_groups, out) f32 (stored dequant-ready)
    """

    __slots__ = ("packed", "scales", "zeros", "group_size", "layout")

    def __init__(self, packed, scales, zeros, group_size=128,
                 layout="interleaved"):
        self.packed = packed
        self.scales = scales
        self.zeros = zeros
        self.group_size = group_size
        self.layout = layout

    @property
    def shape(self):
        *lead, half, out = self.packed.shape
        return (*lead, half * 2, out)

    def tree_flatten(self):
        return (self.packed, self.scales, self.zeros), (self.group_size,
                                                        self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if isinstance(aux, tuple):
            gs, layout = aux
        else:  # pre-layout pickles
            gs, layout = aux, "interleaved"
        return cls(*children, group_size=gs, layout=layout)

    def __repr__(self):
        return (f"Q4Tensor(packed={self.packed.shape}, "
                f"groups={self.scales.shape[-2]}, gs={self.group_size}, "
                f"{self.layout})")


def quantize_int4(w: jax.Array, group_size: int = 128,
                  layout: str = "interleaved") -> Q4Tensor:
    """Per-group asymmetric 4-bit quantization of a (..., in, out) weight."""
    w = w.astype(jnp.float32)
    *lead, n_in, n_out = w.shape
    if n_in % group_size:
        raise ValueError(f"in dim {n_in} not divisible by group {group_size}")
    g = n_in // group_size
    wg = w.reshape(*lead, g, group_size, n_out)
    w_min = jnp.min(wg, axis=-2)
    w_max = jnp.max(wg, axis=-2)
    scale = jnp.maximum((w_max - w_min) / 15.0, 1e-8)  # (..., g, out)
    zero = jnp.clip(jnp.round(-w_min / scale), 0, 15)
    q = jnp.clip(jnp.round(wg / scale[..., None, :] + zero[..., None, :]),
                 0, 15)
    q = q.astype(jnp.uint8).reshape(*lead, n_in, n_out)
    packed = _pack_nibbles(q, group_size, layout)
    return Q4Tensor(packed=packed, scales=scale, zeros=zero,
                    group_size=group_size, layout=layout)


def _pack_nibbles(q: jax.Array, group_size: int, layout: str) -> jax.Array:
    """Pack (..., in, out) uint8 nibble values two-per-byte on the in axis."""
    *lead, n_in, n_out = q.shape
    if layout == "interleaved":
        return (q[..., 0::2, :] << 4) | q[..., 1::2, :]
    if layout == "split":
        g = n_in // group_size
        qg = q.reshape(*lead, g, group_size, n_out)
        hi = qg[..., : group_size // 2, :]
        lo = qg[..., group_size // 2:, :]
        return ((hi << 4) | lo).reshape(*lead, n_in // 2, n_out)
    raise ValueError(f"unknown int4 layout {layout!r}")


def _unpack_nibbles(qt: Q4Tensor) -> jax.Array:
    """(..., in, out) uint8 nibble values from either pack layout."""
    *lead, half, n_out = qt.packed.shape
    n_in = half * 2
    high = (qt.packed >> 4) & 0xF
    low = qt.packed & 0xF
    if qt.layout == "interleaved":
        return jnp.stack([high, low], axis=-2).reshape(*lead, n_in, n_out)
    g = n_in // qt.group_size
    hg = high.reshape(*lead, g, qt.group_size // 2, n_out)
    lg = low.reshape(*lead, g, qt.group_size // 2, n_out)
    return jnp.concatenate([hg, lg], axis=-2).reshape(*lead, n_in, n_out)


def repack_int4_split(qt: Q4Tensor) -> Q4Tensor:
    """Convert to the TPU serving ("split") layout — identical numerics."""
    if qt.layout == "split":
        return qt
    q = _unpack_nibbles(qt)
    return Q4Tensor(
        packed=_pack_nibbles(q, qt.group_size, "split"),
        scales=qt.scales, zeros=qt.zeros,
        group_size=qt.group_size, layout="split",
    )


def dequantize_int4(qt: Q4Tensor, dtype=jnp.float32) -> jax.Array:
    *lead, half, n_out = qt.packed.shape
    n_in = half * 2
    q = _unpack_nibbles(qt)
    g = qt.scales.shape[-2]
    qg = q.astype(jnp.float32).reshape(*lead, g, qt.group_size, n_out)
    w = (qg - qt.zeros[..., None, :]) * qt.scales[..., None, :]
    return w.reshape(*lead, n_in, n_out).astype(dtype)


def quantize_fp8(w: jax.Array, axis: int = -2) -> QTensor:
    """Per-out-channel scaled float8_e4m3 weights (ref: core/fp8.py).
    Same QTensor container; the payload dtype distinguishes the path."""
    w = w.astype(jnp.float32)
    abs_max = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(abs_max / 448.0, 1e-8)  # e4m3 max normal = 448
    q = (w / scale).astype(jnp.float8_e4m3fn)
    return QTensor(q=q, s=jnp.squeeze(scale, axis=axis))


@jax.tree_util.register_pytree_node_class
class PreQuantActs:
    """Activations already quantized to per-row int8 (by the fused
    rmsnorm+quant kernel) — flows INTO the W8A8 GEMMs so they skip their
    own quantize (ref analog: kernels/triton/I64_fused_rmsnorm_quant.py
    emits (int8, scale) straight into the int8 GEMM).

    q: (M, H) int8, s: (M, 1) f32 row scales; ``shape``/``dtype`` mirror the
    float tensor this stands for, so shape-generic call sites keep working.
    Consumers that cannot use the int8 form dequantize via ``to_float``
    (identical numerics to quantizing inside the GEMM)."""

    __slots__ = ("q", "s", "shape", "dtype")

    def __init__(self, q, s, shape, dtype):
        self.q = q
        self.s = s
        self.shape = tuple(shape)
        self.dtype = dtype

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return PreQuantActs(self.q, self.s, shape, self.dtype)

    def to_float(self) -> jax.Array:
        x = (self.q.astype(jnp.float32) * self.s).astype(self.dtype)
        return x.reshape(self.shape)

    def rows(self) -> tuple:
        """(q (M, H) int8, s (M, 1) f32) for a 2-D consumer."""
        return self.q, self.s

    def tree_flatten(self):
        return (self.q, self.s), (self.shape, self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, shape=aux[0], dtype=aux[1])


def quantize_activations_int8(x: jax.Array):
    """Dynamic per-token (per-row) INT8 activation quantization.

    Mirrors ref core/quantization.py:103-116. Returns (q_int8, row_scale_f32).

    The scale uses an explicit multiply by 1/127 rather than a divide:
    XLA's algebraic simplifier applies that rewrite on some backends but
    not inside Pallas kernels, and the fused epilogue
    (ops/fused_swiglu.fused_swiglu_quant) must produce bit-identical
    scales on every backend.
    """
    x = x.astype(jnp.float32)
    abs_max = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(abs_max * jnp.float32(1.0 / 127.0), 1e-8)
    q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return q, scale
