"""Fused INT8-weight dequant GEMM.

TPU-native analog of the reference's fused dequant kernels
(ref: csrc/I64_gemm.cu:1-60 `I64_gemm_dequant_int8`,
kernels/triton/I64_fused_dequant_gemm.py:96): int8 weights are read from HBM
at 1 byte/weight, widened in VMEM, fed to the MXU, and the per-output-channel
scale is applied to the accumulator — the weight never exists in float in HBM.

Two implementations:
- ``_dequant_matmul_xla``: convert+dot, letting XLA fuse the convert into the
  dot operand. Correct everywhere (CPU tests), and surprisingly good.
- ``_dequant_matmul_pallas``: explicit Pallas kernel with K-tiled accumulation,
  used on TPU for aligned shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QTensor

_PALLAS_ENABLED = True

# W8A8: dynamically quantize activations per row and run native INT8xINT8
# MXU matmuls (ref: core/quantization.py:119-224 `int8_linear_native` —
# torch._int_mm INT8xINT8->INT32 with per-token activation scales). On v5e
# the MXU's int8 path has 2x the bf16 macs/cycle, so compute-bound prefill
# GEMMs can double; decode GEMMs are weight-bandwidth-bound and unchanged.
# Set via `set_w8a8` BEFORE the first dispatch — jitted programs capture the
# flag at trace time.
_W8A8 = False


def set_w8a8(enabled: bool) -> None:
    global _W8A8
    _W8A8 = bool(enabled)


def w8a8_enabled() -> bool:
    return _W8A8


# Fused rmsnorm+int8-quant feeding the W8A8 GEMMs (EngineConfig.
# fused_norm_quant); set per dispatch by the runner like the W8A8 flag.
_FUSED_NORM_QUANT = False


def set_fused_norm_quant(enabled: bool) -> None:
    global _FUSED_NORM_QUANT
    _FUSED_NORM_QUANT = bool(enabled)


def fused_norm_quant_enabled() -> bool:
    return _FUSED_NORM_QUANT


def int8_dot_rescale(xq: jax.Array, xs: jax.Array, w: QTensor) -> jax.Array:
    """(q(x) @ w.q) rescaled by activation-row x weight-column scales.

    The ONE implementation of the W8A8 epilogue (int32 accumulator ->
    f32 * xs * w.s), shared by int8_int8_matmul and the fused-SwiGLU W8A8
    branch so the rescale semantics cannot diverge."""
    acc = jax.lax.dot_general(
        xq, w.q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * xs * w.s.astype(jnp.float32)[None, :]


def int8_int8_matmul(x: jax.Array, w: QTensor) -> jax.Array:
    """y = x @ dequant(w) computed as (q(x) @ w.q) * (row_scale * col_scale).

    Per-row symmetric activation quantization; the int32 accumulator is
    rescaled by the outer product of activation and weight scales.
    """
    from .quant import quantize_activations_int8

    orig = x.shape
    x2 = x.reshape(-1, orig[-1])
    xq, xs = quantize_activations_int8(x2)  # (M, K) i8, (M, 1) f32
    out = int8_dot_rescale(xq, xs, w)
    return out.astype(x.dtype).reshape(*orig[:-1], w.q.shape[-1])


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _dequant_matmul_xla(x: jax.Array, w: QTensor) -> jax.Array:
    acc = jnp.dot(x, w.q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (acc * w.s.astype(jnp.float32)).astype(x.dtype)


def _dm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    """Grid (M/tm, N/tn, K/tk); K innermost so acc lives across K steps."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xt = x_ref[:]
    wt = q_ref[:].astype(xt.dtype)
    acc_ref[:] += jnp.dot(xt, wt, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def _dequant_matmul_pallas(
    x: jax.Array, q: jax.Array, s: jax.Array, tm: int, tn: int, tk: int
) -> jax.Array:
    m, k = x.shape
    _, n = q.shape
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    return pl.pallas_call(
        functools.partial(_dm_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, q, s.reshape(1, n))


def _pick_tile(dim: int, target: int) -> int:
    t = min(dim, target)
    while dim % t != 0:
        t //= 2
    return max(t, 1)


def dequant_matmul(x: jax.Array, w: QTensor) -> jax.Array:
    """x @ dequant(w) for x of shape (..., K), w.q of shape (K, N)."""
    orig_shape = x.shape
    k = orig_shape[-1]
    n = w.q.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    use_pallas = (
        _PALLAS_ENABLED
        and _on_tpu()
        and w.q.ndim == 2
        and w.q.dtype == jnp.int8
        and m % 8 == 0
        and k % 128 == 0
        and n % 128 == 0
    )
    if use_pallas:
        tm = _pick_tile(m, 256)
        tn = _pick_tile(n, 512)
        tk = _pick_tile(k, 512)
        out = _dequant_matmul_pallas(x2, w.q, w.s, tm, tn, tk)
    else:
        out = _dequant_matmul_xla(x2, w)
    return out.reshape(*orig_shape[:-1], n)
