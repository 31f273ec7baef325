"""Fused RMSNorm and RMSNorm+INT8-quant Pallas kernels.

TPU-native analog of the reference's fused norm kernels
(ref: csrc/I64_rmsnorm.cu:1-20 — one kernel instead of three;
kernels/triton/I64_fused_rmsnorm_quant.py:117,156 — fused norm + per-row
activation quant emitting (int8, scale)).

One grid row-block per program; the row dimension is tiled, the feature
dimension stays whole in VMEM (H is 1-4k for these models — well under the
VMEM budget). On CPU backends the XLA fallback runs instead (tests exercise
the kernels in interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# rmsnorm
# ---------------------------------------------------------------------------


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "tm", "interpret"))
def rmsnorm_pallas(x: jax.Array, w: jax.Array, eps: float = 1e-6,
                   tm: int = 256, interpret: bool = False) -> jax.Array:
    """x: (M, H), w: (H,) -> (M, H). M must divide by tm (callers pad)."""
    m, h = x.shape
    tm = min(tm, m)
    while m % tm:
        tm //= 2
    return pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h), x.dtype),
        interpret=interpret,
    )(x, w.reshape(1, h))


# ---------------------------------------------------------------------------
# rmsnorm + per-row int8 activation quant
# ---------------------------------------------------------------------------


def _rmsnorm_quant_kernel(x_ref, w_ref, q_ref, s_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    # identical semantics to quant.quantize_activations_int8 — W8A8
    # numerics must not depend on which kernel dispatched
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(y / scale), -128, 127)
    q_ref[:] = q.astype(jnp.int8)
    s_ref[:] = scale.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "tm", "interpret"))
def rmsnorm_quant_pallas(x: jax.Array, w: jax.Array, eps: float = 1e-6,
                         tm: int = 256, interpret: bool = False):
    """Fused rmsnorm -> per-row symmetric int8 quant.
    Returns (q (M, H) int8, scale (M, 1) f32)."""
    m, h = x.shape
    tm = min(tm, m)
    while m % tm:
        tm //= 2
    return pl.pallas_call(
        functools.partial(_rmsnorm_quant_kernel, eps=eps),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, h), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x, w.reshape(1, h))
