"""RMSNorm and RoPE.

These are deliberately plain jnp: XLA fuses the normalize into neighboring
elementwise ops and the matmul epilogue/prologue, which is exactly what the
reference needed hand-written kernels for on GPU
(ref: csrc/I64_rmsnorm.cu fused RMSNorm, csrc/I64_rope.cu fused RoPE).
A fused RMSNorm+int8-activation-quant Pallas kernel (analog of
I64_fused_rmsnorm_quant.py) lives in ops/act_quant.py for the int8 MXU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm with fp32 statistics (ref: nn.RMSNorm semantics,
    complexity_deep/model.py:313)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float = 10000.0):
    """cos/sin tables for rotate-half RoPE.

    positions: integer array of any shape P. Returns (cos, sin) of shape
    P + (head_dim,) with the [freqs, freqs] duplication layout
    (ref: complexity_deep/model.py:27-37).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # P + (hd/2,)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # P + (hd,)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE. x: (..., heads, head_dim); cos/sin: (..., head_dim)
    broadcast over the heads axis (ref: complexity_deep/model.py:40-51)."""
    cos = cos[..., None, :].astype(x.dtype)
    sin = sin[..., None, :].astype(x.dtype)
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin
