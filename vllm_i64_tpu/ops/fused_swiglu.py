"""Fused gate+up dequant GEMM -> SiLU(gate) * up, in one Pallas kernel.

TPU-native analog of the reference's fused kernels
(ref: csrc/I64_gemm.cu `I64_gemm_silu_int8` — gate+up GEMM feeding
SiLU(gate)·up without materializing the (M, 2I) intermediate;
kernels/triton_fused_expert.py:301 int8 inline-dequant variant).

The intermediate gate/up activations never touch HBM: both accumulators
live in VMEM scratch across the K loop, dequant scales apply at the end of
K, and only the (M, I) product is written out. HBM traffic drops from
(2·M·I reads + 2·M·I writes) to M·I writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QTensor


def _fused_swiglu_kernel(x_ref, g_ref, u_ref, gs_ref, us_ref, o_ref,
                         accg_ref, accu_ref, *, n_k: int):
    """Grid (M/tm, I/ti, K/tk), K innermost."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    xt = x_ref[:]
    accg_ref[:] += jnp.dot(xt, g_ref[:].astype(xt.dtype),
                           preferred_element_type=jnp.float32)
    accu_ref[:] += jnp.dot(xt, u_ref[:].astype(xt.dtype),
                           preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _done():
        gate = accg_ref[:] * gs_ref[:].astype(jnp.float32)
        up = accu_ref[:] * us_ref[:].astype(jnp.float32)
        o_ref[:] = (jax.nn.silu(gate) * up).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tm", "ti", "tk", "interpret"))
def _fused_swiglu_pallas(x, gq, uq, gs, us, tm, ti, tk, interpret=False):
    m, k = x.shape
    _, i = gq.shape
    n_k = k // tk
    grid = (m // tm, i // ti, n_k)
    return pl.pallas_call(
        functools.partial(_fused_swiglu_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda a, b, c: (a, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, ti), lambda a, b, c: (c, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, ti), lambda a, b, c: (c, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda a, b, c: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda a, b, c: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, ti), lambda a, b, c: (a, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, i), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, ti), jnp.float32),
            pltpu.VMEM((tm, ti), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * i * k,
            bytes_accessed=m * k * x.dtype.itemsize + 2 * k * i
            + m * i * x.dtype.itemsize,
            transcendentals=m * i,
        ),
        interpret=interpret,
    )(x, gq, uq, gs.reshape(1, i), us.reshape(1, i))


def _xla_fallback(x, gate_w, up_w):
    from .linear import linear

    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    g = linear(x, gate_w).astype(acc_t)
    u = linear(x, up_w).astype(acc_t)
    return (jax.nn.silu(g) * u).astype(x.dtype)


def _pick_tile(dim: int, target: int) -> int:
    t = min(dim, target)
    while dim % t:
        t //= 2
    return max(t, 1)


def fused_swiglu(x: jax.Array, gate_w, up_w, *,
                 force_pallas: bool = False,
                 interpret: bool = False) -> jax.Array:
    """SiLU(x @ gate) * (x @ up) for int8 QTensor or float weights.

    Pallas on TPU for aligned int8 shapes, XLA-fused fallback elsewhere.
    ``up_w=None`` means ``gate_w`` holds the CONCATENATED [gate|up] columns
    (core/quantize_model.fuse_gate_up_params): under W8A8 both halves ride
    one int8 GEMM and the product splits in-register; other paths split the
    weight and proceed as two GEMMs.
    """
    from .dequant_matmul import w8a8_enabled
    from .quant import PreQuantActs, Q4Tensor

    if isinstance(gate_w, Q4Tensor) and (up_w is None
                                         or isinstance(up_w, Q4Tensor)):
        # int4 weights: fused in-kernel dequant SwiGLU (both GEMMs stream
        # packed nibbles; ref: triton_fused_expert.py:502 INT4 variant)
        from .int4_matmul import int4_swiglu

        if up_w is None:
            w = gate_w.packed.shape[-1] // 2
            gate_w, up_w = (
                Q4Tensor(gate_w.packed[..., :w], gate_w.scales[..., :w],
                         gate_w.zeros[..., :w], gate_w.group_size,
                         gate_w.layout),
                Q4Tensor(gate_w.packed[..., w:], gate_w.scales[..., w:],
                         gate_w.zeros[..., w:], gate_w.group_size,
                         gate_w.layout),
            )
        return int4_swiglu(x, gate_w, up_w)

    if up_w is None:
        w = gate_w.q.shape[-1] // 2 if isinstance(gate_w, QTensor) \
            else gate_w.shape[-1] // 2
        if w8a8_enabled() and isinstance(gate_w, QTensor) \
                and gate_w.q.ndim == 2 and gate_w.q.dtype == jnp.int8:
            from .dequant_matmul import int8_dot_rescale
            from .quant import quantize_activations_int8

            orig = x.shape
            if isinstance(x, PreQuantActs):
                xq, xs = x.rows()  # pre-quantized by the fused norm kernel
                dt = x.dtype
            else:
                x2 = x.reshape(-1, orig[-1])
                xq, xs = quantize_activations_int8(x2)
                dt = x.dtype
            gu = int8_dot_rescale(xq, xs, gate_w)  # ONE GEMM for gate+up
            out = (jax.nn.silu(gu[:, :w]) * gu[:, w:]).astype(dt)
            return out.reshape(*orig[:-1], w)
        if isinstance(gate_w, QTensor):
            gate_w, up_w = (
                QTensor(gate_w.q[..., :w], gate_w.s[..., :w]),
                QTensor(gate_w.q[..., w:], gate_w.s[..., w:]),
            )
        else:
            gate_w, up_w = gate_w[..., :w], gate_w[..., w:]

    if (
        not force_pallas
        and w8a8_enabled()
        and isinstance(gate_w, QTensor)
        and isinstance(up_w, QTensor)
        and gate_w.q.ndim == 2
        and gate_w.q.dtype == jnp.int8
    ):
        # W8A8: quantize x ONCE, both GEMMs run int8xint8 on the MXU's
        # double-rate int8 path (ref: quantization.py:227-286
        # `int8_fused_gate_up_native`). XLA fuses the rescale+silu+mul
        # epilogue into the matmul outputs.
        from .dequant_matmul import int8_dot_rescale
        from .quant import quantize_activations_int8

        orig = x.shape
        if isinstance(x, PreQuantActs):
            xq, xs = x.rows()
        else:
            x2 = x.reshape(-1, orig[-1])
            xq, xs = quantize_activations_int8(x2)  # quantize ONCE, 2 GEMMs
        g = int8_dot_rescale(xq, xs, gate_w)
        u = int8_dot_rescale(xq, xs, up_w)
        out = (jax.nn.silu(g) * u).astype(x.dtype)
        return out.reshape(*orig[:-1], gate_w.q.shape[-1])

    if isinstance(x, PreQuantActs):
        x = x.to_float()  # non-W8A8 consumer: identical-numerics fallback
    use_pallas = force_pallas or (
        isinstance(gate_w, QTensor)
        and isinstance(up_w, QTensor)
        and jax.default_backend() not in ("cpu",)
    )
    if use_pallas and isinstance(gate_w, QTensor):
        orig = x.shape
        x2 = x.reshape(-1, orig[-1])
        m, k = x2.shape
        i = gate_w.q.shape[-1]
        if m % 8 == 0 and k % 128 == 0 and i % 128 == 0:
            out = _fused_swiglu_pallas(
                x2, gate_w.q, up_w.q, gate_w.s, up_w.s,
                _pick_tile(m, 256), _pick_tile(i, 512), _pick_tile(k, 512),
                interpret=interpret,
            )
            return out.reshape(*orig[:-1], i)
    return _xla_fallback(x, gate_w, up_w)
