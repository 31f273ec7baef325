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


def _round_to_bf16_grid(x: jax.Array) -> jax.Array:
    """f32 -> f32 snapped to the bf16 grid, round-to-nearest-even.

    Explicit bit manipulation rather than astype(bf16).astype(f32)
    (elided by XLA's simplifier in interpret mode) or
    lax.reduce_precision (no Mosaic TPU lowering). Matches hardware
    f32->bf16 conversion for finite values; NaNs stay NaN."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    lsb = (u >> 16) & jnp.uint32(1)
    u = (u + jnp.uint32(0x7FFF) + lsb) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _fused_swiglu_quant_kernel(
    xq_ref, xs_ref, g_ref, u_ref, gs_ref, us_ref, m_ref,
    oq_ref, os_ref, accg_ref, accu_ref, prod_ref, rmax_ref,
    *, n_n: int, n_k: int,
):
    """Grid (M/tm, N/ti, K/tk), M outer, K inner. int8 x int8 MXU dots
    accumulate in int32; at each column tile's K end the SwiGLU+mask
    product lands in a persistent (tm, I) bf16 scratch and the running row
    max updates; each row tile's final instance quantizes its whole
    product to int8 + row scales. (The M axis makes prefill-sized M
    possible — scratch stays (tm, I), not (M, I).)

    Numerics are BIT-IDENTICAL to the unfused chain: product cast to the
    output dtype before the f32 row-max/round (matching
    quantize_activations_int8 over the bf16 intermediate)."""
    n, k = pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _init_acc():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    @pl.when((n == 0) & (k == 0))
    def _init_rmax():
        rmax_ref[:] = jnp.zeros_like(rmax_ref)

    xt = xq_ref[:]
    accg_ref[:] += jnp.dot(xt, g_ref[:], preferred_element_type=jnp.int32)
    accu_ref[:] += jnp.dot(xt, u_ref[:], preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _tile_done():
        xs = xs_ref[:].astype(jnp.float32)  # (M, 1)
        gate = accg_ref[:].astype(jnp.float32) * xs * gs_ref[:].astype(jnp.float32)
        up = accu_ref[:].astype(jnp.float32) * xs * us_ref[:].astype(jnp.float32)
        # cast order mirrors the unfused path: silu*up -> bf16, then f32
        # mask multiply, then bf16 (token_routed_mlp shared-fold tail);
        # the explicit bf16-grid round can't be elided in either mode
        p = _round_to_bf16_grid(jax.nn.silu(gate) * up)
        p = _round_to_bf16_grid(p * m_ref[:].astype(jnp.float32))
        ti = p.shape[1]
        prod_ref[:, pl.ds(n * ti, ti)] = p.astype(prod_ref.dtype)
        rmax_ref[:] = jnp.maximum(
            rmax_ref[:],
            jnp.max(jnp.abs(p), axis=1, keepdims=True))

    @pl.when((n == n_n - 1) & (k == n_k - 1))
    def _emit():
        # multiply by the reciprocal, NOT divide: XLA's algebraic
        # simplifier rewrites x/const -> x*(1/const) in the unfused
        # quantize_activations_int8, and Mosaic keeps a true divide —
        # match the rewrite so the scales agree to the last ulp
        scale = jnp.maximum(
            rmax_ref[:] * jnp.float32(1.0 / 127.0), 1e-8)  # (M, 1)
        os_ref[:] = scale
        pf = prod_ref[:].astype(jnp.float32)
        oq_ref[:] = jnp.clip(
            jnp.round(pf / scale), -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("tm", "ti", "tk", "interpret"))
def _fused_swiglu_quant_pallas(xq, xs, wq, ws, mask, tm, ti, tk,
                               interpret=False):
    m, k = xq.shape
    w2 = wq.shape[1]
    w = w2 // 2
    n_m, n_n, n_k = m // tm, w // ti, k // tk
    grid = (n_m, n_n, n_k)
    return pl.pallas_call(
        functools.partial(_fused_swiglu_quant_kernel, n_n=n_n, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda mi, a, c: (mi, c),
                         memory_space=pltpu.VMEM),  # xq
            pl.BlockSpec((tm, 1), lambda mi, a, c: (mi, 0),
                         memory_space=pltpu.VMEM),  # xs
            pl.BlockSpec((tk, ti), lambda mi, a, c: (c, a),
                         memory_space=pltpu.VMEM),  # gate cols
            pl.BlockSpec((tk, ti), lambda mi, a, c: (c, a + n_n),
                         memory_space=pltpu.VMEM),  # up cols
            pl.BlockSpec((1, ti), lambda mi, a, c: (0, a),
                         memory_space=pltpu.VMEM),  # gate scales (pre-sliced)
            pl.BlockSpec((1, ti), lambda mi, a, c: (0, a),
                         memory_space=pltpu.VMEM),  # up scales (pre-sliced)
            pl.BlockSpec((tm, ti), lambda mi, a, c: (mi, a),
                         memory_space=pltpu.VMEM),  # mask cols
        ],
        out_specs=(
            pl.BlockSpec((tm, w), lambda mi, a, c: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda mi, a, c: (mi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, w), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, ti), jnp.int32),
            pltpu.VMEM((tm, ti), jnp.int32),
            pltpu.VMEM((tm, w), jnp.bfloat16),
            pltpu.VMEM((tm, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * w * k,
            bytes_accessed=m * k + 2 * k * w + 2 * m * w,
            transcendentals=m * w,
        ),
        interpret=interpret,
    )(xq, xs, wq, wq, ws[None, :w], ws[None, w:], mask)


# sub-256-row decode/mixed dispatches can route through the fused epilogue;
# prefill shapes keep the XLA chain (compute-bound, XLA pipelines better).
# The M cap is a scoped-VMEM budget: pallas I/O is stack-allocated, and the
# f32 mask (M, W) + bf16 product scratch dominate — m=512 at W=4096
# measured 19.8 MB > the 16 MB limit on v5e.
#
# DEFAULT OFF (opt in via VLLM_I64_TPU_SWIGLU_QUANT=1): isolated at the
# engine shape (m=64, k=1024, w=4096) the kernel wins (1.34 vs ~1.4-2.3 ms
# per 20 calls), but in the compiled decode window it measured +0.33
# ms/iter WORSE on v5e (tools/tpu_decode_ablate.py no_merge floor 6.80 vs
# 6.47, 2026-08-20) — XLA loses cross-op fusion/scheduling freedom around
# the opaque pallas call, the same serialization that keeps the int4
# kernel's isolated -31% from appearing in-engine (see DESIGN.md).
import os as _os

_SWIGLU_QUANT_MAX_M = 256
_SWIGLU_QUANT = _os.environ.get("VLLM_I64_TPU_SWIGLU_QUANT", "0") == "1"
# PREFILL regime (m >= this): the r5 M-tiled kernel admits prefill-sized
# dispatches, where the XLA chain's f32 (M, 2I) gate_up intermediate is
# pure HBM traffic (268 MB at M=8192 — fusion.216/217 were ~1.05 ms of a
# ~3.5 ms layer in the r5 trace). Gated separately from the decode flag so
# the regimes A/B independently.
_SWIGLU_QUANT_PREFILL_MIN_M = 1024
_SWIGLU_QUANT_PREFILL = _os.environ.get(
    "VLLM_I64_TPU_SWIGLU_QUANT_PREFILL", "0") == "1"


def set_swiglu_quant(enabled: bool) -> None:
    global _SWIGLU_QUANT
    _SWIGLU_QUANT = bool(enabled)


def set_swiglu_quant_prefill(enabled: bool) -> None:
    global _SWIGLU_QUANT_PREFILL
    _SWIGLU_QUANT_PREFILL = bool(enabled)


def fused_swiglu_quant_eligible(x, gate_w, m: int, w2: int, k: int) -> bool:
    from .quant import PreQuantActs

    if not isinstance(x, PreQuantActs):
        return False
    if m <= _SWIGLU_QUANT_MAX_M:
        if not _SWIGLU_QUANT:
            return False
    elif not (_SWIGLU_QUANT_PREFILL and m >= _SWIGLU_QUANT_PREFILL_MIN_M
              and m % 256 == 0):
        return False
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False
    import os

    interp = os.environ.get("VLLM_I64_TPU_PALLAS_INTERPRET") == "1"
    return (
        (on_tpu or interp)
        and isinstance(gate_w, QTensor)
        and gate_w.q.ndim == 2
        and gate_w.q.dtype == jnp.int8
        and m % 32 == 0  # int8 sublane tile
        and k % 128 == 0
        and w2 % 256 == 0  # each half lane-aligned
    )


def fused_swiglu_quant(x, gate_up_w: QTensor, mask: jax.Array,
                       *, interpret: bool = False):
    """SwiGLU + routing-mask multiply + per-row int8 quantize, fused into
    the gate_up W8A8 GEMM's epilogue. Returns PreQuantActs for the down
    GEMM — the (M, W) intermediate never round-trips HBM in bf16 and the
    separate row-max/round XLA passes disappear (the decode act-quantize
    chain measured ~30% of GEMM time on v5e, tools/tpu_gemm_probe.py).

    ``x`` must be PreQuantActs (the fused-norm-quant producer);
    ``gate_up_w`` the flat concatenated [gate|up] int8 QTensor;
    ``mask`` the (M, W) f32 routing/output-scale mask (token_routed_mlp
    builds it for the shared-fold layout)."""
    from .quant import PreQuantActs

    xq, xs = x.rows()
    m, k = xq.shape
    w2 = gate_up_w.q.shape[1]
    w = w2 // 2
    tm = _pick_tile(m, 256)
    ti = _pick_tile(w, 512)
    tk = _pick_tile(k, 512)
    oq, os_ = _fused_swiglu_quant_pallas(
        xq, xs, gate_up_w.q, gate_up_w.s.astype(jnp.float32), mask,
        tm, ti, tk, interpret=interpret)
    return PreQuantActs(oq, os_, (m, w), x.dtype)


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
