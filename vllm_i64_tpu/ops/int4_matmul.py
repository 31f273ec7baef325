"""Fused INT4-weight dequant GEMM — weights stream from HBM at 0.5 byte/weight.

TPU-native analog of the reference's in-kernel int4 dequant GEMMs
(ref: vllm_i64/kernels/triton_fused_expert.py:502 INT4 fused expert;
vllm_i64/core/quantization.py:307-421 vectorized int4 dequant GEMM): the
packed nibbles are unpacked IN REGISTER per tile, the per-group asymmetric
scale/zero applies to the accumulator, and the float weight never exists in
HBM. This replaces the ops/linear.py path that materialized the full float
weight via dequantize_int4 (zero bandwidth benefit) — int4 decode is
weight-bandwidth-bound, so halving weight bytes is the dominant lever
(ROADMAP speed-of-light model: ~240 GB/s int8 stream on v5e ⇒ byte-halving
is the only remaining decode win).

Serving layout ("split", see ops/quant.Q4Tensor): within each group of
``group_size`` input rows, packed row j holds original rows ``g*gs + j``
(high nibble) and ``g*gs + gs/2 + j`` (low nibble). Unpacking is then one
sublane concat — hi rows land directly above lo rows in original order, so
the x tile needs no rearrangement (the reference/AWQ "interleaved" 2i/2i+1
layout would need a per-row interleave, which the VPU does not do cheaply).

Grid structure: (M/tm, N/tn, K/tk) with tk spanning SEVERAL quant groups
(default 4 x 128): one 0.5-byte/weight DMA per step, a static subgroup loop
applies each group's scale/zero to the accumulator. Per-group 128-wide dots
alone (tk == gs) measured slower than the int8 path on v5e — grid overhead
and half-width MXU contractions ate the bandwidth win.

Two activation modes:
- float-x: dequant-to-bf16-in-register, bf16 MXU dot. Numerically identical
  to dequantize_int4 + jnp.dot (modulo f32 accumulation).
- W4A8 (``w8a8`` engine flag): per-row int8 activations, int8×int8 MXU dot
  (nibbles 0..15 fit int8) at the MXU's double int8 rate — the int4 analog
  of the reference's torch._int_mm path (quantization.py:119-224). The
  asymmetric zero-point folds into a per-group rank-1 correction:
      y = Σ_g s_g ⊙ (x_g @ q_g) − Σ_g (Σ_k x_g[k]) · (s_g z_g)
  computed on the int32 accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import Q4Tensor


def _unpack_sub(p_ref, sub: int, gs: int, dtype):
    """Subgroup ``sub``'s (gs, tn) nibble values from the packed K-step tile.

    Split layout: high nibbles are the group's first gs/2 original rows,
    low nibbles the second half — one sublane concat restores row order.
    """
    gs2 = gs // 2
    p = p_ref[sub * gs2:(sub + 1) * gs2].astype(jnp.int32)
    hi = ((p >> 4) & 15).astype(dtype)
    lo = (p & 15).astype(dtype)
    return jnp.concatenate([hi, lo], axis=0)


# --- float-x single-weight kernel -------------------------------------------


def _dequant_step_weights(p_ref, s_ref, sz_ref, n_sub: int, gs: int, dtype):
    """Dequantize the whole K-step's weight tile to ``dtype`` in register:
    (tk, tn) = concat over subgroups of (nibbles * s_g - s_g*z_g).

    Used by the compute-bound (prefill) kernels: the VPU dequant cost is
    per WEIGHT element, amortized over many query rows, and buys one
    full-contraction MXU dot per K-step instead of n_sub 128-deep dots
    (128-deep int8 dots measured ~2x off the MXU's int8 rate on v5e)."""
    parts = []
    for sub in range(n_sub):
        nib = _unpack_sub(p_ref, sub, gs, jnp.float32)  # (gs, tn)
        wsub = nib * s_ref[0, sub][None] - sz_ref[0, sub][None]
        parts.append(wsub.astype(dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _mm_kernel(x_ref, p_ref, s_ref, sz_ref, o_ref, acc_ref,
               *, n_k: int, n_sub: int, gs: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xt = x_ref[:]
    w = _dequant_step_weights(p_ref, s_ref, sz_ref, n_sub, gs, xt.dtype)
    acc_ref[:] += jnp.dot(xt, w, preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tm", "tn", "tk", "gs", "interpret"))
def _mm_pallas(x, packed, s3, sz3, tm, tn, tk, gs, interpret=False):
    m, k = x.shape
    n = packed.shape[1]
    n_k = k // tk
    n_sub = tk // gs
    return pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k, n_sub=n_sub, gs=gs),
        grid=(m // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, n_sub, tn), lambda i, j, kk: (kk, 0, j)),
            pl.BlockSpec((1, n_sub, tn), lambda i, j, kk: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n // 2
            + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, packed, s3, sz3)


# --- W4A8 single-weight kernel -----------------------------------------------


def _mm_w4a8_kernel(xq_ref, xs_ref, p_ref, s_ref, sz_ref, o_ref, acc_ref,
                    *, n_k: int, n_sub: int, gs: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for sub in range(n_sub):
        xq = xq_ref[:, sub * gs:(sub + 1) * gs]
        w = _unpack_sub(p_ref, sub, gs, jnp.int8)
        part = jnp.dot(xq, w, preferred_element_type=jnp.int32)
        xqsum = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
        acc_ref[:] += (part.astype(jnp.float32) * s_ref[0, sub][None]
                       - xqsum.astype(jnp.float32) * sz_ref[0, sub][None])

    @pl.when(kk == n_k - 1)
    def _done():
        # per-row activation scale factors out of every group: apply once
        o_ref[:] = (acc_ref[:] * xs_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "gs",
                                             "out_dtype", "interpret"))
def _mm_w4a8_pallas(xq, xs, packed, s3, sz3, tm, tn, tk, gs, out_dtype,
                    interpret=False):
    m, k = xq.shape
    n = packed.shape[1]
    n_k = k // tk
    n_sub = tk // gs
    return pl.pallas_call(
        functools.partial(_mm_w4a8_kernel, n_k=n_k, n_sub=n_sub, gs=gs),
        grid=(m // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tm, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, n_sub, tn), lambda i, j, kk: (kk, 0, j)),
            pl.BlockSpec((1, n_sub, tn), lambda i, j, kk: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n // 2 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xs, packed, s3, sz3)


# --- fused gate+up SwiGLU kernels ---------------------------------------------


def _swiglu_kernel(x_ref, pg_ref, pu_ref, sg_ref, szg_ref, su_ref, szu_ref,
                   o_ref, accg_ref, accu_ref, *, n_k: int, n_sub: int,
                   gs: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    xt = x_ref[:]
    wg = _dequant_step_weights(pg_ref, sg_ref, szg_ref, n_sub, gs, xt.dtype)
    accg_ref[:] += jnp.dot(xt, wg, preferred_element_type=jnp.float32)
    wu = _dequant_step_weights(pu_ref, su_ref, szu_ref, n_sub, gs, xt.dtype)
    accu_ref[:] += jnp.dot(xt, wu, preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _done():
        o_ref[:] = (jax.nn.silu(accg_ref[:]) * accu_ref[:]).astype(o_ref.dtype)


def _swiglu_w4a8_kernel(xq_ref, xs_ref, pg_ref, pu_ref, sg_ref, szg_ref,
                        su_ref, szu_ref, o_ref, accg_ref, accu_ref,
                        *, n_k: int, n_sub: int, gs: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        accg_ref[:] = jnp.zeros_like(accg_ref)
        accu_ref[:] = jnp.zeros_like(accu_ref)

    for sub in range(n_sub):
        xq = xq_ref[:, sub * gs:(sub + 1) * gs]
        xqsum = jnp.sum(xq.astype(jnp.int32), axis=1,
                        keepdims=True).astype(jnp.float32)
        wg = _unpack_sub(pg_ref, sub, gs, jnp.int8)
        partg = jnp.dot(xq, wg, preferred_element_type=jnp.int32)
        accg_ref[:] += (partg.astype(jnp.float32) * sg_ref[0, sub][None]
                        - xqsum * szg_ref[0, sub][None])
        wu = _unpack_sub(pu_ref, sub, gs, jnp.int8)
        partu = jnp.dot(xq, wu, preferred_element_type=jnp.int32)
        accu_ref[:] += (partu.astype(jnp.float32) * su_ref[0, sub][None]
                        - xqsum * szu_ref[0, sub][None])

    @pl.when(kk == n_k - 1)
    def _done():
        xs = xs_ref[:]
        gate = accg_ref[:] * xs
        up = accu_ref[:] * xs
        o_ref[:] = (jax.nn.silu(gate) * up).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tm", "tn", "tk", "gs", "interpret"))
def _swiglu_pallas(x, pg, pu, sg3, szg3, su3, szu3, tm, tn, tk, gs,
                   interpret=False):
    m, k = x.shape
    n = pg.shape[1]
    n_k = k // tk
    n_sub = tk // gs
    wspec = pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j))
    sspec = pl.BlockSpec((1, n_sub, tn), lambda i, j, kk: (kk, 0, j))
    return pl.pallas_call(
        functools.partial(_swiglu_kernel, n_k=n_k, n_sub=n_sub, gs=gs),
        grid=(m // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            wspec, wspec, sspec, sspec, sspec, sspec,
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((tm, tn), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n
            + m * n * x.dtype.itemsize,
            transcendentals=m * n,
        ),
        interpret=interpret,
    )(x, pg, pu, sg3, szg3, su3, szu3)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "gs",
                                             "out_dtype", "interpret"))
def _swiglu_w4a8_pallas(xq, xs, pg, pu, sg3, szg3, su3, szu3, tm, tn, tk, gs,
                        out_dtype, interpret=False):
    m, k = xq.shape
    n = pg.shape[1]
    n_k = k // tk
    n_sub = tk // gs
    wspec = pl.BlockSpec((tk // 2, tn), lambda i, j, kk: (kk, j))
    sspec = pl.BlockSpec((1, n_sub, tn), lambda i, j, kk: (kk, 0, j))
    return pl.pallas_call(
        functools.partial(_swiglu_w4a8_kernel, n_k=n_k, n_sub=n_sub, gs=gs),
        grid=(m // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((tm, 1), lambda i, j, kk: (i, 0)),
            wspec, wspec, sspec, sspec, sspec, sspec,
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((tm, tn), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n * k,
            bytes_accessed=m * k + k * n + m * n * 2,
            transcendentals=m * n,
        ),
        interpret=interpret,
    )(xq, xs, pg, pu, sg3, szg3, su3, szu3)


# --- dispatch ------------------------------------------------------------------


# Regime boundary: below this row count the W4A8 fixup kernel applies
# (bandwidth-bound decode — the MXU is idle, per-element dequant work is
# what matters); at/above it the weight-dequant bf16 big-dot kernel applies
# (compute-bound prefill — full-contraction MXU dots are what matters).
# v5e A/B 2026-08-19 (6-layer flagship chain): M=64 fixup 2.95 vs XLA-w8a8
# 4.26 ms; M=2048 fixup 5.08 vs 3.99 — the crossover sits between.
# Env override for A/Bs (captured at trace time): 0 = big-dot everywhere,
# large = fixup everywhere.
import os as _os

_FIXUP_MAX_M = int(_os.environ.get("VLLM_I64_TPU_INT4_FIXUP_MAX_M", "256"))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _eligible(q4: Q4Tensor, m: int) -> bool:
    gs = q4.group_size
    if q4.layout != "split" or q4.packed.ndim != 2:
        return False
    k2, n = q4.packed.shape
    return (
        m % 8 == 0
        and gs % 2 == 0
        and (gs // 2) % 8 == 0
        and (2 * k2) % gs == 0
        and n % 128 == 0
    )


def _pick_tile(dim: int, target: int, quantum: int = 1) -> int:
    """Largest divisor of ``dim`` that is a multiple of ``quantum`` and
    <= ``target``. A halving-only search ("while dim % t: t //= 2") missed
    every non-power-of-two divisor: the ENGINE's MoE width is 8448
    (E*I 8192 + 256 shared fold) = 128 x 66, where halving collapsed the
    output tile to 256 (33 grid steps) while 1408/2816/4224 are legal —
    the whole reason the int4 kernels measured -31% isolated at the
    A/B tool's round 4096 width but LOST in-engine at 8448."""
    best = 1
    for t in range(quantum, min(dim, target) + 1, quantum):
        if dim % t == 0:
            best = t
    return best


def _tiles(m: int, k: int, n: int, gs: int):
    """(tm, tn, tk): K-steps span several quant groups so DMAs stay large
    and grid steps few. Decode (small m) takes the fattest tiles — the
    kernel is bandwidth-bound and per-step overhead is the enemy; prefill
    keeps moderate tiles so the x tile and f32 accumulators fit VMEM."""
    tm = _pick_tile(m, 256, 8)
    n_groups = k // gs
    if m <= 128:
        tn = _pick_tile(n, 2048, 128)
        tk = gs * _pick_tile(n_groups, 8)
    else:
        tn = _pick_tile(n, 1024, 128)
        tk = gs * _pick_tile(n_groups, 4)
    return tm, tn, tk


def _scales3(q4: Q4Tensor, tk: int):
    """(G, N) scales / dequant-ready zeros -> (K/tk, tk/gs, N) f32 pair
    (s, s*z) — rows grouped by K-step for the (1, n_sub, tn) block spec."""
    g, n = q4.scales.shape
    n_sub = tk // q4.group_size
    s = q4.scales.astype(jnp.float32).reshape(g // n_sub, n_sub, n)
    sz = (q4.scales * q4.zeros).astype(jnp.float32).reshape(
        g // n_sub, n_sub, n)
    return s, sz


def _row_quant(x2):
    """Per-row int8 activations — PreQuantActs pass through unchanged."""
    from .quant import PreQuantActs, quantize_activations_int8

    if isinstance(x2, PreQuantActs):
        return x2.rows()
    return quantize_activations_int8(x2)


def int4_matmul(x, q4: Q4Tensor, *, interpret: bool = False):
    """y = x @ dequant(q4) with the weight streamed packed (0.5 B/weight).

    x: (..., K) float array or PreQuantActs (W4A8). Falls back to the
    dequantize path off-TPU / for unaligned shapes / interleaved layout.
    """
    from .dequant_matmul import w8a8_enabled
    from .quant import PreQuantActs, dequantize_int4

    prequant = isinstance(x, PreQuantActs)
    orig_shape = x.shape
    k = orig_shape[-1]
    n = q4.packed.shape[-1]
    m = 1
    for d in orig_shape[:-1]:
        m *= d

    use_pallas = (
        (interpret or _on_tpu())
        and _eligible(q4, m)
        and (prequant or x.dtype in (jnp.bfloat16, jnp.float32))
    )
    if not use_pallas:
        if prequant:
            x = x.to_float()
        return jnp.dot(x, dequantize_int4(q4, dtype=x.dtype),
                       preferred_element_type=x.dtype)

    gs = q4.group_size
    tm, tn, tk = _tiles(m, k, n, gs)
    s3, sz3 = _scales3(q4, tk)
    if (prequant or w8a8_enabled()) and m < _FIXUP_MAX_M:
        # decode regime: bandwidth-bound — int8 MXU dots on the raw nibbles
        # with per-group accumulator fixups (no per-element dequant work)
        xq, xs = _row_quant(x if prequant else x.reshape(-1, k))
        out = _mm_w4a8_pallas(xq, xs.astype(jnp.float32), q4.packed, s3, sz3,
                              tm, tn, tk, gs, x.dtype, interpret=interpret)
    else:
        # prefill regime: compute-bound — dequantize the weight tile in
        # register and run one full-contraction bf16 dot per K-step
        # (per-group 128-deep int8 dots measured ~27% slower at M=2048)
        x2 = (x.to_float() if prequant else x).reshape(-1, k)
        out = _mm_pallas(x2, q4.packed, s3, sz3, tm, tn, tk, gs,
                         interpret=interpret)
    return out.reshape(*orig_shape[:-1], n)


def int4_swiglu(x, gate_q4: Q4Tensor, up_q4: Q4Tensor, *,
                interpret: bool = False):
    """SiLU(x @ Wg) * (x @ Wu) with both int4 weights dequantized in-kernel.

    Shares the x tiles (and in W4A8 mode the activation quantization and
    per-group x sums) across both GEMMs; the (M, I) intermediate never
    touches HBM (ref analog: triton_fused_expert.py:502 INT4 fused expert).
    """
    from .dequant_matmul import w8a8_enabled
    from .quant import PreQuantActs

    prequant = isinstance(x, PreQuantActs)
    orig_shape = x.shape
    k = orig_shape[-1]
    n = gate_q4.packed.shape[-1]
    m = 1
    for d in orig_shape[:-1]:
        m *= d

    use_pallas = (
        (interpret or _on_tpu())
        and _eligible(gate_q4, m)
        and _eligible(up_q4, m)
        and gate_q4.group_size == up_q4.group_size
        and (prequant or x.dtype in (jnp.bfloat16, jnp.float32))
    )
    if not use_pallas:
        from .linear import linear

        if prequant:
            x = x.to_float()
        acc_t = jnp.promote_types(x.dtype, jnp.float32)
        g = linear(x, gate_q4).astype(acc_t)
        u = linear(x, up_q4).astype(acc_t)
        return (jax.nn.silu(g) * u).astype(x.dtype).reshape(
            *orig_shape[:-1], n)

    gs = gate_q4.group_size
    tm, tn, tk = _tiles(m, k, n, gs)
    sg3, szg3 = _scales3(gate_q4, tk)
    su3, szu3 = _scales3(up_q4, tk)
    if (prequant or w8a8_enabled()) and m < _FIXUP_MAX_M:
        xq, xs = _row_quant(x if prequant else x.reshape(-1, k))
        out = _swiglu_w4a8_pallas(
            xq, xs.astype(jnp.float32), gate_q4.packed, up_q4.packed,
            sg3, szg3, su3, szu3, tm, tn, tk, gs, x.dtype,
            interpret=interpret)
    else:
        x2 = (x.to_float() if prequant else x).reshape(-1, k)
        out = _swiglu_pallas(
            x2, gate_q4.packed, up_q4.packed,
            sg3, szg3, su3, szu3, tm, tn, tk, gs, interpret=interpret)
    return out.reshape(*orig_shape[:-1], n)
