#!/usr/bin/env python
"""Prototype: fused int4 dequant GEMM on TPU — validates Mosaic primitives
(uint8 nibble unpack, sublane concat, int8 MXU dot, (tm,1) row-scale blocks)
and measures decode-shaped (M=64) weight-streaming rates vs the int8 kernel.

Run on the real chip BEFORE wiring the production kernel.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --- split-layout packing ---------------------------------------------------
def pack_split(q: np.ndarray, gs: int) -> np.ndarray:
    """q (K, N) uint8 nibbles -> packed (K/2, N): within group g, packed row
    g*gs/2+j holds orig row g*gs+j (high) and g*gs+gs/2+j (low)."""
    k, n = q.shape
    qg = q.reshape(k // gs, gs, n)
    hi = qg[:, : gs // 2]
    lo = qg[:, gs // 2:]
    return ((hi << 4) | lo).reshape(k // 2, n).astype(np.uint8)


# --- float-x kernel ----------------------------------------------------------
def _k_f(x_ref, p_ref, s_ref, sz_ref, o_ref, acc_ref, *, n_g):
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:].astype(jnp.int32)
    hi = ((p >> 4) & 15).astype(x_ref.dtype)
    lo = (p & 15).astype(x_ref.dtype)
    w = jnp.concatenate([hi, lo], axis=0)  # (gs, tn)
    xt = x_ref[:]
    part = jnp.dot(xt, w, preferred_element_type=jnp.float32)
    xsum = jnp.sum(xt.astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] += part * s_ref[0].astype(jnp.float32) - xsum * sz_ref[0]

    @pl.when(g == n_g - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "gs"))
def mm_f(x, packed, s, sz, tm, tn, gs):
    m, k = x.shape
    n = packed.shape[1]
    n_g = k // gs
    return pl.pallas_call(
        functools.partial(_k_f, n_g=n_g),
        grid=(m // tm, n // tn, n_g),
        in_specs=[
            pl.BlockSpec((tm, gs), lambda i, j, g: (i, g)),
            pl.BlockSpec((gs // 2, tn), lambda i, j, g: (g, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, g: (g, 0, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, g: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, g: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k * n // 2 + m * n * 2,
            transcendentals=0,
        ),
    )(x, packed, s.reshape(n_g, 1, n), sz.reshape(n_g, 1, n))


# --- w4a8 kernel --------------------------------------------------------------
def _k_i8(xq_ref, xs_ref, p_ref, s_ref, sz_ref, o_ref, acc_ref, *, n_g):
    g = pl.program_id(2)

    @pl.when(g == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:].astype(jnp.int32)
    hi = ((p >> 4) & 15).astype(jnp.int8)
    lo = (p & 15).astype(jnp.int8)
    w = jnp.concatenate([hi, lo], axis=0)  # (gs, tn) int8
    xq = xq_ref[:]
    part = jnp.dot(xq, w, preferred_element_type=jnp.int32)
    xqsum = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
    acc_ref[:] += (part.astype(jnp.float32) * s_ref[0]
                   - xqsum.astype(jnp.float32) * sz_ref[0])

    @pl.when(g == n_g - 1)
    def _():
        o_ref[:] = (acc_ref[:] * xs_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "gs"))
def mm_i8(xq, xs, packed, s, sz, tm, tn, gs):
    m, k = xq.shape
    n = packed.shape[1]
    n_g = k // gs
    return pl.pallas_call(
        functools.partial(_k_i8, n_g=n_g),
        grid=(m // tm, n // tn, n_g),
        in_specs=[
            pl.BlockSpec((tm, gs), lambda i, j, g: (i, g)),
            pl.BlockSpec((tm, 1), lambda i, j, g: (i, 0)),
            pl.BlockSpec((gs // 2, tn), lambda i, j, g: (g, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, g: (g, 0, j)),
            pl.BlockSpec((1, 1, tn), lambda i, j, g: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, g: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n // 2 + m * n * 2,
            transcendentals=0,
        ),
    )(xq, xs, packed, s.reshape(n_g, 1, n), sz.reshape(n_g, 1, n))


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, getattr(dev, "device_kind", "?"))

    rng = np.random.default_rng(0)
    gs = 128
    M, K, N = 64, 1024, 4096
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    # reference per-group asymmetric quant
    G = K // gs
    wg = w.reshape(G, gs, N)
    wmin, wmax = wg.min(axis=1), wg.max(axis=1)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-8)  # (G, N)
    zero = np.clip(np.round(-wmin / scale), 0, 15)
    q = np.clip(np.round(wg / scale[:, None] + zero[:, None]), 0, 15).astype(
        np.uint8).reshape(K, N)
    wd = ((q.reshape(G, gs, N).astype(np.float32) - zero[:, None])
          * scale[:, None]).reshape(K, N)

    packed = pack_split(q, gs)
    sz = (scale * zero).astype(np.float32)

    x = (rng.normal(size=(M, K)) * 0.5).astype(np.float32)
    x_bf = jnp.asarray(x, jnp.bfloat16)
    ref = x.astype(np.float32) @ wd

    # float-x kernel
    try:
        out = mm_f(x_bf, jnp.asarray(packed), jnp.asarray(scale),
                   jnp.asarray(sz), 64, 512, gs)
        out = np.asarray(out, np.float32)
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"float-x kernel: rel_err={err:.4e}")
    except Exception as e:
        print("float-x kernel FAILED:", repr(e)[:500])

    # w4a8
    absmax = np.abs(x).max(axis=1, keepdims=True)
    xs = np.maximum(absmax / 127.0, 1e-8).astype(np.float32)
    xq = np.clip(np.round(x / xs), -128, 127).astype(np.int8)
    ref8 = (xq.astype(np.float32) * xs) @ wd
    try:
        out = mm_i8(jnp.asarray(xq), jnp.asarray(xs), jnp.asarray(packed),
                    jnp.asarray(scale), jnp.asarray(sz), 64, 512, gs)
        out = np.asarray(out, np.float32)
        err = np.abs(out - ref8).max() / (np.abs(ref8).max() + 1e-9)
        print(f"w4a8 kernel:   rel_err={err:.4e}")
    except Exception as e:
        print("w4a8 kernel FAILED:", repr(e)[:500])

    # --- timing: int4 vs int8 dequant kernel vs bf16, decode shape ----------
    import sys
    sys.path.insert(0, "/root/repo")
    from vllm_i64_tpu.ops.dequant_matmul import _dequant_matmul_pallas

    q8 = np.clip(np.round(w / (np.abs(w).max(0) / 127)), -128, 127).astype(np.int8)
    s8 = (np.abs(w).max(0) / 127).astype(np.float32)
    w_bf = jnp.asarray(w, jnp.bfloat16)

    def timeit(fn, *a, iters=50):
        r = fn(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters * 1e3

    packed_d = jax.device_put(jnp.asarray(packed))
    scale_d = jax.device_put(jnp.asarray(scale))
    sz_d = jax.device_put(jnp.asarray(sz))
    xq_d = jax.device_put(jnp.asarray(xq))
    xs_d = jax.device_put(jnp.asarray(xs))
    q8_d = jax.device_put(jnp.asarray(q8))
    s8_d = jax.device_put(jnp.asarray(s8))
    for tn in (512, 1024, 2048):
        t4 = timeit(lambda: mm_f(x_bf, packed_d, scale_d, sz_d, 64, tn, gs))
        t48 = timeit(lambda: mm_i8(xq_d, xs_d, packed_d, scale_d, sz_d,
                                   64, tn, gs))
        print(f"tn={tn}: int4-f {t4:.3f} ms ({K*N/2/t4/1e6:.0f} GB/s)  "
              f"w4a8 {t48:.3f} ms ({K*N/2/t48/1e6:.0f} GB/s)")
    t8 = timeit(lambda: _dequant_matmul_pallas(x_bf, q8_d, s8_d, 64, 512, 512))
    tb = timeit(lambda: jnp.dot(x_bf, w_bf, preferred_element_type=jnp.float32))
    print(f"int8 kernel {t8:.3f} ms ({K*N/t8/1e6:.0f} GB/s)  "
          f"bf16 dot {tb:.3f} ms ({K*N*2/tb/1e6:.0f} GB/s)")




def chained():
    """Weight-stream rate: L chained GEMMs inside ONE jit (no dispatch
    overhead) — int4 kernel vs int8 kernel vs bf16 dot, decode shape."""
    import sys
    sys.path.insert(0, "/root/repo")
    from vllm_i64_tpu.ops.dequant_matmul import _dm_kernel

    rng = np.random.default_rng(0)
    gs = 128
    M, K, N, L = 64, 1024, 4096, 24
    G = K // gs

    packed = jnp.asarray(rng.integers(0, 256, size=(L, K // 2, N)), jnp.uint8)
    s = jnp.asarray(rng.random((L, G, 1, N)), jnp.float32) * 0.01
    sz = jnp.asarray(rng.random((L, G, 1, N)), jnp.float32) * 0.05
    q8 = jnp.asarray(rng.integers(-128, 128, size=(L, K, N)), jnp.int8)
    s8 = jnp.asarray(rng.random((L, N)), jnp.float32) * 0.01
    wb = jnp.asarray(rng.random((L, K, N)), jnp.bfloat16) * 0.01
    x = jnp.asarray(rng.random((M, K)), jnp.bfloat16)
    xq0 = jnp.asarray(rng.integers(-128, 128, size=(M, K)), jnp.int8)
    xs0 = jnp.asarray(rng.random((M, 1)), jnp.float32)

    @jax.jit
    def run_i4(x, packed, s, sz):
        def body(x, inp):
            p, ss, zz = inp
            y = mm_f(x, p, ss.reshape(G, N), zz.reshape(G, N), 64, 1024, gs)
            return y[:, :K].astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, (packed, s, sz))
        return x

    @jax.jit
    def run_i4a8(xq, xs, packed, s, sz):
        def body(c, inp):
            xq, xs = c
            p, ss, zz = inp
            y = mm_i8(xq, xs, p, ss.reshape(G, N), zz.reshape(G, N),
                      64, 1024, gs)
            yq = jnp.clip(y[:, :K] * 100, -127, 127).astype(jnp.int8)
            return (yq, xs), ()
        (xq, _), _ = jax.lax.scan(body, (xq, xs), (packed, s, sz))
        return xq

    @jax.jit
    def run_i8(x, q8, s8):
        def body(x, inp):
            q, ss = inp
            y = _dequant_matmul_pallas_local(x, q, ss)
            return y[:, :K].astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, (q8, s8))
        return x

    from vllm_i64_tpu.ops.dequant_matmul import _dequant_matmul_pallas

    def _dequant_matmul_pallas_local(x, q, ss):
        return _dequant_matmul_pallas(x, q, ss, 64, 1024, 512)

    @jax.jit
    def run_bf(x, wb):
        def body(x, w):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return y[:, :K].astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, wb)
        return x

    def timeit(fn, *a, iters=30):
        r = fn(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters * 1e3

    wbytes4 = L * K * N // 2
    wbytes8 = L * K * N
    t = timeit(run_i4, x, packed, s, sz)
    print(f"int4-f chain:  {t:.3f} ms  ({wbytes4/t/1e6:.0f} GB/s weight stream)")
    t = timeit(run_i4a8, xq0, xs0, packed, s, sz)
    print(f"w4a8 chain:    {t:.3f} ms  ({wbytes4/t/1e6:.0f} GB/s)")
    t = timeit(run_i8, x, q8, s8)
    print(f"int8 chain:    {t:.3f} ms  ({wbytes8/t/1e6:.0f} GB/s)")
    t = timeit(run_bf, x, wb)
    print(f"bf16 chain:    {t:.3f} ms  ({2*wbytes8/t/1e6:.0f} GB/s)")


if __name__ == "__main__":
    import sys
    if "--chain" in sys.argv:
        chained()
    else:
        main()
