#!/usr/bin/env python
"""A/B the fused int4 kernels against the XLA W8A8 int8 path at the
flagship model's exact per-layer GEMM chain (qkv 1024->1536, o 1024->1024,
gate+up 1024->2x4096, down 4096->1024), 20 layers, chained inside one jit
with data-dependent iteration so nothing caches or elides.

Usage: python tools/tpu_int4_ab.py [--m 64] [--layers 20] [--iters 12]
"""
import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--layers", type=int, default=20)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--variants", default="w8a8,int4")
    ap.add_argument("--ei", type=int, default=4096,
                    help="MoE intermediate width (flat E*I [+ shared fold]);"
                         " the ENGINE serves 8448 = 8192 + 256 — 256x33,"
                         " which collapses halving-only tile pickers")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_i64_tpu.ops import dequant_matmul as dm
    from vllm_i64_tpu.ops.int4_matmul import int4_matmul, int4_swiglu
    from vllm_i64_tpu.ops.quant import (
        QTensor,
        quantize_int4,
        quantize_int8,
        repack_int4_split,
    )

    H, QKV, EI = 1024, 1536, args.ei
    L, M = args.layers, args.m
    rng = np.random.default_rng(0)

    def w(k, n):
        return jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.bfloat16)

    shapes = [("qkv", H, QKV), ("o", H, H), ("gate", H, EI), ("up", H, EI),
              ("down", EI, H)]
    w_f = {nm: jnp.stack([w(k, n) for _ in range(L)]) for nm, k, n in shapes}
    w_i8 = {nm: quantize_int8(w_f[nm]) for nm, _, _ in shapes}
    w_i4 = {nm: repack_int4_split(quantize_int4(w_f[nm]))
            for nm, _, _ in shapes}

    x0 = jnp.asarray(rng.normal(size=(M, H)), jnp.bfloat16)
    dm.set_w8a8(True)

    def layer_int8(x, lw):
        from vllm_i64_tpu.ops.dequant_matmul import int8_int8_matmul

        qkv = int8_int8_matmul(x, QTensor(lw["qkv"][0], lw["qkv"][1]))
        o = int8_int8_matmul(qkv[:, :H], QTensor(lw["o"][0], lw["o"][1]))
        h = (x + o).astype(jnp.bfloat16)
        g = int8_int8_matmul(h, QTensor(lw["gate"][0], lw["gate"][1]))
        u = int8_int8_matmul(h, QTensor(lw["up"][0], lw["up"][1]))
        inter = (jax.nn.silu(g.astype(jnp.float32))
                 * u.astype(jnp.float32)).astype(jnp.bfloat16)
        d = int8_int8_matmul(inter, QTensor(lw["down"][0], lw["down"][1]))
        return (h + d).astype(jnp.bfloat16)

    def layer_int4(x, lw):
        from vllm_i64_tpu.ops.quant import Q4Tensor

        def q4(t):
            return Q4Tensor(t[0], t[1], t[2], 128, "split")

        qkv = int4_matmul(x, q4(lw["qkv"]))
        o = int4_matmul(qkv[:, :H], q4(lw["o"]))
        h = (x + o).astype(jnp.bfloat16)
        inter = int4_swiglu(h, q4(lw["gate"]), q4(lw["up"]))
        d = int4_matmul(inter, q4(lw["down"]))
        return (h + d).astype(jnp.bfloat16)

    def chain(layer_fn, weights, flat):
        # flat passes as an ARGUMENT: closed-over device arrays become HLO
        # constants and the remote-compile request ships the whole model
        # (HTTP 413 at the engine's real 8448 MoE width)
        @jax.jit
        def run(x, seed, flat):
            x = x + seed.astype(x.dtype) * 0

            def body(x, lw):
                return layer_fn(x, lw), ()

            x, _ = jax.lax.scan(body, x, flat)
            return x

        return lambda x, seed: run(x, seed, flat)

    flat_i8 = {nm: (w_i8[nm].q, w_i8[nm].s) for nm, _, _ in shapes}
    flat_i4 = {nm: (w_i4[nm].packed, w_i4[nm].scales, w_i4[nm].zeros)
               for nm, _, _ in shapes}

    runs = {}
    if "w8a8" in args.variants:
        runs["w8a8-xla"] = (chain(layer_int8, w_i8, flat_i8), x0)
    if "int4" in args.variants:
        runs["w4a8-plls"] = (chain(layer_int4, w_i4, flat_i4), x0)

    wbytes = {"w8a8-xla": sum(L * k * n for _, k, n in shapes),
              "w4a8-plls": sum(L * k * n // 2 for _, k, n in shapes)}

    for name, (run, x) in runs.items():
        # two synced warmups: the first absorbs weight upload + compile,
        # the second first-execution effects (np.asarray because
        # block_until_ready does NOT sync on the axon backend)
        np.asarray(run(x, jnp.int32(0)))
        np.asarray(run(x, jnp.int32(1)))
        t0 = time.perf_counter()
        xx = x
        for it in range(args.iters):
            xx = run(xx, jnp.int32(it))
        np.asarray(xx)  # block_until_ready does NOT sync on axon
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:.3f} ms per {L}-layer pass  "
              f"({wbytes[name]/dt/1e9:.0f} GB/s weight stream)", flush=True)


if __name__ == "__main__":
    main()
