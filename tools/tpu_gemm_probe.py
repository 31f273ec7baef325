#!/usr/bin/env python
"""Standalone GEMM throughput probe at the flagship model's exact shapes.

Answers one question the prefill ablation can't: do the W8A8 int8 GEMMs
actually hit the MXU's int8 path under XLA, and what TFLOP/s is achievable
for the layer's GEMM chain in isolation? Compares bf16, int8-dequant
(weight-only), and int8xint8 W8A8 at the prefill shape (2048 tokens), each
chained 30x (one per layer) inside one jit so dispatch cost amortizes.

Prints one JSON line per variant: {"variant": ..., "tflops": ...}.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=2048)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--inter", type=int, default=3200, help="flat experts total")
    ap.add_argument("--layers", type=int, default=30)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    m, h, i, L = args.tokens, args.hidden, args.inter, args.layers
    dt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (m, h), dt)
    # layer GEMM set: gate_up (H, 2I) + down (I, H) — the MoE flat-expert
    # chain that dominates prefill (attention QKV/O ~20% extra, same story)
    wg = jax.random.normal(jax.random.fold_in(key, 1), (h, 2 * i), dt) * 0.02
    wd = jax.random.normal(jax.random.fold_in(key, 2), (i, h), dt) * 0.02
    wg8 = jnp.round(jnp.clip(wg.astype(jnp.float32) * 50, -127, 127)).astype(jnp.int8)
    wd8 = jnp.round(jnp.clip(wd.astype(jnp.float32) * 50, -127, 127)).astype(jnp.int8)
    sg = jnp.full((2 * i,), 1 / 50.0, jnp.float32)
    sd = jnp.full((h,), 1 / 50.0, jnp.float32)

    flops_layer = 2.0 * m * h * 2 * i + 2.0 * m * i * h  # gate_up + down
    flops = flops_layer * L

    def chain(step):
        @jax.jit
        def run(x, seed):
            def body(c, _):
                y = step(c + seed.astype(c.dtype) * 0)
                return y, None
            out, _ = jax.lax.scan(body, x, jnp.arange(L))
            return out
        return run

    def bf16_step(x):
        g = jax.lax.dot(x, wg.astype(x.dtype))
        act = jax.nn.silu(g[:, :i]) * g[:, i:]
        return jax.lax.dot(act.astype(x.dtype), wd.astype(x.dtype))

    def wonly_step(x):
        g = jax.lax.dot(x, (wg8.astype(x.dtype) * sg.astype(x.dtype)))
        act = jax.nn.silu(g[:, :i]) * g[:, i:]
        return jax.lax.dot(act.astype(x.dtype), (wd8.astype(x.dtype) * sd.astype(x.dtype)))

    def quant_rows(x):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        s = jnp.maximum(ax, 1e-8) / 127.0
        q = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
        return q, s

    def w8a8_step(x):
        q, s = quant_rows(x)
        acc = jax.lax.dot(q, wg8, preferred_element_type=jnp.int32)
        g = acc.astype(jnp.float32) * s * sg[None]
        act = jax.nn.silu(g[:, :i]) * g[:, i:]
        q2, s2 = quant_rows(act)
        acc2 = jax.lax.dot(q2, wd8, preferred_element_type=jnp.int32)
        return (acc2.astype(jnp.float32) * s2 * sd[None]).astype(x.dtype)

    def w8a8_noquant_step(x):
        # int8 GEMMs with the activation quantize REMOVED (pre-quantized
        # input reused) — isolates the quantize chain's cost
        q = x_q8
        acc = jax.lax.dot(q, wg8, preferred_element_type=jnp.int32)
        g = acc.astype(jnp.float32)
        act = g[:, :i] * 0.001 + g[:, i:] * 0.001
        acc2 = jax.lax.dot(act.astype(jnp.int8), wd8,
                           preferred_element_type=jnp.int32)
        return acc2.astype(x.dtype) * 1e-6 + x

    x_q8 = quant_rows(x0)[0]

    for name, step in [("bf16", bf16_step), ("int8_dequant", wonly_step),
                       ("w8a8", w8a8_step),
                       ("w8a8_no_act_quant", w8a8_noquant_step)]:
        run = chain(step)
        try:
            np.asarray(run(x0, jnp.int32(0)))  # compile
            # pipeline: chain outputs through the device WITHOUT reading
            # back between dispatches — a per-iter readback pays the ~40 ms
            # tunnel round trip and swamps the device time
            t0 = time.perf_counter()
            x = x0
            for it in range(args.iters):
                x = run(x, jnp.int32(it))
            np.asarray(x)
            dt_s = (time.perf_counter() - t0) / args.iters
            print(json.dumps({"variant": name,
                              "ms": round(dt_s * 1000, 2),
                              "tflops": round(flops / dt_s / 1e12, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
