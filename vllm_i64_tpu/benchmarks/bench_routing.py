"""i64 table routing vs float-gate routing microbenchmark
(ref: benchmarks/bench_i64_routing.py:17-50).

Deterministic routing is a (top_k, vocab) table gather; the float baseline
is a learned-gate path (hidden @ W_gate -> softmax -> top-k). Both run
jitted on the active backend.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, *args, iters: int = 50) -> float:
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_routing_bench(num_experts: int = 4, vocab: int = 32000,
                      hidden: int = 1024, num_tokens: int = 4096,
                      top_k: int = 2) -> dict:
    key = jax.random.PRNGKey(0)
    table = jnp.asarray(
        np.random.default_rng(0).integers(0, num_experts,
                                          (top_k, vocab)).astype(np.int32))
    token_ids = jax.random.randint(key, (num_tokens,), 0, vocab)
    x = jax.random.normal(key, (num_tokens, hidden), jnp.float32)
    w_gate = jax.random.normal(key, (hidden, num_experts), jnp.float32) * 0.02

    @jax.jit
    def route_i64(ids):
        return table[:, jnp.clip(ids, 0, vocab - 1)]

    @jax.jit
    def route_float(x):
        logits = x @ w_gate
        probs = jax.nn.softmax(logits, axis=-1)
        _, idx = jax.lax.top_k(probs, top_k)
        return idx.T

    t_i64 = _time_fn(route_i64, token_ids)
    t_float = _time_fn(route_float, x)

    out = {
        "num_tokens": num_tokens,
        "num_experts": num_experts,
        "top_k": top_k,
        "i64_us_per_call": round(t_i64 * 1e6, 2),
        "i64_ns_per_token": round(t_i64 * 1e9 / num_tokens, 2),
        "float_us_per_call": round(t_float * 1e6, 2),
        "float_ns_per_token": round(t_float * 1e9 / num_tokens, 2),
        "speedup": round(t_float / max(t_i64, 1e-12), 2),
    }
    print(f"i64 routing:   {out['i64_us_per_call']:>10.2f} us/call "
          f"({out['i64_ns_per_token']:.1f} ns/token)")
    print(f"float routing: {out['float_us_per_call']:>10.2f} us/call "
          f"({out['float_ns_per_token']:.1f} ns/token)")
    print(f"speedup:       {out['speedup']:>10.2f}x")
    return out
