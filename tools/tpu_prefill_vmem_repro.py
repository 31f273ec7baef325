"""Repro + fix experiment: Pallas flash prefill inside the layer scan.

Round-3 finding: XLA-TPU stack-allocates a pallas call's VMEM-blocked q
input and output in scoped VMEM (16 MB) when the call sits inside a
lax.scan body, so the kernel cannot compile at serving shapes
(B=16 T=512 -> q 16 MB + out 16 MB). Hypothesis for round 4: pass q and
out in ANY (HBM) memory space and DMA tiles manually inside the kernel —
then XLA only sees opaque HBM buffers and has nothing to stage.

Usage: python tools/tpu_prefill_vmem_repro.py [--mode scan_vmem|scan_any|perf]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# geometry = tr-hash-moe-500m longctx serving shapes
B, T, HQ, HKV, D = 16, 512, 16, 4, 64
BS = 128          # kv block size
MB = 16           # block-table width (2048-token span)
NB = 1 + B * MB   # physical blocks
L = 4             # scan depth (enough to trigger the loop-body allocator)


def make_inputs(seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    h = jax.random.normal(ks[0], (B, T, HQ * D), jnp.bfloat16)
    wq = jax.random.normal(ks[1], (L, HQ * D, HQ * D), jnp.bfloat16) * 0.05
    kc = jax.random.normal(ks[2], (L, NB, BS, HKV, D), jnp.bfloat16)
    vc = jax.random.normal(ks[3], (L, NB, BS, HKV, D), jnp.bfloat16)
    bt = jnp.asarray(
        1 + np.arange(B * MB, dtype=np.int32).reshape(B, MB))
    # row positions: second chunk of a long prompt (ctx = 1536 + T)
    pos0 = 1536
    pos = jnp.broadcast_to(
        pos0 + jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    ctx = jnp.full((B,), pos0 + T, jnp.int32)
    return h, wq, kc, vc, bt, pos, ctx


def gather_ref(q, kc, vc, bt, pos, ctx):
    from vllm_i64_tpu.ops.attention import paged_attention

    return paged_attention(q, kc, vc, bt, pos, ctx)


def scan_forward(h, wq, kc, vc, bt, pos, ctx, attn_fn):
    def body(hidden, xs):
        w, kcl, vcl = xs
        q = (hidden @ w).reshape(B, T, HQ, D)
        out = attn_fn(q, kcl, vcl, bt, pos, ctx)
        return hidden + out.reshape(B, T, HQ * D), None

    out, _ = jax.lax.scan(body, h, (wq, kc, vc))
    return out


def run_mode(mode: str):
    h, wq, kc, vc, bt, pos, ctx = make_inputs()

    if mode == "scan_vmem":
        from vllm_i64_tpu.ops.prefill_attention_pallas import (
            paged_prefill_attention_pallas,
        )

        fn = jax.jit(functools.partial(
            scan_forward,
            attn_fn=lambda *a: paged_prefill_attention_pallas(
                *a, block_size=BS)))
    elif mode == "scan_any":
        from vllm_i64_tpu.ops.prefill_attention_pallas import (
            paged_prefill_attention_pallas,
        )

        fn = jax.jit(functools.partial(
            scan_forward,
            attn_fn=lambda *a: paged_prefill_attention_pallas(
                *a, block_size=BS)))
    elif mode == "scan_gather":
        fn = jax.jit(functools.partial(scan_forward, attn_fn=gather_ref))
    else:
        raise SystemExit(f"unknown mode {mode}")

    t0 = time.time()
    out = fn(h, wq, kc, vc, bt, pos, ctx)
    out.block_until_ready()
    print(f"[{mode}] compiled+ran in {time.time() - t0:.1f}s, "
          f"out[0,0,:3]={np.asarray(out[0, 0, :3], np.float32)}")

    # exactness vs gather
    ref = jax.jit(functools.partial(scan_forward, attn_fn=gather_ref))(
        h, wq, kc, vc, bt, pos, ctx)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"[{mode}] max |delta| vs gather-in-scan = {err:.2e}")


def run_perf():
    """Chained A/B: gather vs flash prefill attention, L layers per call."""
    h, wq, kc, vc, bt, pos, ctx = make_inputs()
    from vllm_i64_tpu.ops.prefill_attention_pallas import (
        paged_prefill_attention_pallas,
    )

    flash = jax.jit(functools.partial(
        scan_forward,
        attn_fn=lambda *a: paged_prefill_attention_pallas(
            *a, block_size=BS)))
    gather = jax.jit(functools.partial(scan_forward, attn_fn=gather_ref))

    for name, fn in (("gather", gather), ("flash", flash)):
        x = h
        fn(x, wq, kc, vc, bt, pos, ctx).block_until_ready()  # compile
        n = 8
        t0 = time.time()
        for i in range(n):
            x = fn(x * (1.0 + 1e-6 * i), wq, kc, vc, bt, pos, ctx)
        x.block_until_ready()
        dt = (time.time() - t0) / n
        print(f"[perf] {name}: {dt * 1e3:.2f} ms per {L}-layer pass "
              f"({dt * 1e3 / L:.2f} ms/layer) B={B} T={T} ctx=2048")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scan_vmem")
    args = ap.parse_args()
    if args.mode == "perf":
        run_perf()
    else:
        run_mode(args.mode)
