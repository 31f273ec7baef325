#!/usr/bin/env python
"""A/B: XLA gather decode attention vs the Pallas paged-attention kernel.

VERDICT r1 item 7: long-context decode runs at ~15% HBM bandwidth on the
XLA gather path; a flash-decode kernel with block-batched DMAs should win
at ctx 2048. This tool measures BOTH paths over a scanned L-layer attention
stack on the real chip (the layer scan re-streams each layer's cache, as
the production program does) and checks numerics between them.

Variant A: ops/attention.paged_attention XLA gather (production default),
           cache layout (L, NB, bs, Hkv, d).
Variant B: jax.experimental.pallas.ops.tpu.paged_attention — the
           block-batched-DMA flash-decode kernel (pages_per_compute_block
           pages per grid step ride ONE async copy pipeline), cache layout
           (L, Hkv, NB, bs, d).

Prints one JSON line per (ctx, batch) config.
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=30)
    p.add_argument("--kv-heads", type=int, default=4)
    p.add_argument("--q-heads", type=int, default=16)
    p.add_argument("--head-dim", type=int, default=64)
    p.add_argument("--block-size", type=int, default=64,
                   help="page size; the library kernel prefers smaller "
                        "pages with pages_per_compute_block batching")
    p.add_argument("--pages-per-block", type=int, default=8)
    p.add_argument("--ctxs", default="512,2048")
    p.add_argument("--batches", default="8,16,32")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vllm_i64_tpu.ops import attention as attn

    attn._PALLAS_DECODE = False  # variant A = pure XLA gather

    from jax.experimental.pallas.ops.tpu.paged_attention import (
        paged_attention as lib_paged_attention,
    )

    dev = jax.devices()[0]
    print(f"[ab] device: {dev.platform}", file=sys.stderr)
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16

    L, HKV, HQ, D = args.layers, args.kv_heads, args.q_heads, args.head_dim
    BS = args.block_size

    def bench(fn, *a):
        # warmup/compile
        np.asarray(jax.tree_util.tree_leaves(fn(*a))[0])
        t0 = time.perf_counter()
        outs = []
        for i in range(args.iters):
            outs.append(fn(*a))
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])  # host sync
        return (time.perf_counter() - t0) / args.iters * 1000

    for ctx in [int(x) for x in args.ctxs.split(",")]:
        pages_per_seq = -(-ctx // BS)
        for b in [int(x) for x in args.batches.split(",")]:
            nb = 1 + b * pages_per_seq
            rng = np.random.default_rng(0)
            q = jnp.asarray(
                rng.standard_normal((b, 1, HQ, D)) * 0.1, dtype)
            kc_a = jnp.asarray(
                rng.standard_normal((L, nb, BS, HKV, D)) * 0.1, dtype)
            vc_a = jnp.asarray(
                rng.standard_normal((L, nb, BS, HKV, D)) * 0.1, dtype)
            # same values in kernel-native layout (L, HKV, NB, BS, D)
            kc_b = jnp.transpose(kc_a, (0, 3, 1, 2, 4))
            vc_b = jnp.transpose(vc_a, (0, 3, 1, 2, 4))
            bt = jnp.asarray(
                np.arange(1, nb, dtype=np.int32).reshape(b, pages_per_seq))
            ctx_lens = jnp.full((b,), ctx, jnp.int32)
            positions = jnp.full((b, 1), ctx - 1, jnp.int32)

            @jax.jit
            def variant_a(q, kc, vc, bt, positions, ctx_lens):
                def body(acc, layer):
                    out = attn.paged_attention(
                        q, layer[0], layer[1], bt, positions, ctx_lens)
                    return acc + out.astype(jnp.float32), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros(q.shape, jnp.float32), (kc, vc))
                return acc

            ppcb = min(args.pages_per_block, pages_per_seq)

            @jax.jit
            def variant_b(q, kc, vc, bt, ctx_lens):
                def body(acc, layer):
                    out = lib_paged_attention(
                        q[:, 0], layer[0], layer[1], ctx_lens, bt,
                        pages_per_compute_block=ppcb,
                    )
                    return acc + out[:, None].astype(jnp.float32), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros(q.shape, jnp.float32), (kc, vc))
                return acc

            row = {"ctx": ctx, "batch": b, "layers": L, "block_size": BS,
                   "pages_per_compute_block": ppcb}
            try:
                a_ms = bench(variant_a, q, kc_a, vc_a, bt, positions, ctx_lens)
                row["xla_gather_ms"] = round(a_ms, 3)
            except Exception as e:
                row["xla_gather_error"] = repr(e)[:200]
            try:
                b_ms = bench(variant_b, q, kc_b, vc_b, bt, ctx_lens)
                row["pallas_kernel_ms"] = round(b_ms, 3)
            except Exception as e:
                row["pallas_kernel_error"] = repr(e)[:200]
            if "xla_gather_ms" in row and "pallas_kernel_ms" in row:
                row["speedup"] = round(
                    row["xla_gather_ms"] / row["pallas_kernel_ms"], 3)
                oa = variant_a(q, kc_a, vc_a, bt, positions, ctx_lens)
                ob = variant_b(q, kc_b, vc_b, bt, ctx_lens)
                err = float(jnp.max(jnp.abs(
                    oa.astype(jnp.float32) - ob.astype(jnp.float32))))
                row["max_abs_diff"] = round(err, 5)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
