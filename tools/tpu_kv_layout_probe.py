#!/usr/bin/env python
"""KV-cache page-layout probe (r5 decode-gap work).

The r5 decode trace showed the 5D cache shape (L, NB, bs, Hkv=4, d=64)
can never tile cleanly on TPU (min tile 8x128 over the trailing dims), so
every consumer demands its own layout: the layer scan's per-layer slice,
the flat gather, the window merge scatter and the Pallas kernel each cost
a whole-cache relayout copy somewhere. This probe measures the decode
window's KV ops on the tile-perfect FLAT page shape (L*NB, bs, Hkv*d=256)
to validate the refactor before it lands:

  gather   per-layer: flat gather (B, MB, bs, HD) + reshape to heads +
           both attention einsums + softmax — the whole history-attention
           read path, chained over L layers x K iterations in a scan.
  merge    the once-per-window sub-slab merge scatter on the flat cache.

Prints JSON lines with us/layer-iter (gather) and ms/window (merge).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=30)
    ap.add_argument("--blocks", type=int, default=256)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--hkv", type=int, default=4)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--mb", type=int, default=2)
    ap.add_argument("--hq", type=int, default=16)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-merge", action="store_true")
    ap.add_argument("--no-gather", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    L, NB, bs = args.layers, args.blocks, args.bs
    hkv, d, B, MB = args.hkv, args.d, args.b, args.mb
    hq = args.hq
    g = hq // hkv
    HD = hkv * d
    S = MB * bs
    K = args.steps

    key = jax.random.PRNGKey(0)
    kc = jax.random.normal(key, (L * NB, bs, HD), jnp.bfloat16)
    vc = jax.random.normal(jax.random.fold_in(key, 1),
                           (L * NB, bs, HD), jnp.bfloat16)
    bt = jnp.tile(jnp.arange(B * MB, dtype=jnp.int32).reshape(B, MB),
                  (1, 1))
    ctx0 = jnp.full((B,), S - K - 1, jnp.int32)
    q0 = jax.random.normal(jax.random.fold_in(key, 2),
                           (B, hq, d), jnp.bfloat16)

    def out(dd):
        print(json.dumps(dd), flush=True)

    def timed(fn, *a):
        import numpy as np
        r1, r2 = args.reps, 2 * args.reps
        f1, f2 = fn(r1), fn(r2)
        np.asarray(f1(*a)); np.asarray(f2(*a))
        ts = {}
        for nm, f in (("a", f1), ("b", f2)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(*a))
                best = min(best, time.perf_counter() - t0)
            ts[nm] = best
        return max(ts["b"] - ts["a"], 1e-9) / (r2 - r1)

    # ---- gather+attention chain over layers, flat pages ----------------
    def mk_gather(reps):
        @jax.jit
        def run(q):
            def rep(qc, _):
                def layer(qc, li):
                    btl = bt + li * NB
                    kk = jnp.take(kc, btl, axis=0).reshape(B, S, hkv, d)
                    vv = jnp.take(vc, btl, axis=0).reshape(B, S, hkv, d)
                    qg = qc.reshape(B, hkv, g, d)
                    sc = jnp.einsum("bhgd,bshd->bhgs", qg, kk,
                                    preferred_element_type=jnp.float32)
                    kpos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
                    sc = jnp.where((kpos < ctx0[:, None])[:, None, None],
                                   sc, -1e30)
                    p = jax.nn.softmax(sc, axis=-1)
                    o = jnp.einsum("bhgs,bshd->bhgd",
                                   p.astype(vv.dtype), vv,
                                   preferred_element_type=jnp.float32)
                    return (qc + o.reshape(B, hq, d).astype(qc.dtype) * 0.01
                            ), None
                qc, _ = jax.lax.scan(
                    layer, qc, jnp.arange(L, dtype=jnp.int32))
                return qc, None
            qf, _ = jax.lax.scan(rep, q, jnp.arange(reps))
            return qf
        return run

    if not args.no_gather:
        s = timed(mk_gather, q0)
        out({"probe": "gather_attn_flat", "us_per_layer": round(s / L * 1e6, 2),
             "ms_per_iter": round(s * 1e3, 3),
             "kv_mb_per_layer": round(2 * B * S * HD * 2 / 1e6, 2),
             "gb_s": round(2 * B * S * HD * 2 * L / s / 1e9, 1)})

    # ---- window merge scatter on flat cache -----------------------------
    win_k = jax.random.normal(jax.random.fold_in(key, 3),
                              (L, B, K, HD), jnp.bfloat16)
    sub = K  # sub-slab rows
    spb = bs // sub
    W = 2

    def mk_merge(reps):
        @jax.jit
        def run(cache, win):
            def rep(c, i):
                start_sub = (ctx0 + i) // sub
                off0 = (ctx0 + i) % sub
                wi = jnp.arange(W, dtype=jnp.int32)
                sub_idx = start_sub[:, None] + wi[None]
                blk = sub_idx // spb
                phys = jnp.take_along_axis(
                    bt, jnp.clip(blk, 0, MB - 1), axis=1)
                li = jnp.arange(L, dtype=jnp.int32)
                # flat sub-slab ids incl. layer offset: (L, B, W)
                flat = (li[:, None, None] * NB * spb
                        + phys[None] * spb + (sub_idx % spb)[None])
                r = jnp.arange(sub, dtype=jnp.int32)
                j = wi[None, :, None] * sub + r[None, None] - off0[:, None, None]
                jc = jnp.clip(j, 0, K - 1)
                img = jnp.take_along_axis(
                    win[:, :, None], jc[None, :, :, :, None], axis=3
                )  # (L, B, W, sub, HD)
                cs = c.reshape(L * NB * spb, sub, HD)
                cs = cs.at[flat.reshape(-1)].set(
                    img.reshape(-1, sub, HD), mode="drop")
                return cs.reshape(L * NB, bs, HD), None
            c, _ = jax.lax.scan(rep, cache, jnp.arange(reps))
            return c
        return run

    if args.no_merge:
        return
    s = timed(mk_merge, kc, win_k)
    out({"probe": "merge_flat", "ms_per_window": round(s * 1e3, 3),
         "scatter_mb": round(2 * L * B * W * sub * HD * 2 / 1e6, 1)})


if __name__ == "__main__":
    main()
