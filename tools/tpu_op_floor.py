#!/usr/bin/env python
"""Decode per-op floor decomposition (VERDICT r4 next-round item #1).

Round 4 measured the decode step at ~23-29 us per GEMM-like op at M=64,
an effective weight-stream rate of ~240-261 GB/s vs the v5e's 819 GB/s
datasheet HBM. This tool splits that gap into its parts:

  stream   bare HBM read bandwidth: a Pallas grid-pipelined reduce over a
           large int8 array, vs the XLA reduce of the same array. If the
           dumb stream hits ~full HBM rate, the platform/stack is fine and
           the loss is op/kernel structure.
  chain    the engine-shaped workload: K data-dependent M=64 int8 GEMMs
           over DISTINCT stacked weights, run three ways --
             scan       lax.scan over the stacked weights (what the
                        engine's layer loop compiles to today)
             unroll     the same scan with unroll=K (XLA sees the chain
                        flat and can prefetch weights across ops)
             w8a8       the engine's full per-op step (act quant + int8
                        dot + scale) under both loop forms
           Slope of time vs weight bytes gives the per-op stream rate;
           the intercept is the true per-op floor.
  mega     one Pallas kernel streaming all K stacked weights through a
           grid (auto double-buffered DMA), both accumulate-only (pure
           stream bound) and data-chained (decode-shaped). This is the
           upper bound for a hand-fused multi-weight kernel.

Timing protocol (axon: block_until_ready is a no-op, readback round trip
~40 ms): the repetition loop lives INSIDE the jit (scan over reps), and
each measurement runs at reps R and 2R -- the difference isolates pure
device time from dispatch+readback overhead.

Prints one JSON line per measurement.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="all",
                    choices=["all", "stream", "chain", "mega"])
    ap.add_argument("--m", type=int, default=64, help="decode batch rows")
    ap.add_argument("--k", type=int, default=30, help="ops in the chain")
    ap.add_argument("--reps", type=int, default=64,
                    help="in-jit repetitions (also timed at 2x)")
    ap.add_argument("--stream-mb", type=int, default=512)
    ap.add_argument("--shapes", default="1024x1024,1024x8448",
                    help="comma list of HxN chain shapes")
    ap.add_argument("--forms", default="scan,unroll")
    ap.add_argument("--steps", default="dot,w8a8")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def out(d):
        print(json.dumps(d), flush=True)

    def timed_device_s(fn, *a):
        """Pure device seconds per rep: run at reps R and 2R, take the
        slope. fn(reps_static, *a) must loop internally."""
        r1, r2 = args.reps, 2 * args.reps
        f1 = fn(r1)
        f2 = fn(r2)
        np.asarray(f1(*a))  # compile
        np.asarray(f2(*a))  # compile
        t = {}
        for name, f, r in (("a", f1, r1), ("b", f2, r2)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(*a))
                best = min(best, time.perf_counter() - t0)
            t[name] = best
        return max(t["b"] - t["a"], 1e-9) / (r2 - r1)

    # ------------------------------------------------------------------
    # stream: bare HBM read bandwidth
    # ------------------------------------------------------------------
    if args.probe in ("all", "stream"):
        rows = args.stream_mb * 1024 * 1024 // 2048
        big = jnp.arange(rows * 2048, dtype=jnp.int32).astype(jnp.int8)
        big = big.reshape(rows, 2048)
        nbytes = rows * 2048

        chunk = 1024  # (1024, 2048) int8 = 2 MB per grid block

        def reduce_kernel(seed_ref, x_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref) + seed_ref[0]
            o_ref[:] += jnp.sum(
                x_ref[:].astype(jnp.int32), axis=0, keepdims=True
            ).reshape(1, -1)[:, :256] * jnp.ones((8, 1), jnp.int32)

        def pallas_sum(x, seed):
            # seed input makes each rep's call distinct — without it the
            # scan body is loop-invariant and XLA hoists the whole reduce
            return pl.pallas_call(
                reduce_kernel,
                grid=(rows // chunk,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((chunk, 2048), lambda i: (i, 0)),
                ],
                out_specs=pl.BlockSpec((8, 256), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
            )(seed, x)

        def make_stream(kind):
            def mk(reps):
                @jax.jit
                def run(x):
                    def body(c, _):
                        if kind == "pallas":
                            s = pallas_sum(x, c.reshape(1))
                            return c + s[0, 0], None
                        # dynamic-slice start varies with the carry so the
                        # reduce cannot be hoisted out of the rep loop
                        xs = jax.lax.dynamic_slice_in_dim(
                            x, c & 7, rows - 8, axis=0)
                        return c + jnp.sum(xs.astype(jnp.int32)), None
                    acc, _ = jax.lax.scan(
                        body, jnp.int32(0), jnp.arange(reps))
                    return acc
                return run
            return mk

        for kind in ("pallas", "xla"):
            try:
                s = timed_device_s(make_stream(kind), big)
                out({"probe": "stream", "kind": kind,
                     "mb": args.stream_mb,
                     "ms": round(s * 1e3, 3),
                     "gb_s": round(nbytes / s / 1e9, 1)})
            except Exception as e:  # noqa: BLE001
                out({"probe": "stream", "kind": kind, "error": repr(e)[:800]})

    # ------------------------------------------------------------------
    # chain: K data-dependent M-row GEMMs over distinct weights
    # ------------------------------------------------------------------
    m, K = args.m, args.k
    key = jax.random.PRNGKey(0)

    def stacked_w(h, n):
        w = jax.random.randint(key, (K, h, n), -127, 127, jnp.int8)
        return w

    def chain_case(h, n, form, step_kind):
        """form: scan | unroll ; step_kind: dot | w8a8."""
        ws = stacked_w(h, n)
        x0 = jax.random.randint(jax.random.fold_in(key, 1), (m, h),
                                -127, 127, jnp.int8)
        scale = jnp.float32(0.01)

        def dot_step(x, w):
            acc = jax.lax.dot(x, w, preferred_element_type=jnp.int32)
            # cheap VPU fold back to (m, h) int8 to chain
            y = acc[:, :h] if n >= h else jnp.pad(acc, ((0, 0), (0, h - n)))
            return (y & 127).astype(jnp.int8)

        def w8a8_step(x, w):
            # engine-shaped per-op: row amax quant + int8 dot + scale
            xf = x.astype(jnp.float32)
            ax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
            s = jnp.maximum(ax, 1e-8) / 127.0
            q = jnp.round(xf / s).astype(jnp.int8)
            acc = jax.lax.dot(q, w, preferred_element_type=jnp.int32)
            g = acc.astype(jnp.float32) * s * scale
            y = g[:, :h] if n >= h else jnp.pad(g, ((0, 0), (0, h - n)))
            return jnp.clip(y, -127, 127).astype(jnp.int8)

        step = dot_step if step_kind == "dot" else w8a8_step
        unroll = K if form == "unroll" else 1

        def mk(reps):
            @jax.jit
            def run(x):
                def rep_body(c, _):
                    def body(cc, w):
                        return step(cc, w), None
                    y, _ = jax.lax.scan(body, c, ws, unroll=unroll)
                    return y, None
                y, _ = jax.lax.scan(rep_body, x, jnp.arange(reps))
                return y
            return run

        s = timed_device_s(mk, x0)
        per_op = s / K
        wbytes = h * n
        out({"probe": "chain", "h": h, "n": n, "form": form,
             "step": step_kind,
             "ms_chain": round(s * 1e3, 3),
             "us_per_op": round(per_op * 1e6, 2),
             "w_mb_per_op": round(wbytes / 1e6, 2),
             "gb_s": round(wbytes / per_op / 1e9, 1)})

    if args.probe in ("all", "chain"):
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]
        for h, n in shapes:
            for form in args.forms.split(","):
                for step_kind in args.steps.split(","):
                    try:
                        chain_case(h, n, form, step_kind)
                    except Exception as e:  # noqa: BLE001
                        out({"probe": "chain", "h": h, "n": n,
                             "form": form, "step": step_kind,
                             "error": repr(e)[:800]})

    # ------------------------------------------------------------------
    # mega: one Pallas kernel streaming all K stacked weights
    # ------------------------------------------------------------------
    if args.probe in ("all", "mega"):
        h, n = 1024, 8448
        ws = stacked_w(h, n)
        x0 = jax.random.randint(jax.random.fold_in(key, 2), (m, h),
                                -127, 127, jnp.int8)
        wbytes = K * h * n

        def acc_kernel(x_ref, w_ref, o_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
            o_ref[:] += jax.lax.dot(
                x_ref[:], w_ref[0], preferred_element_type=jnp.int32)

        def chainx_kernel(x_ref, w_ref, o_ref, xs_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                xs_ref[:] = x_ref[:]
            acc = jax.lax.dot(
                xs_ref[:], w_ref[0], preferred_element_type=jnp.int32)
            xs_ref[:] = (acc[:, :h] & 127).astype(jnp.int8)
            @pl.when(pl.program_id(0) == K - 1)
            def _():
                o_ref[:] = acc

        def mk_mega(kind):
            def mk(reps):
                @jax.jit
                def run(x):
                    def rep_body(c, _):
                        if kind == "acc":
                            y = pl.pallas_call(
                                acc_kernel,
                                grid=(K,),
                                in_specs=[
                                    pl.BlockSpec((m, h), lambda i: (0, 0)),
                                    pl.BlockSpec((1, h, n),
                                                 lambda i: (i, 0, 0)),
                                ],
                                out_specs=pl.BlockSpec(
                                    (m, n), lambda i: (0, 0)),
                                out_shape=jax.ShapeDtypeStruct(
                                    (m, n), jnp.int32),
                            )(c, ws)
                        else:
                            y = pl.pallas_call(
                                chainx_kernel,
                                grid=(K,),
                                in_specs=[
                                    pl.BlockSpec((m, h), lambda i: (0, 0)),
                                    pl.BlockSpec((1, h, n),
                                                 lambda i: (i, 0, 0)),
                                ],
                                out_specs=pl.BlockSpec(
                                    (m, n), lambda i: (0, 0)),
                                out_shape=jax.ShapeDtypeStruct(
                                    (m, n), jnp.int32),
                                scratch_shapes=[
                                    pltpu.VMEM((m, h), jnp.int8)],
                            )(c, ws)
                        nxt = (y[:, :h] & 127).astype(jnp.int8)
                        return nxt, None
                    y, _ = jax.lax.scan(rep_body, x, jnp.arange(reps))
                    return y
                return run
            return mk

        for kind in ("acc", "chain"):
            try:
                s = timed_device_s(mk_mega(kind), x0)
                out({"probe": "mega", "kind": kind, "k": K,
                     "ms": round(s * 1e3, 3),
                     "us_per_op": round(s / K * 1e6, 2),
                     "gb_s": round(wbytes / s / 1e9, 1)})
            except Exception as e:  # noqa: BLE001
                out({"probe": "mega", "kind": kind,
                     "error": repr(e)[:800]})


if __name__ == "__main__":
    main()
