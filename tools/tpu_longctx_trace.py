#!/usr/bin/env python
"""Trace every device dispatch of the longctx bench workload.

Wraps ModelRunner.execute / dispatch_multi_decode / resume_multi_decode /
resolve_window with wall timers and prints one line per call with the
padded shapes — finds where a 2 s engine prefill step goes when the raw
(16, 512) dispatch only costs ~185 ms (tools/tpu_prefill_ablate.py).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--long-prompt", type=int, default=1920)
    ap.add_argument("--short-prompt", type=int, default=128)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--gen", type=int, default=96)
    ap.add_argument("--multistep", type=int, default=16)
    ap.add_argument("--prefill-budget", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.quantize_model import quantize_params
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.engine import runner as runner_mod
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset

    cfg = get_preset("tr-hash-moe-500m")
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = quantize_params(params, cfg, "int8")
    params = jax.tree_util.tree_map(jax.device_put, params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    print("[trace] params ready", flush=True)

    long_p, short_p = args.long_prompt, args.short_prompt
    n = args.requests
    mixed = [long_p] * (n // 2) + [short_p] * (n - n // 2)
    blocks = n * (-(-(long_p + args.gen + args.multistep + 16) // 128))
    ecfg = EngineConfig(
        max_batch_size=n,
        max_seq_len=2048,
        max_kv_blocks=int(blocks * 1.25) + 2,
        kv_block_size=128,
        max_prefill_tokens=max(512, args.prefill_budget),
        quantization="int8",
        decode_batch_buckets=(n,),
        prefill_batch_buckets=(1, 2, 4, 8, 16),
        prefill_token_buckets=(128, 512),
        multistep_decode=args.multistep,
        w8a8=True,
        fused_norm_quant=True,
        fuse_shared_expert=True,
        decode_chaining=True,
    )
    engine = Engine(params, cfg, ecfg)

    # --- instrument the runner ------------------------------------------
    events = []
    r = engine.runner
    real_execute = r.execute
    real_dmd = r.dispatch_multi_decode
    real_rmd = r.resume_multi_decode
    real_resolve = r.resolve_window

    def execute(token_ids, positions, block_tables, ctx_lens, *a, **kw):
        t0 = time.perf_counter()
        out = real_execute(token_ids, positions, block_tables, ctx_lens,
                           *a, **kw)
        dt = (time.perf_counter() - t0) * 1e3
        if kw.get("defer"):
            tag = "enqueue"
        else:
            tag = "exec+sync"
        pos = np.asarray(positions)
        # per-row real chunk spans (first pos, ctx_len) to distinguish
        # fresh chunks from re-dispatches
        spans = list(zip(pos[:, 0].tolist(),
                         np.asarray(ctx_lens).tolist()))[:8]
        events.append((tag, kw.get("kind", "?"), token_ids.shape,
                       block_tables.shape, round(dt, 1), spans))
        return out

    def dmd(*a, **kw):
        t0 = time.perf_counter()
        out = real_dmd(*a, **kw)
        events.append(("win-dispatch", "decode", a[0].shape,
                       a[2].shape, round((time.perf_counter()-t0)*1e3, 1)))
        return out

    def rmd(prev, block_tables, ctx):
        t0 = time.perf_counter()
        out = real_rmd(prev, block_tables, ctx)
        events.append(("win-resume", "decode", (prev.b,),
                       block_tables.shape,
                       round((time.perf_counter()-t0)*1e3, 1)))
        return out

    def resolve(win):
        t0 = time.perf_counter()
        out = real_resolve(win)
        events.append(("win-resolve", "decode", (win.b,), (),
                       round((time.perf_counter()-t0)*1e3, 1)))
        return out

    r.execute = execute
    r.dispatch_multi_decode = dmd
    r.resume_multi_decode = rmd
    r.resolve_window = resolve

    rng = np.random.default_rng(0)

    def run(record):
        for pl_ in mixed:
            engine.add_request(
                rng.integers(3, cfg.vocab_size, size=pl_).tolist(),
                SamplingParams(temperature=0.0, max_tokens=args.gen))
        steps = 0
        t_all = time.perf_counter()
        while engine.scheduler.has_work:
            t0 = time.perf_counter()
            engine.step()
            steps += 1
            if record:
                events.append(("STEP", steps, (), (),
                               round((time.perf_counter()-t0)*1e3, 1)))
        return time.perf_counter() - t_all

    print("[trace] warmup...", flush=True)
    t0 = time.perf_counter()
    run(record=False)
    print(f"[trace] warmup {time.perf_counter()-t0:.1f}s", flush=True)
    events.clear()
    total = run(record=True)
    gen_tokens = n * args.gen
    for e in events[:400]:
        print(e, flush=True)
    print(f"[trace] total {total:.2f}s, {gen_tokens/total:.1f} tok/s",
          flush=True)


if __name__ == "__main__":
    main()
