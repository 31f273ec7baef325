#!/usr/bin/env python
"""Benchmark driver: tr-hash-moe-500m INT8 continuous-batching throughput.

Mirrors the reference bench harness metrics (ref: benchmarks/bench_engine.py
:23-37 — ttft_ms, itl p50/p99, throughput_tok_s, peak_batch) on the
north-star config: INT8 weights + paged KV + continuous batching on one
TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
(extra diagnostic keys included after the required four).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tr-hash-moe-500m")
    p.add_argument("--quantization", default="int8")
    p.add_argument("--requests", type=int, default=256,
                   help="requests per timed epoch (r5 protocol: >=256 so "
                        "the timed window is seconds, not the 0.91 s of "
                        "r4's 64-request pass; max_batch still caps "
                        "concurrent residency, the rest queue as in real "
                        "serving)")
    p.add_argument("--epochs", type=int, default=3,
                   help="timed epochs after warmup; the reported value is "
                        "the MEDIAN epoch throughput (BASELINE.md records "
                        "+-8%% same-commit single-epoch noise; one epoch "
                        "cannot resolve a perf change)")
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--gen-tokens", type=int, default=64)
    p.add_argument("--max-batch", type=int, default=128,
                   help="r5 sustained sweep on v5e (2026-08-21, flat-page "
                        "cache, 3-epoch medians): 64 -> 9044 tok/s, 96 -> "
                        "9580, 128 -> 11261, 192 -> 9833 (1.33-wave pad), "
                        "256 -> 11453 but epoch-1 compile stall + ITL p99 "
                        "3.2 s; K=32 at 128 no gain. 128 is the sweet spot "
                        "(the r3-era 128 -> 3388 gather over-read penalty "
                        "died with flat pages); ITL p99 trades 173 -> "
                        "220 ms vs batch 64")
    p.add_argument("--multistep", type=int, default=16,
                   help="decode iterations fused per device dispatch")
    p.add_argument("--prefill-budget", type=int, default=8192,
                   help="chunked-prefill token budget per step (per-row "
                        "chunks still cap at the widest token bucket; a "
                        "large budget lets one dispatch carry many whole "
                        "prompts instead of paying a round trip per 512 "
                        "tokens)")
    p.add_argument("--max-seq-len", type=int, default=0,
                   help="engine max_seq_len; 0 = sized to the workload "
                        "(tight max_seq_len keeps the block-table buckets "
                        "small, which keeps remote compiles fast)")
    p.add_argument("--w8a8", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="dynamic int8 activations into int8 MXU matmuls "
                        "(matches the reference's quantize_dynamic numerics; "
                        "--no-w8a8 for weight-only dequant)")
    p.add_argument("--chain", action=argparse.BooleanOptionalAction,
                   default=True, help="pipelined multistep window chaining")
    p.add_argument("--fused-norm-quant", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fuse rmsnorm + int8 activation quant into one "
                        "kernel feeding the W8A8 GEMMs (numerics identical; "
                        "measured +3.5%% on v5e, 2026-08-19 A/B)")
    p.add_argument("--block-size", type=int, default=128,
                   help="KV cache block size in tokens (v5e sweeps: 128 "
                        "more than halves decode gather time vs 16; 256 "
                        "LOSES both configs — main 3322 vs 4775 tok/s, "
                        "longctx 165 vs 210 — coarser blocks over-read at "
                        "short ctx and bloat window merges)")
    p.add_argument("--fuse-shared", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fold the shared expert into the flat-expert MoE "
                        "(one gate/up/down GEMM set per layer)")
    p.add_argument("--suite", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="also run + record the long/mixed-context config "
                        "(driver regression guard for the flash-window "
                        "decode crossover; --no-suite for the single "
                        "short-prompt config)")
    p.add_argument("--longctx-prompt", type=int, default=1920)
    p.add_argument("--longctx-gen", type=int, default=96)
    p.add_argument("--longctx-requests", type=int, default=16)
    p.add_argument("--compilation-cache",
                   default="/tmp/vllm_i64_tpu_jax_cache",
                   help="persistent XLA compile-cache dir shared across "
                        "runs on this host (empty string disables)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--tiny", action="store_true", help="tiny model (smoke test)")
    p.add_argument("--watchdog-s", type=int, default=1800,
                   help="abort if the timed run hasn't STARTED by this "
                        "deadline — device calls through a dead remote "
                        "tunnel hang forever with no timeout (0 = off)")
    args = p.parse_args()

    # watchdog: a dead TPU tunnel makes the first jax call hang forever;
    # fail fast with a diagnostic instead of wedging the harness
    import os
    import threading

    _progress = {"timed_run_started": False}
    if args.watchdog_s:
        def _watchdog():
            import time as _t

            _t.sleep(args.watchdog_s)
            if not _progress["timed_run_started"]:
                log(f"[bench] WATCHDOG: timed run not reached within "
                    f"{args.watchdog_s}s — device/tunnel likely hung; "
                    f"aborting")
                os._exit(3)

        threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.compilation_cache:
        # persistent XLA compile cache: first-use compiles through the
        # remote-TPU tunnel run minutes-cold (a single step program can
        # block >8 min on a cold day); the cache makes warmup ~seconds on
        # every later run on this host (mirrors `serve --compilation-cache`)
        try:
            import os as _osc

            _osc.makedirs(args.compilation_cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir",
                              args.compilation_cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception as e:  # pragma: no cover
            log(f"[bench] compilation cache unavailable: {e}")

    import numpy as np

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.quantize_model import param_bytes
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset

    # --- device acquisition with retry/backoff -------------------------
    # The remote device tunnel has documented multi-minute outage epochs;
    # a single un-retried jax.devices() call must not decide whether the
    # round has a perf number. Retry with backoff inside the watchdog
    # budget; on final failure emit a parseable JSON error line (stdout)
    # so the harness always records a structured result.
    acquire_budget_s = (
        0 if args.cpu else max(60, (args.watchdog_s or 1800) - 300))
    dev = jax.devices()[0] if args.cpu else None
    t_acq = time.perf_counter()
    attempt = 0
    backoff = 15.0
    last_err = None
    while time.perf_counter() - t_acq < acquire_budget_s:
        attempt += 1
        try:
            # jax.devices() can HANG (not raise) through a dead tunnel —
            # probe in a subprocess with a hard timeout so we can retry.
            import subprocess

            probe_timeout = max(30, min(
                180, acquire_budget_s - (time.perf_counter() - t_acq)))
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices()[0]; "
                 "print(d.platform, getattr(d, 'device_kind', '?'))"],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if r.returncode == 0 and r.stdout.strip():
                dev = jax.devices()[0]  # tunnel proven up; bind in-process
                break
            last_err = (r.stderr or r.stdout).strip()[-300:]
        except subprocess.TimeoutExpired:
            last_err = (
                f"jax.devices() probe timed out after {probe_timeout:.0f}s")
        except Exception as e:  # pragma: no cover - depends on tunnel state
            last_err = repr(e)[-300:]
        wait = min(backoff, acquire_budget_s - (time.perf_counter() - t_acq))
        if wait <= 0:
            break
        log(f"[bench] device acquisition attempt {attempt} failed "
            f"({last_err}); retrying in {wait:.0f}s")
        time.sleep(wait)
        backoff = min(backoff * 1.6, 120.0)
    if dev is None:
        print(json.dumps({
            "metric": "tokens_per_sec_per_chip",
            "value": 0.0,
            "unit": "tok/s",
            "vs_baseline": 0.0,
            "error": "device_unavailable",
            "detail": f"backend unavailable after {attempt} attempts over "
                      f"{time.perf_counter()-t_acq:.0f}s: {last_err}",
        }))
        sys.exit(0)
    log(f"[bench] device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
        f"(acquired after {attempt} attempt(s), "
        f"{time.perf_counter()-t_acq:.0f}s)")

    cfg = get_preset(args.model)
    if args.tiny:
        cfg = cfg.replace(num_hidden_layers=2, hidden_size=256, intermediate_size=512,
                          vocab_size=1024, max_position_embeddings=512)

    import jax.numpy as jnp

    # CPU XLA lacks bf16 x bf16 dot support — use f32 there
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    t0 = time.perf_counter()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if args.quantization in ("int8", "int4", "fp8"):
        # quantization itself happens inside Engine init, AFTER the float
        # weight fusions (fuse_qkv / fuse_shared_expert) — for int4 that
        # 128-aligns every matmul so the whole model rides the fused
        # in-kernel-dequant Pallas path (ops/int4_matmul.py)
        pass
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x), params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    log(
        f"[bench] params ready in {time.perf_counter()-t0:.1f}s "
        f"({cdm.num_parameters(params)/1e6:.1f}M float; engine quantizes "
        f"to {args.quantization})"
    )

    # size the KV pool for the whole workload: every request resident with
    # prompt + output + multistep headroom (the EngineConfig auto default of
    # batch*8 blocks preempt-thrashes at high request counts)
    blocks_needed = args.requests * (
        -(-(args.prompt_len + args.gen_tokens + args.multistep + 16)
          // args.block_size))
    suite = args.suite and not args.tiny
    if args.max_seq_len:
        max_seq = args.max_seq_len
    else:
        need = args.prompt_len + args.gen_tokens + args.multistep + 32
        max_seq = 64
        while max_seq < need:
            max_seq *= 2
    ecfg = EngineConfig(
        max_batch_size=args.max_batch,
        max_seq_len=min(max_seq, cfg.max_position_embeddings),
        max_kv_blocks=max(args.max_batch * 4,
                          int(blocks_needed * 1.25) + 2),
        kv_block_size=args.block_size,
        # batched chunked prefill: several prompts per prefill dispatch
        max_prefill_tokens=max(args.prompt_len, args.prefill_budget),
        quantization=args.quantization,
        decode_batch_buckets=(args.max_batch,),
        # up to a full wave per prefill dispatch (the engine's budget-aware
        # splitter keeps bucketed batch x token <= the chunk budget); each
        # dispatch costs fixed host/tunnel overhead, so one 64 x 128
        # dispatch replaces eight 8 x 128 ones (r5: prefill step 580 ms ->
        # ~150 ms)
        prefill_batch_buckets=(1, 2, 4, 8, 16, 32, 64),
        # rows pad to the CHUNK length, not the whole budget — a 128-token
        # prompt must not burn a 512-wide prefill row
        prefill_token_buckets=(args.prompt_len, max(args.prompt_len, 512)),
        multistep_decode=args.multistep,
        # int8 -> W8A8 (native int8x int8 MXU); int4 -> W4A8 (int8
        # activations against in-kernel-dequantized nibbles)
        w8a8=args.w8a8 and args.quantization in ("int8", "int4"),
        fused_norm_quant=args.fused_norm_quant,
        fuse_shared_expert=args.fuse_shared,
        decode_chaining=args.chain,
    )
    engine = Engine(params, cfg, ecfg)
    if engine.runner is not None:
        log(f"[bench] serving weights: "
            f"{param_bytes(engine.runner.params)/1e6:.0f} MB "
            f"({args.quantization})")

    rng = np.random.default_rng(0)

    def pct(a, q):
        return a[min(len(a) - 1, int(q * len(a)))] if a else 0.0

    def _one_pass(eng, prompt_lens, sps):
        """One timed continuous-batching pass over fresh random prompts."""
        prompts = [
            rng.integers(3, cfg.vocab_size, size=pl_).tolist()
            for pl_ in prompt_lens
        ]
        first_token_at = {}
        t_start = time.perf_counter()
        rids = [eng.add_request(pr, sp_) for pr, sp_ in zip(prompts, sps)]
        rid_set = set(rids)
        peak_batch = 0
        step_times = []
        while eng.scheduler.has_work:
            t_s = time.perf_counter()
            result = eng.step()
            step_times.append((time.perf_counter() - t_s) * 1000)
            now = time.perf_counter()
            for rid, toks in result.items():
                if toks and rid in rid_set and rid not in first_token_at:
                    first_token_at[rid] = (now - t_start) * 1000
            peak_batch = max(peak_batch, len(eng.scheduler.running))
        elapsed = time.perf_counter() - t_start
        gen = sum(
            len(eng.scheduler.get_request(r).output_token_ids) for r in rids
        )
        return {
            "throughput": gen / elapsed,
            "elapsed": elapsed,
            "tokens": gen,
            "peak_batch": peak_batch,
            "ttft": sorted(first_token_at.values()),
            "itl": step_times,
        }

    def run_workload(eng, prompt_lens, gen_tokens, label,
                     warmup: bool = True, epochs: int = 1):
        """Warm (untimed, same request pattern) then run `epochs` timed
        continuous-batching passes; the headline throughput is the MEDIAN
        epoch (r5 protocol — single epochs carry +-8% noise), latency
        percentiles pool all epochs' samples."""
        sps = [SamplingParams(temperature=0.0, max_tokens=gen_tokens)
               for _ in prompt_lens]
        if warmup:
            log(f"[bench] warmup[{label}] (full untimed pass, compiling "
                f"all step programs)...")
            t0 = time.perf_counter()
            # warmup needs the program space, not the full request count:
            # enough requests to fill max_batch and exercise the queue
            warm_n = min(len(prompt_lens),
                         2 * eng.engine_config.max_batch_size)
            warm_ids = [
                eng.add_request(
                    rng.integers(3, cfg.vocab_size, size=pl_).tolist(), sp_)
                for pl_, sp_ in zip(prompt_lens[:warm_n], sps[:warm_n])
            ]
            guard = 0
            while eng.scheduler.has_work and guard < 20000:
                eng.step()
                guard += 1
                if time.perf_counter() - t0 > 480.0:
                    log("[bench] warmup budget reached — cancelling leftovers")
                    for wid in warm_ids:
                        eng.cancel_request(wid)
                    break
            log(f"[bench] warmup[{label}] done in "
                f"{time.perf_counter()-t0:.1f}s")
        # perf counters accumulated warmup compiles — reset so the perf
        # line reflects the timed run only
        for k in eng._perf:
            eng._perf[k] = 0.0
        eng.total_steps = 0
        eng.total_tokens_generated = 0

        passes = [_one_pass(eng, prompt_lens, sps) for _ in range(epochs)]

        perf = eng.get_stats()["perf"]
        log(f"[bench] perf[{label}] (all {epochs} epochs): "
            f"{json.dumps({k: round(v, 2) for k, v in perf.items()})}")
        thr = sorted(p["throughput"] for p in passes)
        log(f"[bench] epochs[{label}]: "
            f"{[round(p['throughput'], 1) for p in passes]} tok/s")
        ttft_ = sorted(t for p in passes for t in p["ttft"])
        itl_ = sorted(t for p in passes for t in p["itl"])
        return {
            "throughput": thr[len(thr) // 2],
            "throughput_epochs": [round(t, 2) for t in thr],
            "throughput_min": thr[0],
            "throughput_max": thr[-1],
            "elapsed": sum(p["elapsed"] for p in passes) / len(passes),
            "ttft_p50": pct(ttft_, 0.5),
            "ttft_p99": pct(ttft_, 0.99),
            "itl_avg": sum(itl_) / max(len(itl_), 1),
            "itl_p50": pct(itl_, 0.5),
            "itl_p99": pct(itl_, 0.99),
            "tokens": passes[0]["tokens"],
            "peak_batch": max(p["peak_batch"] for p in passes),
        }

    _progress["timed_run_started"] = True
    main_m = run_workload(
        engine, [args.prompt_len] * args.requests, args.gen_tokens, "main",
        epochs=max(1, args.epochs))
    throughput = main_m["throughput"]
    elapsed = main_m["elapsed"]

    # vs_baseline: published reference number if any; else the in-environment
    # measured reference CPU engine (MEASURED_BASELINE.json / BASELINE.md —
    # its sequential single-request path; its batched path crashes)
    vs_baseline = 1.0
    import os as _os

    here = _os.path.dirname(_os.path.abspath(__file__))
    try:
        with open(_os.path.join(here, "BASELINE.json")) as f:
            published = json.load(f).get("published", {})
        base = published.get("tokens_per_sec_per_chip")
        if not base:
            with open(_os.path.join(here, "MEASURED_BASELINE.json")) as f:
                base = json.load(f).get(
                    "reference_cpu_int8_sequential_tok_s")
        if base:
            vs_baseline = throughput / float(base)
    except Exception:
        pass

    out = {
        "metric": "tokens_per_sec_per_chip",
        "value": round(throughput, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs_baseline, 3),
        "model": args.model,
        "quantization": args.quantization,
        "num_requests": args.requests,
        "prompt_len": args.prompt_len,
        "output_len": args.gen_tokens,
        "epochs": max(1, args.epochs),
        "throughput_epochs": main_m["throughput_epochs"],
        "throughput_min": round(main_m["throughput_min"], 2),
        "throughput_max": round(main_m["throughput_max"], 2),
        "total_time_s": round(elapsed, 2),
        "ttft_ms_p50": round(main_m["ttft_p50"], 1),
        "ttft_ms_p99": round(main_m["ttft_p99"], 1),
        "itl_ms_avg": round(main_m["itl_avg"], 2),
        "itl_ms_p50": round(main_m["itl_p50"], 2),
        "itl_ms_p99": round(main_m["itl_p99"], 2),
        "total_tokens": int(main_m["tokens"]),
        "peak_batch": int(main_m["peak_batch"]),
        "device": f"{dev.platform}",
    }

    # Second driver-recorded config: long + mixed-length serving (the
    # flash-window decode crossover and chunked-prefill/packing behavior
    # are invisible to the short-prompt config; VERDICT r2 weak #4). A
    # separate engine over the SAME prepared weights: long contexts need
    # wide block-table buckets (where the auto flash-window policy
    # dispatches the Pallas kernel) that would slow the short config's
    # gather if shared.
    if suite:
        long_p = min(args.longctx_prompt,
                     cfg.max_position_embeddings - args.longctx_gen - 8)
        mixed = ([long_p] * (args.longctx_requests // 2)
                 + [args.prompt_len] * (args.longctx_requests
                                        - args.longctx_requests // 2))
        try:
            lc_blocks = args.longctx_requests * (
                -(-(long_p + args.longctx_gen + args.multistep + 16)
                  // args.block_size))
            lc_ecfg = EngineConfig(
                max_batch_size=args.longctx_requests,
                max_seq_len=min(2048, cfg.max_position_embeddings),
                max_kv_blocks=int(lc_blocks * 1.25) + 2,
                kv_block_size=args.block_size,
                max_prefill_tokens=max(512, args.prefill_budget),
                quantization=args.quantization,
                decode_batch_buckets=(args.longctx_requests,),
                prefill_batch_buckets=(1, 2, 4, 8, 16, 32, 64),
                prefill_token_buckets=(128, 512),
                multistep_decode=args.multistep,
                w8a8=args.w8a8 and args.quantization in ("int8", "int4"),
                fused_norm_quant=args.fused_norm_quant,
                fuse_shared_expert=args.fuse_shared,
                decode_chaining=args.chain,
            )
            lc_engine = Engine(engine.runner.params, cfg, lc_ecfg)
            lm = run_workload(lc_engine, mixed, args.longctx_gen, "longctx",
                              epochs=max(1, args.epochs))
            out.update({
                "longctx_tokens_per_sec": round(lm["throughput"], 2),
                "longctx_throughput_epochs": lm["throughput_epochs"],
                "longctx_prompt_len": int(long_p),
                "longctx_num_requests": int(args.longctx_requests),
                "longctx_output_len": int(args.longctx_gen),
                "longctx_ttft_ms_p50": round(lm["ttft_p50"], 1),
                "longctx_ttft_ms_p99": round(lm["ttft_p99"], 1),
                "longctx_itl_ms_p50": round(lm["itl_p50"], 2),
                "longctx_itl_ms_p99": round(lm["itl_p99"], 2),
                "longctx_total_tokens": int(lm["tokens"]),
            })
        except Exception as e:  # the primary number must survive regardless
            log(f"[bench] longctx config failed: {e!r}")
            out["longctx_error"] = repr(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
