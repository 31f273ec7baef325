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
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--gen-tokens", type=int, default=64)
    p.add_argument("--max-batch", type=int, default=64,
                   help="sweep on v5e (2026-08-19): 16 -> 2709 tok/s, "
                        "64 -> 4722, 128 -> 3388 (gather over-read); 64 is "
                        "the single-chip sweet spot")
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
                   help="KV cache block size in tokens (v5e sweep: 128 "
                        "more than halves decode gather time vs 16)")
    p.add_argument("--fuse-shared", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fold the shared expert into the flat-expert MoE "
                        "(one gate/up/down GEMM set per layer)")
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

    import numpy as np

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.quantize_model import param_bytes, quantize_params
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
    if args.quantization == "int8":
        params = quantize_params(params, cfg, "int8")
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x), params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    log(
        f"[bench] params ready in {time.perf_counter()-t0:.1f}s "
        f"({cdm.num_parameters(params)/1e6:.1f}M, {param_bytes(params)/1e6:.0f} MB)"
    )

    # size the KV pool for the whole workload: every request resident with
    # prompt + output + multistep headroom (the EngineConfig auto default of
    # batch*8 blocks preempt-thrashes at high request counts)
    blocks_needed = args.requests * (
        -(-(args.prompt_len + args.gen_tokens + args.multistep + 16)
          // args.block_size))
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
        prefill_batch_buckets=(1, 2, 4, 8, 16),
        # rows pad to the CHUNK length, not the whole budget — a 128-token
        # prompt must not burn a 512-wide prefill row
        prefill_token_buckets=(args.prompt_len, max(args.prompt_len, 512)),
        multistep_decode=args.multistep,
        w8a8=args.w8a8 and args.quantization == "int8",
        fused_norm_quant=args.fused_norm_quant,
        fuse_shared_expert=args.fuse_shared,
        decode_chaining=args.chain,
    )
    engine = Engine(params, cfg, ecfg)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(3, cfg.vocab_size, size=args.prompt_len).tolist()
        for _ in range(args.requests)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=args.gen_tokens)

    # Warmup: one UNTIMED pass with the exact request pattern of the timed
    # run, so every program variant (prefill batch buckets, multistep decode,
    # block-table growth buckets) is compiled before measurement.
    log("[bench] warmup (full untimed pass, compiling all step programs)...")
    t0 = time.perf_counter()
    warm_prompts = [
        rng.integers(3, cfg.vocab_size, size=args.prompt_len).tolist()
        for _ in range(args.requests)
    ]
    warm_ids = [engine.add_request(pr, sp) for pr in warm_prompts]
    guard = 0
    warmup_budget_s = 480.0
    while engine.scheduler.has_work and guard < 10000:
        engine.step()
        guard += 1
        if time.perf_counter() - t0 > warmup_budget_s:
            log("[bench] warmup budget reached — cancelling leftovers")
            for wid in warm_ids:
                engine.cancel_request(wid)
            break
    log(f"[bench] warmup done in {time.perf_counter()-t0:.1f}s")
    # perf counters accumulated warmup compiles — reset so the perf line
    # reflects the timed run only
    for k in engine._perf:
        engine._perf[k] = 0.0
    engine.total_steps = 0
    engine.total_tokens_generated = 0

    # Timed run: continuous batching over all requests
    _progress["timed_run_started"] = True
    first_token_at = {}
    t_start = time.perf_counter()
    rids = [engine.add_request(pr, sp) for pr in prompts]
    rid_set = set(rids)
    peak_batch = 0
    step_times = []
    total_tokens = 0
    while engine.scheduler.has_work:
        t_s = time.perf_counter()
        result = engine.step()
        step_times.append((time.perf_counter() - t_s) * 1000)
        now = time.perf_counter()
        for rid, toks in result.items():
            if toks and rid in rid_set and rid not in first_token_at:
                first_token_at[rid] = (now - t_start) * 1000
        total_tokens += sum(len(t) for t in result.values())
        peak_batch = max(peak_batch, len(engine.scheduler.running))
    elapsed = time.perf_counter() - t_start

    perf = engine.get_stats()["perf"]
    log(f"[bench] perf: {json.dumps({k: round(v, 2) for k, v in perf.items()})}")

    gen_tokens = sum(
        len(engine.scheduler.get_request(r).output_token_ids) for r in rids
    )
    throughput = gen_tokens / elapsed
    ttft = sorted(first_token_at.values())
    itl = sorted(step_times)

    def pct(a, q):
        return a[min(len(a) - 1, int(q * len(a)))] if a else 0.0

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
        "total_time_s": round(elapsed, 2),
        "ttft_ms_p50": round(pct(ttft, 0.5), 1),
        "ttft_ms_p99": round(pct(ttft, 0.99), 1),
        "itl_ms_avg": round(sum(itl) / max(len(itl), 1), 2),
        "itl_ms_p50": round(pct(itl, 0.5), 2),
        "itl_ms_p99": round(pct(itl, 0.99), 2),
        "total_tokens": int(gen_tokens),
        "peak_batch": int(peak_batch),
        "device": f"{dev.platform}",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
