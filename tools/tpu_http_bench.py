#!/usr/bin/env python
"""Mixed-length concurrent HTTP serving benchmark (ROADMAP round-3 #4).

Starts a real server (flagship model, int8 W8A8, random-init weights) in a
subprocess, then drives the OpenAI-compatible /v1/completions endpoint with
CONCURRENT streamed requests of mixed prompt/output lengths — the workload
shape the reference's bench_comparative measures over the wire
(ref: benchmarks/bench_comparative.py:29-70), but concurrent instead of
sequential so continuous batching is actually exercised.

The client is MULTIPROCESS x asyncio (VERDICT r3 #4): N worker processes,
each running an aiohttp event loop over its share of the requests — the
round-3 threading+urllib driver serialized 64 concurrent SSE streams on
one GIL, which confounded every wire-TTFT measurement. ``--threads``
selects the legacy driver for A/B.

Prints one JSON line of aggregate metrics.

Usage:
  python tools/tpu_http_bench.py               # bench (spawns the server)
  python tools/tpu_http_bench.py --serve       # server subprocess target
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import multiprocessing
import subprocess
import threading
import time
import urllib.request


PORT = 8871


def serve(args) -> None:
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.compilation_cache:
        # step-program compiles persist across server (and bench) restarts
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if _os.environ.get("VLLM_LOG_COMPILES"):
        jax.config.update("jax_log_compiles", True)
    from vllm_i64_tpu.api import Server
    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.chat_template import ChatTemplate
    from vllm_i64_tpu.core.quantize_model import (
        fuse_gate_up_params, fuse_qkv_params, fuse_shared_expert_params,
        materialize_lm_head, quantize_params,
    )
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset

    class SyntheticTokenizer:
        """Vocab-matched byte-ish tokenizer: EVERY id decodes to a
        non-empty char, so random-init models still produce SSE text
        deltas (ByteTokenizer drops ids >= 259 -> empty streams over the
        flagship's 32k vocab; the bench must count token events at the
        HTTP boundary)."""

        eos_token_id = 0
        pad_token_id = 1
        bos_token_id = 2

        def __init__(self, vocab_size):
            self.vocab_size = vocab_size

        def encode(self, text):
            return [3 + (b % (self.vocab_size - 3))
                    for b in text.encode("utf-8")]

        def decode(self, token_ids):
            return "".join(chr(97 + (int(t) % 26)) for t in token_ids)

    cfg = get_preset("tr-hash-moe-500m")
    if args.tiny:
        cfg = cfg.replace(num_hidden_layers=2, hidden_size=256,
                          intermediate_size=512, vocab_size=1024,
                          max_position_embeddings=1024)
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = quantize_params(params, cfg, "int8")
    params = fuse_qkv_params(params)
    params = fuse_shared_expert_params(params, cfg)
    params = fuse_gate_up_params(params)
    params = materialize_lm_head(params, cfg)

    bs = 128 if jax.default_backend() != "cpu" else 16
    ecfg = EngineConfig(
        # batch 128 x K=16: the r5 sustained sweep winner (BASELINE.md);
        # two decode buckets so sub-wave residency doesn't pad 2x
        max_batch_size=128,
        max_seq_len=1024,
        max_kv_blocks=0,  # auto-size from free HBM
        kv_block_size=bs,
        max_prefill_tokens=8192,
        quantization="int8",
        w8a8=True,
        fused_norm_quant=True,
        fuse_shared_expert=True,
        multistep_decode=16,
        decode_chaining=True,
        decode_batch_buckets=(64, 128),
        prefill_batch_buckets=(1, 2, 4, 8, 16, 32, 64),
        prefill_token_buckets=(128, 512),
    )
    tok = SyntheticTokenizer(cfg.vocab_size)
    engine = Engine(params, cfg, ecfg, tokenizer=tok)
    if not args.no_warmup:
        # exhaustive program warmup matched to the bench workload (greedy +
        # min_tokens): NO step program can compile mid-measurement. Client-
        # side warmup passes (--client-warmup) are superseded by this.
        from vllm_i64_tpu.core.sampling import SamplingParams

        t0w = time.perf_counter()
        # match the bench client's EXACT traffic shape: greedy + min_tokens
        # through the HTTP API, whose repetition_penalty default is 1.1 —
        # the features must match or every program recompiles mid-pass
        n = engine.warmup(
            sampling_examples=[SamplingParams(temperature=0.0, min_tokens=1,
                                              repetition_penalty=1.1)],
            include_host_sampling=False,
        )
        print(f"[serve] warmup: {n} step programs in "
              f"{time.perf_counter() - t0w:.0f}s", flush=True)
    Server(engine, tokenizer=tok,
           chat_template=ChatTemplate.default(),
           model_name="tr-hash-moe-500m", host="127.0.0.1",
           port=args.port).run()


def stream_one(port: int, prompt: str, max_tokens: int) -> dict:
    # min_tokens suppresses EOS so every request generates its full budget
    # (random-init weights greedily emit EOS early on some prompts)
    body = {"prompt": prompt, "max_tokens": max_tokens,
            "min_tokens": max_tokens, "temperature": 0.0, "stream": True}
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    stamps = []
    with urllib.request.urlopen(req, timeout=600) as resp:
        for raw in resp:
            line = raw.decode("utf-8", errors="replace").strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            try:
                payload = json.loads(line[6:])
            except json.JSONDecodeError:
                continue
            text = payload.get("choices", [{}])[0].get("text", "")
            if text:
                # SSE chunks are COALESCED (one per delivery batch); the
                # synthetic tokenizer decodes 1 char per token, so chars
                # count tokens
                stamps.append((time.perf_counter() - t0, len(text)))
    return {"ttft": stamps[0][0] if stamps else None,
            "stamps": stamps, "total": time.perf_counter() - t0}


async def _stream_one_async(session, port: int, prompt: str,
                            max_tokens: int) -> dict:
    body = {"prompt": prompt, "max_tokens": max_tokens,
            "min_tokens": max_tokens, "temperature": 0.0, "stream": True}
    t0 = time.perf_counter()
    t0_wall = time.time()  # wall clock: comparable across client processes
    stamps = []
    wall_stamps = []
    async with session.post(
        f"http://127.0.0.1:{port}/v1/completions", json=body
    ) as resp:
        async for raw in resp.content:
            line = raw.decode("utf-8", errors="replace").strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            try:
                payload = json.loads(line[6:])
            except json.JSONDecodeError:
                continue
            text = payload.get("choices", [{}])[0].get("text", "")
            if text:
                stamps.append((time.perf_counter() - t0, len(text)))
                wall_stamps.append((time.time(), len(text)))
    return {"ttft": stamps[0][0] if stamps else None,
            "stamps": stamps, "wall_stamps": wall_stamps,
            "t0_wall": t0_wall, "total": time.perf_counter() - t0}


async def _drive_sustained_async(port: int, mkjob, concurrency: int,
                                 deadline: float) -> list:
    """Constant-concurrency closed loop: each worker slot immediately
    replaces a finished request with a fresh one until `deadline` (wall
    clock). This is the steady-state serving regime — the admission ramp
    amortizes to zero instead of dominating a short burst."""
    import asyncio

    import aiohttp

    results: list = []
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=900),
        connector=aiohttp.TCPConnector(limit=0),
    ) as session:
        async def worker(wid: int):
            n = 0
            while time.time() < deadline:
                p, g = mkjob(wid, n)
                n += 1
                try:
                    results.append(
                        await _stream_one_async(session, port, p, g))
                except Exception as e:  # noqa: BLE001
                    results.append({"error": repr(e)[:100]})

        await asyncio.gather(
            *[worker(w) for w in range(max(concurrency, 1))])
    return results


def _sustained_worker_proc(port: int, wid0: int, conc: int, duration: float,
                           uniform: bool, uniform_gen: int, conn) -> None:
    import asyncio
    import random

    def mkjob(wid, n):
        rng = random.Random((wid0 + wid) * 100003 + n)
        if uniform:
            plen, gen = 128, uniform_gen
        else:
            plen = rng.choice([16, 32, 48, 64, 96, 128, 192, 256, 384, 512])
            gen = rng.choice([16, 32, 48, 64, 96, 128])
        prompt = "".join(
            chr(97 + rng.randrange(26)) for _ in range(plen))
        return prompt, gen

    deadline = time.time() + duration
    res = asyncio.run(_drive_sustained_async(port, mkjob, conc, deadline))
    conn.send(res)
    conn.close()


def drive_sustained(port: int, concurrency: int, workers: int,
                    duration: float, uniform: bool, uniform_gen: int):
    """Sustained closed-loop load from `workers` processes x asyncio."""
    workers = max(1, min(workers, concurrency))
    conc = -(-concurrency // workers)
    ctx = multiprocessing.get_context("spawn")
    procs, pipes = [], []
    for w in range(workers):
        rx, tx = ctx.Pipe(duplex=False)
        p = ctx.Process(target=_sustained_worker_proc,
                        args=(port, w * conc, conc, duration, uniform,
                              uniform_gen, tx))
        p.start()
        procs.append(p)
        pipes.append(rx)
    results = []
    for p, rx in zip(procs, pipes):
        results.extend(rx.recv())
        p.join()
    return results


async def _drive_async(port: int, jobs: list, concurrency: int) -> list:
    import asyncio

    import aiohttp

    results = [None] * len(jobs)
    queue: "asyncio.Queue" = asyncio.Queue()
    for i, job in enumerate(jobs):
        queue.put_nowait((i, job))

    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=900),
        connector=aiohttp.TCPConnector(limit=0),
    ) as session:
        async def worker():
            while True:
                try:
                    i, (p, g) = queue.get_nowait()
                except asyncio.QueueEmpty:
                    return
                try:
                    results[i] = await _stream_one_async(session, port, p, g)
                except Exception as e:  # noqa: BLE001
                    results[i] = {"error": repr(e)[:100]}

        await asyncio.gather(*[worker() for _ in range(max(concurrency, 1))])
    return results


def _worker_proc(port: int, jobs: list, concurrency: int, conn) -> None:
    """One client process: an asyncio loop over its share of the jobs."""
    import asyncio

    res = asyncio.run(_drive_async(port, jobs, concurrency))
    conn.send(res)
    conn.close()


def drive_multiprocess(port: int, jobs: list, concurrency: int,
                       workers: int):
    """Split jobs over `workers` OS processes x asyncio — no shared GIL.

    Per-request metrics (ttft/itl) are process-local perf_counter deltas;
    only the aggregate wall clock is measured in the parent."""
    workers = max(1, min(workers, concurrency, len(jobs)))
    shards = [jobs[w::workers] for w in range(workers)]
    conc = -(-concurrency // workers)
    ctx = multiprocessing.get_context("spawn")
    procs, pipes = [], []
    t_start = time.perf_counter()
    for shard in shards:
        rx, tx = ctx.Pipe(duplex=False)
        p = ctx.Process(target=_worker_proc, args=(port, shard, conc, tx))
        p.start()
        procs.append(p)
        pipes.append(rx)
    results = [None] * len(jobs)
    for w, (p, rx) in enumerate(zip(procs, pipes)):
        shard_res = rx.recv()
        p.join()
        for j, r in enumerate(shard_res):
            results[w + j * workers] = r
    return results, time.perf_counter() - t_start


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="tiny model (smoke)")
    ap.add_argument("--port", type=int, default=PORT)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--workers", type=int,
                    default=min(8, multiprocessing.cpu_count()),
                    help="client OS processes (asyncio loop each)")
    ap.add_argument("--threads", action="store_true",
                    help="legacy GIL-bound threading client (A/B only)")
    ap.add_argument("--uniform-gen", type=int, default=64,
                    help="generation length for --uniform jobs")
    ap.add_argument("--uniform", action="store_true",
                    help="drive the ENGINE bench's exact workload shape "
                         "(128-token prompts, 64 generated, all concurrent) "
                         "instead of the mixed long-tail — the apples-to-"
                         "apples serve-vs-engine comparison")
    ap.add_argument("--startup-timeout", type=int, default=1800)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the server's exhaustive program warmup")
    ap.add_argument("--compilation-cache",
                    default="/tmp/vllm_i64_tpu_xla_cache",
                    help="persistent XLA compile cache dir ('' = off) — "
                         "makes repeat bench runs start fast")
    ap.add_argument("--client-warmup", action="store_true",
                    help="legacy client-side warmup passes (superseded by "
                         "the server's exhaustive program warmup)")
    ap.add_argument("--sustained", type=float, default=0.0,
                    help="run a closed-loop constant-concurrency load for "
                         "this many seconds (>= 60 recommended) and report "
                         "STEADY-STATE wire throughput over the window "
                         "after --ramp — the VERDICT r4 #3 regime where "
                         "the admission ramp amortizes to zero")
    ap.add_argument("--ramp", type=float, default=10.0,
                    help="seconds at the start of a --sustained run "
                         "excluded from the steady-state window")
    args = ap.parse_args()
    if args.serve:
        serve(args)
        return

    # mixed workload: prompt lengths 16..512 chars (byte tokenizer: 1
    # token per char), outputs 16..128 — a log-spread long-tail mix
    import random

    rng = random.Random(0)
    jobs = []
    for i in range(args.requests):
        if args.uniform:
            plen, gen = 128, args.uniform_gen
        else:
            plen = rng.choice([16, 32, 48, 64, 96, 128, 192, 256, 384, 512])
            gen = rng.choice([16, 32, 48, 64, 96, 128])
        prompt = "".join(chr(97 + (j * 7 + i) % 26) for j in range(plen))
        jobs.append((prompt, gen))

    srv_log = open("/tmp/tpu_http_bench_server.log", "w")
    srv = subprocess.Popen(
        [_sys.executable, _os.path.abspath(__file__), "--serve",
         "--port", str(args.port),
         "--compilation-cache", args.compilation_cache]
        + (["--cpu"] if args.cpu else [])
        + (["--tiny"] if args.tiny else [])
        + (["--no-warmup"] if args.no_warmup else []),
        stdout=srv_log, stderr=srv_log)
    try:
        t0 = time.perf_counter()
        while True:
            if srv.poll() is not None:
                print(json.dumps({"error": "server exited early"}))
                return
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{args.port}/health", timeout=5):
                    break
            except Exception:
                if time.perf_counter() - t0 > args.startup_timeout:
                    print(json.dumps({"error": "server startup timeout"}))
                    return
                time.sleep(3)
        print(f"[http-bench] server up in {time.perf_counter()-t0:.0f}s",
              file=_sys.stderr, flush=True)

        def drive_threads(job_list):
            """Legacy GIL-bound driver (--threads): kept for the A/B that
            quantifies the client-side share of wire TTFT."""
            results = [None] * len(job_list)
            idx = {"v": 0}
            lock = threading.Lock()

            def worker():
                while True:
                    with lock:
                        i = idx["v"]
                        if i >= len(job_list):
                            return
                        idx["v"] = i + 1
                    p, g = job_list[i]
                    try:
                        results[i] = stream_one(args.port, p, g)
                    except Exception as e:  # noqa: BLE001
                        results[i] = {"error": repr(e)[:100]}

            t_start = time.perf_counter()
            threads = [threading.Thread(target=worker)
                       for _ in range(args.concurrency)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return results, time.perf_counter() - t_start

        def drive(job_list):
            if args.threads:
                return drive_threads(job_list)
            return drive_multiprocess(args.port, job_list,
                                      args.concurrency, args.workers)

        # The server's exhaustive program warmup (Engine.warmup) makes the
        # timed pass compile-free even cache-cold, so client warmup passes
        # are OPT-IN now — the history: one warmup pass missed the
        # prefix-cache-TRIMMED prefill shapes, a second pass over the same
        # prefixes with distinct tails missed a GROUPING shape (arrival-
        # timing-dependent) that then compiled mid-measurement and set
        # TTFT p50 = 6.6s. Exhaustive enumeration is the fix; these passes
        # remain only for A/B against the old methodology.
        if args.client_warmup:
            warm_jobs = [(("z" + p[1:]) if len(p) > 1 else "z", g)
                         for p, g in jobs]
            t0w = time.perf_counter()
            drive(warm_jobs)
            print(f"[http-bench] warmup pass done in "
                  f"{time.perf_counter()-t0w:.0f}s",
                  file=_sys.stderr, flush=True)
            warm2_jobs = [(p[:-1] + ("y" if p[-1] != "y" else "x"), g)
                          for p, g in warm_jobs]
            t0w = time.perf_counter()
            drive(warm2_jobs)
            print(f"[http-bench] prefix-trim warmup pass done in "
                  f"{time.perf_counter()-t0w:.0f}s",
                  file=_sys.stderr, flush=True)

        if args.sustained > 0:
            t_load0 = time.time()
            results = drive_sustained(
                args.port, args.concurrency, args.workers, args.sustained,
                args.uniform, args.uniform_gen)
            ok = [r for r in results if r and "error" not in r and r["ttft"]]
            errors = len(results) - len(ok)
            w0 = t_load0 + args.ramp
            w1 = t_load0 + args.sustained
            win_tokens = sum(
                n for r in ok for (tw, n) in r.get("wall_stamps", ())
                if w0 <= tw <= w1)
            win_len = max(w1 - w0, 1e-9)
            # latency stats over requests fully inside the steady window
            steady = [r for r in ok
                      if r["t0_wall"] >= w0
                      and r["t0_wall"] + r["total"] <= w1]
            ttfts = sorted(r["ttft"] for r in steady) or [0.0]
            itls = sorted(
                b[0] - a[0] for r in steady
                for a, b in zip(r["stamps"], r["stamps"][1:])) or [0.0]
            pct = lambda xs, p: xs[min(int(len(xs) * p), len(xs) - 1)]
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{args.port}/v1/monitor",
                        timeout=10) as r:
                    mon = json.loads(r.read())
                print(f"[http-bench] server monitor: "
                      f"{json.dumps(mon)[:800]}", file=_sys.stderr,
                      flush=True)
            except Exception:
                pass
            print(json.dumps({
                "metric": "http_sustained_throughput",
                "value": round(win_tokens / win_len, 1),
                "unit": "tok/s",
                "window_s": round(win_len, 1),
                "ramp_s": args.ramp,
                "concurrency": args.concurrency,
                "workload": "uniform" if args.uniform else "mixed",
                "requests_completed": len(ok),
                "requests_in_window": len(steady),
                "errors": errors,
                "ttft_ms_p50": round(pct(ttfts, 0.5) * 1000, 1),
                "ttft_ms_p99": round(pct(ttfts, 0.99) * 1000, 1),
                "itl_ms_p50": round(pct(itls, 0.5) * 1000, 1),
                "itl_ms_p99": round(pct(itls, 0.99) * 1000, 1),
            }), flush=True)
            return
        results, wall = drive(jobs)
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/v1/monitor",
                    timeout=10) as r:
                mon = json.loads(r.read())
            print(f"[http-bench] server monitor: "
                  f"{json.dumps(mon)[:800]}", file=_sys.stderr, flush=True)
        except Exception as e:
            print(f"[http-bench] monitor failed: {e!r}", file=_sys.stderr)

        ok = [r for r in results if r and "error" not in r and r["ttft"]]
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/v1/metrics",
                    timeout=10) as r:
                met = json.loads(r.read())
            lat = met.get("latency", met)
            print(f"[http-bench] server-side latency: "
                  f"{json.dumps(lat)[:400]}", file=_sys.stderr, flush=True)
        except Exception:
            pass
        errors = len(results) - len(ok)
        err_samples = [r["error"] for r in results
                       if r and "error" in r][:3]
        empty = sum(1 for r in results
                    if r and "error" not in r and not r["ttft"])
        if err_samples or empty:
            print(f"[http-bench] exceptions={len(err_samples)} "
                  f"empty_streams={empty} samples: {err_samples}",
                  file=_sys.stderr, flush=True)
        total_tokens = sum(n for r in ok for _, n in r["stamps"])
        ttfts = sorted(r["ttft"] for r in ok)
        itls = sorted(
            b[0] - a[0]
            for r in ok for a, b in zip(r["stamps"], r["stamps"][1:]))
        pct = lambda xs, p: xs[min(int(len(xs) * p), len(xs) - 1)] if xs else 0
        print(json.dumps({
            "metric": ("http_uniform_throughput" if args.uniform else "http_mixed_throughput"),
            "value": round(total_tokens / wall, 1),
            "unit": "tok/s",
            "requests": len(ok),
            "errors": errors,
            "concurrency": args.concurrency,
            "wall_s": round(wall, 2),
            "client": "threads" if args.threads else
                      f"mp{args.workers}-asyncio",
            "ttft_ms_p50": round(pct(ttfts, 0.5) * 1000, 1),
            "ttft_ms_p99": round(pct(ttfts, 0.99) * 1000, 1),
            "itl_ms_p50": round(pct(itls, 0.5) * 1000, 1),
            "itl_ms_p99": round(pct(itls, 0.99) * 1000, 1),
        }), flush=True)
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=20)
        except subprocess.TimeoutExpired:
            srv.kill()


if __name__ == "__main__":
    main()
