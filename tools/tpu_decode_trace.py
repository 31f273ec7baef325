#!/usr/bin/env python
"""Op-level trace of the compiled decode window (VERDICT r4 item #1b).

Runs the real engine at the bench config to steady-state decode, traces a
few multistep-window dispatches with jax.profiler, then parses the
perfetto trace to attribute device time per HLO op. This names the ops
the decode step actually spends its time on — the evidence the per-op-
floor story lacked.

Prints JSON lines: one per top op, plus a summary with the per-iteration
decomposition.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json
import time


def parse_trace(trace_dir: str):
    """Aggregate device-side events from the newest trace under trace_dir."""
    files = sorted(glob.glob(
        _os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    # device events: complete ('X') events with durations whose names are
    # HLO ops (fusion/copy/custom-call/...) — host python events all start
    # with '$' or are Pjit/PJRT wrappers
    host_markers = ("$", "PjitFunction", "PJRT_", "ParseArguments",
                    "PythonRefManager", "np.asarray", "jit_")
    agg = collections.defaultdict(lambda: [0.0, 0, ""])
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        if any(name.startswith(m) for m in host_markers):
            continue
        d = agg[name]
        d[0] += e["dur"]  # us
        d[1] += 1
        if not d[2]:
            args = e.get("args", {})
            d[2] = str(args.get("long_name", args.get("tf_op", "")))[:160]
        total += e["dur"]
    return agg, total, files[-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen-tokens", type=int, default=64)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--multistep", type=int, default=16)
    ap.add_argument("--quantization", default="int8")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--windows", type=int, default=4,
                    help="decode windows to capture in the trace")
    ap.add_argument("--trace-dir", default="/tmp/decode_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="just parse an existing trace dir")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    def out(d):
        print(json.dumps(d), flush=True)

    if not args.parse_only:
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        import numpy as np

        from vllm_i64_tpu.config import EngineConfig
        from vllm_i64_tpu.core.sampling import SamplingParams
        from vllm_i64_tpu.engine import Engine
        from vllm_i64_tpu.models import complexity_deep as cdm
        from vllm_i64_tpu.models.presets import get_preset

        cfg = get_preset("tr-hash-moe-500m")
        dtype = (jnp.float32 if jax.default_backend() == "cpu"
                 else jnp.bfloat16)
        params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
        blocks = args.requests * (
            -(-(args.prompt_len + args.gen_tokens + args.multistep + 16)
              // args.block_size))
        need = args.prompt_len + args.gen_tokens + args.multistep + 32
        max_seq = 64
        while max_seq < need:
            max_seq *= 2
        ecfg = EngineConfig(
            max_batch_size=args.max_batch,
            max_seq_len=min(max_seq, cfg.max_position_embeddings),
            max_kv_blocks=max(args.max_batch * 4, int(blocks * 1.25) + 2),
            kv_block_size=args.block_size,
            max_prefill_tokens=8192,
            quantization=args.quantization,
            decode_batch_buckets=(args.max_batch,),
            prefill_batch_buckets=(1, 2, 4, 8, 16),
            prefill_token_buckets=(args.prompt_len,
                                   max(args.prompt_len, 512)),
            multistep_decode=args.multistep,
            w8a8=args.quantization in ("int8", "int4"),
            fused_norm_quant=True,
            fuse_shared_expert=True,
            decode_chaining=True,
        )
        engine = Engine(params, cfg, ecfg)
        rng = np.random.default_rng(0)
        sps = [SamplingParams(temperature=0.0, max_tokens=args.gen_tokens)
               for _ in range(args.requests)]

        def add_all():
            return [engine.add_request(
                rng.integers(3, cfg.vocab_size,
                             size=args.prompt_len).tolist(), sp)
                    for sp in sps]

        # warmup pass: compile everything
        add_all()
        t0 = time.perf_counter()
        while engine.scheduler.has_work:
            engine.step()
        print(f"# warmup done in {time.perf_counter()-t0:.1f}s",
              file=_sys.stderr, flush=True)

        # timed pass: run until all prefills are done and we are in pure
        # decode, then trace `windows` steps
        add_all()
        # drive through prefill: step until every running request has
        # context beyond its prompt
        def in_pure_decode():
            run = engine.scheduler.running  # List[Request]
            return bool(run) and all(
                len(r.output_token_ids) > 0 for r in run)
        guard = 0
        while engine.scheduler.has_work and not in_pure_decode():
            engine.step()
            guard += 1
            if guard > 2000:
                raise RuntimeError("never reached pure decode")
        import jax.profiler
        jax.profiler.start_trace(args.trace_dir)
        nsteps = 0
        t0 = time.perf_counter()
        while engine.scheduler.has_work and nsteps < args.windows:
            engine.step()
            nsteps += 1
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f"# traced {nsteps} engine steps in {wall*1e3:.1f} ms "
              f"({args.multistep} iters each)", file=_sys.stderr, flush=True)
        iters = nsteps * args.multistep
    else:
        iters = args.windows * args.multistep

    agg, total, path = parse_trace(args.trace_dir)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    out({"trace": path, "device_total_ms": round(total / 1e3, 2),
         "iters": iters,
         "per_iter_ms": round(total / 1e3 / max(iters, 1), 3)})
    for name, (dur, cnt, long_name) in rows[: args.top]:
        out({"op": name, "total_us": round(dur, 1), "count": cnt,
             "avg_us": round(dur / cnt, 1),
             "pct": round(100 * dur / total, 1),
             "detail": long_name})


if __name__ == "__main__":
    main()
