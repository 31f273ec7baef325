#!/usr/bin/env python
"""int4 vs int8 under KV pressure at an EQUAL total memory budget
(VERDICT r4 #4).

int4's r4-measured value is footprint: 395 vs 596 MB serving weights.
On a 16 GB chip serving 500M-param models the freed ~200 MB never binds
— the auto-sized pool dwarfs any workload. This tool constructs the
regime where it must matter: BOTH quantizations get the same total
budget for weights + KV pool (as a smaller accelerator or a
many-models-per-chip deployment would), so int8's bigger weights come
straight out of its block pool. Under a long-context workload whose
resident KV demand sits between the two pool sizes, int8 must
preempt-thrash while int4 stays resident.

Prints one JSON line per quantization with throughput/TTFT/preemptions.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-mb", type=int, default=1024,
                    help="total weights+KV budget both configs must fit")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=1024)
    ap.add_argument("--gen-tokens", type=int, default=96)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--multistep", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--quant", default="int8,int4")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.quantize_model import param_bytes
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset

    cfg = get_preset("tr-hash-moe-500m")
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    rng = np.random.default_rng(0)

    per_block = (2 * cfg.num_hidden_layers * args.block_size
                 * cfg.num_key_value_heads * cfg.head_dim * 2)

    def pct(a, q):
        return a[min(len(a) - 1, int(q * len(a)))] if a else 0.0

    for quant in args.quant.split(","):
        ecfg = EngineConfig(
            max_batch_size=args.max_batch,
            max_seq_len=2048,
            max_kv_blocks=64,  # placeholder; resized below from the budget
            kv_block_size=args.block_size,
            max_prefill_tokens=8192,
            quantization=quant,
            decode_batch_buckets=(args.max_batch,),
            prefill_batch_buckets=(1, 2, 4, 8, 16),
            prefill_token_buckets=(128, 512),
            multistep_decode=args.multistep,
            w8a8=True, fused_norm_quant=True, fuse_shared_expert=True,
            decode_chaining=True,
        )
        probe = Engine(params, cfg, ecfg)
        wbytes = param_bytes(probe.runner.params)
        blocks = int((args.budget_mb * 1e6 - wbytes) // per_block)
        if blocks < 8:
            print(json.dumps({"quant": quant, "error": "budget below weights"}))
            continue
        del probe
        import dataclasses
        ecfg = dataclasses.replace(ecfg, max_kv_blocks=blocks)
        eng = Engine(params, cfg, ecfg)
        print(f"[pressure] {quant}: weights {wbytes/1e6:.0f} MB -> "
              f"{blocks} KV blocks "
              f"({blocks * args.block_size} tokens) in "
              f"{args.budget_mb} MB budget", file=_sys.stderr, flush=True)

        def one_pass():
            sps = [SamplingParams(temperature=0.0,
                                  max_tokens=args.gen_tokens)
                   for _ in range(args.requests)]
            first = {}
            t0 = time.perf_counter()
            rids = [eng.add_request(
                rng.integers(3, cfg.vocab_size,
                             size=args.prompt_len).tolist(), sp)
                for sp in sps]
            rset = set(rids)
            guard = 0
            while eng.scheduler.has_work and guard < 30000:
                res = eng.step()
                now = time.perf_counter()
                for rid, toks in res.items():
                    if toks and rid in rset and rid not in first:
                        first[rid] = (now - t0) * 1000
                guard += 1
            el = time.perf_counter() - t0
            gen = sum(len(eng.scheduler.get_request(r).output_token_ids)
                      for r in rids)
            return gen / el, sorted(first.values())

        one_pass()  # warmup (compiles)
        eng.scheduler.num_preemptions = 0
        thr, ttfts = [], []
        for _ in range(args.epochs):
            t, f = one_pass()
            thr.append(t)
            ttfts.extend(f)
        thr.sort()
        ttfts.sort()
        stats = eng.get_stats()
        print(json.dumps({
            "quant": quant,
            "budget_mb": args.budget_mb,
            "weights_mb": round(wbytes / 1e6),
            "kv_blocks": blocks,
            "tok_s_median": round(thr[len(thr) // 2], 1),
            "tok_s_epochs": [round(t, 1) for t in thr],
            "ttft_ms_p50": round(pct(ttfts, 0.5), 1),
            "ttft_ms_p99": round(pct(ttfts, 0.99), 1),
            "preemptions": eng.scheduler.num_preemptions,
        }), flush=True)


if __name__ == "__main__":
    main()
