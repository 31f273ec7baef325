#!/usr/bin/env python
"""Per-step wall-time profile of the bench workload: prefill vs decode split.

Runs the exact bench.py engine setup, then logs one line per engine step:
what was dispatched (prefill tokens / decode rows / window size) and wall ms.
Use to find where end-to-end time goes when device-side scaling says decode
is cheap but the headline number stays flat.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--gen-tokens", type=int, default=64)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--multistep", type=int, default=16)
    p.add_argument("--prefill-budget", type=int, default=512)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--fused-norm-quant", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.quantize_model import quantize_params
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset

    cfg = get_preset("tr-hash-moe-500m")
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = quantize_params(params, cfg, "int8")
    params = jax.tree_util.tree_map(jax.device_put, params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    print("[profile] params ready", flush=True)

    blocks_needed = args.requests * (
        -(-(args.prompt_len + args.gen_tokens + args.multistep + 16)
          // args.block_size))
    need = args.prompt_len + args.gen_tokens + args.multistep + 32
    max_seq = 64
    while max_seq < need:
        max_seq *= 2
    ecfg = EngineConfig(
        max_batch_size=args.max_batch,
        max_seq_len=min(max_seq, cfg.max_position_embeddings),
        max_kv_blocks=max(args.max_batch * 4, int(blocks_needed * 1.25) + 2),
        kv_block_size=args.block_size,
        max_prefill_tokens=max(args.prompt_len, args.prefill_budget),
        quantization="int8",
        decode_batch_buckets=(args.max_batch,),
        prefill_batch_buckets=(1, 2, 4, 8, 16),
        prefill_token_buckets=(args.prompt_len, max(args.prompt_len, 512)),
        multistep_decode=args.multistep,
        w8a8=True,
        fused_norm_quant=args.fused_norm_quant,
        fuse_shared_expert=True,
        decode_chaining=True,
    )
    engine = Engine(params, cfg, ecfg)

    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_tokens=args.gen_tokens)

    def run(tag, record):
        prompts = [
            rng.integers(3, cfg.vocab_size, size=args.prompt_len).tolist()
            for _ in range(args.requests)
        ]
        for pr in prompts:
            engine.add_request(pr, sp)
        rows = []
        t_start = time.perf_counter()
        while engine.scheduler.has_work:
            n_running = len(engine.scheduler.running)
            t0 = time.perf_counter()
            result = engine.step()
            ms = (time.perf_counter() - t0) * 1000
            toks = sum(len(t) for t in result.values())
            rows.append({"ms": round(ms, 1), "tokens_out": toks,
                         "running": n_running})
        total = time.perf_counter() - t_start
        if record:
            for r in rows:
                print(json.dumps(r), flush=True)
            gen = args.requests * args.gen_tokens
            print(json.dumps({
                "tag": tag, "total_s": round(total, 3),
                "steps": len(rows),
                "tok_s": round(gen / total, 1),
            }), flush=True)

    print("[profile] warmup...", flush=True)
    t0 = time.perf_counter()
    run("warmup", record=False)
    print(f"[profile] warmup {time.perf_counter()-t0:.1f}s", flush=True)
    run("timed", record=True)


if __name__ == "__main__":
    main()
