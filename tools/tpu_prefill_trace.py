#!/usr/bin/env python
"""Op-level trace of the compiled PREFILL step program.

The round-5 prefill ablation showed a 1024-token dispatch (batch 8 x
chunk 128) takes ~46 ms with "gemms_only" still ~39 ms, while clean W8A8
chains at the same M=1024 shapes run at 81% of int8 peak (~4 ms for the
whole stack). This tool traces the real prefill dispatch with
jax.profiler and attributes device time per HLO op to name the gap.

Prints JSON lines: one per top op, plus a summary.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=128, help="tokens per row")
    ap.add_argument("--ctx", type=int, default=128)
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/prefill_trace")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    def out(d):
        print(json.dumps(d), flush=True)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.quantize_model import (
        fuse_gate_up_params,
        fuse_qkv_params,
        fuse_shared_expert_params,
        materialize_lm_head,
        quantize_params,
    )
    from vllm_i64_tpu.core.sampling import (
        SamplerFeatures,
        SamplingParams,
        make_param_arrays,
    )
    from vllm_i64_tpu.core.scheduler import Request
    from vllm_i64_tpu.engine.runner import ModelRunner
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset
    import jax.numpy as jnp

    cfg = get_preset("tr-hash-moe-500m")
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = quantize_params(params, cfg, "int8")
    params = fuse_qkv_params(params)
    params = fuse_shared_expert_params(params, cfg)
    params = fuse_gate_up_params(params)
    params = materialize_lm_head(params, cfg)
    print("# params ready", file=_sys.stderr, flush=True)

    B, T = args.batch, args.chunk
    blocks_per_seq = max(1, (args.ctx + args.block_size - 1) // args.block_size)
    ecfg = EngineConfig(
        max_batch_size=B,
        max_seq_len=max(256, args.ctx + 64),
        kv_block_size=args.block_size,
        max_kv_blocks=1 + B * blocks_per_seq + 8,
        max_prefill_tokens=B * T,
        dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
        kv_cache_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
        quantization="int8",
        w8a8=True,
        fused_norm_quant=jax.default_backend() != "cpu",
        decode_batch_buckets=(B,),
        prefill_batch_buckets=(B,),
        prefill_token_buckets=(T,),
    )
    runner = ModelRunner(params, cfg, ecfg)

    sp = SamplingParams(temperature=0.0)
    reqs = [
        Request(request_id=i,
                prompt_token_ids=np.arange(args.ctx, dtype=np.int64),
                max_new_tokens=8)
        for i in range(B)
    ]
    sample_args = make_param_arrays([sp] * B, reqs)
    features = SamplerFeatures.for_params([sp])
    rng = np.random.default_rng(0)

    start = args.ctx - T  # this chunk covers [start, ctx)
    token_ids = rng.integers(3, cfg.vocab_size, size=(B, T)).astype(np.int64)
    positions = np.tile(np.arange(start, args.ctx, dtype=np.int32)[None], (B, 1))
    block_tables = np.arange(
        1, 1 + B * blocks_per_seq, dtype=np.int32).reshape(B, blocks_per_seq)
    ctx_lens = np.full((B,), args.ctx, np.int32)
    last_idx = np.full((B,), T - 1, np.int32)
    valid = np.ones((B, T), bool)
    slot_ids = np.arange(B, dtype=np.int32)
    sample_mask = np.ones((B,), bool)

    def dispatch():
        toks, _ = runner.execute(
            token_ids=token_ids, positions=positions,
            block_tables=block_tables, ctx_lens=ctx_lens,
            last_idx=last_idx, valid=valid, slot_ids=slot_ids,
            sample_mask=sample_mask, sample_args=sample_args,
            features=features, kind="prefill",
        )
        return np.asarray(toks)

    t0 = time.perf_counter()
    dispatch()
    print(f"# compile+first dispatch {time.perf_counter()-t0:.1f}s",
          file=_sys.stderr, flush=True)
    for _ in range(2):
        dispatch()

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.dispatches):
            dispatch()
    wall = time.perf_counter() - t0
    print(f"# traced {args.dispatches} dispatches in {wall*1e3:.1f} ms",
          file=_sys.stderr, flush=True)

    from tpu_decode_trace import parse_trace

    agg, total, path = parse_trace(args.trace_dir)
    out({"trace": path, "device_total_ms": round(total / 1e3, 2),
         "dispatches": args.dispatches,
         "wall_ms_per_dispatch": round(wall * 1e3 / args.dispatches, 2),
         "tokens_per_dispatch": B * T})
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (us, count, detail) in rows:
        out({"op": name, "total_us": round(us, 1), "count": count,
             "avg_us": round(us / max(count, 1), 1),
             "pct": round(100 * us / max(total, 1e-9), 1),
             "detail": detail})


if __name__ == "__main__":
    main()
