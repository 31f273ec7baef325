#!/usr/bin/env python
"""Speculative-decoding on-chip profile (VERDICT r2 #7).

Measures accept-rate and NET tok/s of the engine's speculative path
(ref integration point: vllm_i64/engine/i64_engine.py:809-818 — decode-only
batches <= 8) at several batch sizes, bounding the envelope with two drafts:

- "oracle": the draft IS the target model -> accept rate ~= 1.0. The upper
  bound on speculative gain (pure dispatch-amortization win minus the
  double forward cost).
- "random": a tiny random-init draft -> accept rate ~= top-1 agreement of
  two unrelated models (near zero). The lower bound / worst-case slowdown.

A real distilled draft lands between; the batch-size policy crossover
derives from where even the ORACLE loses to plain multistep decode.

Prints one JSON line per (draft, batch) cell plus a baseline row per batch.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen-tokens", type=int, default=64)
    ap.add_argument("--num-speculative", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vllm_i64_tpu.config import EngineConfig, ModelConfig
    from vllm_i64_tpu.core.quantize_model import quantize_params
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.core.speculative import SpeculativeDecoder
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.presets import get_preset

    cfg = get_preset("tr-hash-moe-500m")
    if args.tiny:
        cfg = cfg.replace(num_hidden_layers=2, hidden_size=256,
                          intermediate_size=512, vocab_size=1024,
                          max_position_embeddings=512)
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    t0 = time.perf_counter()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    draft_cfg = cfg.replace(
        num_hidden_layers=2,
        hidden_size=max(128, cfg.hidden_size // 8),
        intermediate_size=max(256, cfg.intermediate_size // 8),
        num_attention_heads=max(2, cfg.num_attention_heads // 8),
        num_key_value_heads=max(1, cfg.num_key_value_heads // 4),
    )
    draft_params = cdm.init_params(draft_cfg, jax.random.PRNGKey(7),
                                   dtype=dtype)
    print(f"[spec] params ready in {time.perf_counter()-t0:.0f}s",
          file=_sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    batches = [int(b) for b in args.batches.split(",")]
    sp = SamplingParams(temperature=0.0, max_tokens=args.gen_tokens)

    def run(batch: int, spec) -> dict:
        ecfg = EngineConfig(
            max_batch_size=batch,
            max_seq_len=512,
            kv_block_size=128 if not args.cpu else 16,
            max_kv_blocks=batch * 8 + 8,
            max_prefill_tokens=4096,
            quantization="int8",
            decode_batch_buckets=(batch,),
            prefill_batch_buckets=(1, 2, 4, 8),
            prefill_token_buckets=(args.prompt_len,),
            # the speculative path replaces multistep for batches <= 8
            multistep_decode=16,
        )
        eng = Engine(params, cfg, ecfg, speculative=spec)
        prompts = [
            rng.integers(3, cfg.vocab_size, size=args.prompt_len).tolist()
            for _ in range(batch)
        ]
        # warmup (compile)
        wids = [eng.add_request(list(p), sp) for p in prompts]
        while eng.scheduler.has_work:
            eng.step()
        if spec is not None:
            spec.total_drafted = 0
            spec.total_accepted = 0
        t0 = time.perf_counter()
        rids = [eng.add_request(list(p), sp) for p in prompts]
        while eng.scheduler.has_work:
            eng.step()
        dt = time.perf_counter() - t0
        gen = sum(len(eng.scheduler.get_request(r).output_token_ids)
                  for r in rids)
        out = {"batch": batch, "tok_s": round(gen / dt, 1),
               "tokens": gen, "time_s": round(dt, 2)}
        if spec is not None and spec.total_drafted:
            out["accept_rate"] = round(
                spec.total_accepted / spec.total_drafted, 3)
        return out

    def mk_spec(which: str):
        kw = dict(num_speculative=args.num_speculative,
                  max_slots=16, max_seq_len=512,
                  block_size=128 if not args.cpu else 16)
        if which == "oracle":
            return SpeculativeDecoder(params, cfg, **kw)
        return SpeculativeDecoder(draft_params, draft_cfg, **kw)

    for batch in batches:
        base = run(batch, None)
        print(json.dumps({"variant": "baseline-multistep", **base}),
              flush=True)
        for which in ("oracle", "random"):
            r = run(batch, mk_spec(which))
            r["net_speedup_vs_baseline"] = round(
                r["tok_s"] / max(base["tok_s"], 1e-9), 3)
            print(json.dumps({"variant": f"spec-{which}", **r}), flush=True)


if __name__ == "__main__":
    main()
