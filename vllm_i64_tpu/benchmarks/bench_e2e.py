"""Prefill/decode throughput by prompt length
(ref: benchmarks/bench_e2e.py:18-50 — prefill tok/s at {128,256,512,1024},
decode tok/s)."""

from __future__ import annotations

import json
import time
from typing import List


def run_e2e_bench(model: str = "tr-hash-moe-500m",
                  prompt_lens: List[int] = (128, 256, 512, 1024),
                  decode_tokens: int = 64,
                  quantization: str = "int8",
                  tiny: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import EngineConfig
    from ..core.quantize_model import quantize_params
    from ..core.sampling import SamplingParams
    from ..engine import Engine
    from ..models import complexity_deep as cdm
    from ..models.presets import get_preset

    cfg = get_preset(model)
    if tiny:
        cfg = cfg.replace(num_hidden_layers=2, hidden_size=256,
                          intermediate_size=512, vocab_size=1024)
        prompt_lens = [int(p) for p in prompt_lens if p <= 256] or [64]
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if quantization == "int8":
        params = quantize_params(params, cfg, "int8")

    max_len = min(2048, cfg.max_position_embeddings)
    results = {"model": model, "quantization": quantization, "prefill": {},
               "decode_tok_s": None}
    rng = np.random.default_rng(0)

    for plen in prompt_lens:
        if plen + decode_tokens > max_len:
            continue
        ecfg = EngineConfig(
            max_batch_size=4, max_seq_len=max_len,
            max_prefill_tokens=plen, quantization=quantization,
            decode_batch_buckets=(4,), prefill_batch_buckets=(1,),
            prefill_token_buckets=(plen,), multistep_decode=1,
        )
        engine = Engine(params, cfg, ecfg)
        prompt = rng.integers(3, cfg.vocab_size, plen).tolist()
        sp = SamplingParams(temperature=0.0, max_tokens=1)
        engine.generate(prompt, sp)  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            engine.generate(rng.integers(3, cfg.vocab_size, plen).tolist(), sp)
        dt = (time.perf_counter() - t0) / reps
        results["prefill"][str(plen)] = round(plen / dt, 1)
        print(f"prefill len={plen}: {plen / dt:,.0f} tok/s")

    # decode throughput at steady batch
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=max_len,
                        max_prefill_tokens=128, quantization=quantization,
                        decode_batch_buckets=(4,), prefill_batch_buckets=(4,),
                        prefill_token_buckets=(64,))
    engine = Engine(params, cfg, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=decode_tokens)
    rids = [engine.add_request(
        rng.integers(3, cfg.vocab_size, 32).tolist(), sp) for _ in range(4)]
    t0 = time.perf_counter()
    while engine.scheduler.has_work:
        engine.step()
    dt = time.perf_counter() - t0
    total = sum(len(engine.scheduler.get_request(r).output_token_ids)
                for r in rids)
    results["decode_tok_s"] = round(total / dt, 1)
    print(f"decode: {total / dt:,.0f} tok/s (batch 4)")
    print(json.dumps(results))
    return results
