"""Engine benchmark: TTFT / ITL / throughput under continuous batching.

Result schema mirrors the reference harness
(ref: benchmarks/bench_engine.py:23-37 — label, num_requests, prompt_len,
output_len, total_time_s, ttft p50/p99, itl avg/p50/p99, throughput,
total_tokens, peak_batch). The repo-root bench.py drives the same engine
with the driver's one-line-JSON contract.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass
from typing import List


@dataclass
class BenchResult:
    label: str
    num_requests: int
    prompt_len: int
    output_len: int
    total_time_s: float
    ttft_ms_p50: float
    ttft_ms_p99: float
    itl_ms_avg: float
    itl_ms_p50: float
    itl_ms_p99: float
    throughput_tok_s: float
    total_tokens: int
    peak_batch: int

    def to_dict(self) -> dict:
        return asdict(self)


def _pct(sorted_vals: List[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    return sorted_vals[min(len(sorted_vals) - 1, int(q * len(sorted_vals)))]


def bench_continuous_batching(engine, prompts, sampling_params,
                              label: str = "engine") -> BenchResult:
    """Submit all prompts, drive the step loop, measure TTFT/ITL/throughput."""
    first_token_at = {}
    step_times: List[float] = []
    peak_batch = 0

    t_start = time.perf_counter()
    rids = [engine.add_request(p, sampling_params) for p in prompts]
    rid_set = set(rids)
    while engine.scheduler.has_work:
        t0 = time.perf_counter()
        result = engine.step()
        step_ms = (time.perf_counter() - t0) * 1000
        emitted = sum(len(t) for t in result.values())
        if emitted:
            # per-TOKEN latency of token-producing steps — raw step times
            # would count pure prefill-chunk steps as "inter-token" latency
            step_times.append(step_ms / emitted)
        now = time.perf_counter()
        for rid, toks in result.items():
            if toks and rid in rid_set and rid not in first_token_at:
                first_token_at[rid] = (now - t_start) * 1000
        peak_batch = max(peak_batch, len(engine.scheduler.running))
    elapsed = time.perf_counter() - t_start

    total_tokens = sum(
        len(engine.scheduler.get_request(r).output_token_ids)
        for r in rids if engine.scheduler.get_request(r) is not None)
    ttft = sorted(first_token_at.values())
    itl = sorted(step_times)
    return BenchResult(
        label=label,
        num_requests=len(prompts),
        prompt_len=max(len(p) for p in prompts),
        output_len=sampling_params.max_tokens,
        total_time_s=round(elapsed, 3),
        ttft_ms_p50=round(_pct(ttft, 0.5), 1),
        ttft_ms_p99=round(_pct(ttft, 0.99), 1),
        itl_ms_avg=round(sum(itl) / max(len(itl), 1), 2),
        itl_ms_p50=round(_pct(itl, 0.5), 2),
        itl_ms_p99=round(_pct(itl, 0.99), 2),
        throughput_tok_s=round(total_tokens / max(elapsed, 1e-9), 2),
        total_tokens=int(total_tokens),
        peak_batch=int(peak_batch),
    )


def run_engine_bench(model: str = "tr-hash-moe-500m", requests: int = 20,
                     prompt_len: int = 64, output_len: int = 64,
                     quantization: str = "int8", tiny: bool = False) -> dict:
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
                          intermediate_size=512, vocab_size=1024,
                          max_position_embeddings=512)
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = cdm.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if quantization == "int8":
        params = quantize_params(params, cfg, "int8")

    ecfg = EngineConfig(
        max_batch_size=16,
        max_seq_len=min(2048, cfg.max_position_embeddings),
        max_prefill_tokens=prompt_len,
        quantization=quantization,
        decode_batch_buckets=(16,),
        prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(prompt_len,),
    )
    engine = Engine(params, cfg, ecfg)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, cfg.vocab_size, size=prompt_len).tolist()
               for _ in range(requests)]
    sp = SamplingParams(temperature=0.0, max_tokens=output_len)

    # warmup compile
    wid = engine.add_request(prompts[0], sp)
    engine.wait_for(wid, max_steps=output_len + 8)

    result = bench_continuous_batching(engine, prompts, sp,
                                       label=f"{model}/{quantization}")
    print(json.dumps(result.to_dict(), indent=2))
    return result.to_dict()
