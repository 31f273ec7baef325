#!/usr/bin/env python
"""Bounded soak: request storm with mixed shapes/params/cancels, asserting
flat memory and clean engine state (ROADMAP hardening #12).

Random prompt lengths, generation lengths, temperatures, seeds, priorities,
and a fraction of mid-flight cancels drive the scheduler through admission,
chunked prefill, chained multistep decode, preemption, and purge paths for
--seconds wall-clock. At the end every per-request map must be empty, all
KV blocks free, all sampler slots returned, and host RSS growth bounded.

Usage: python tools/tpu_soak.py [--seconds 120] [--cpu]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import random
import resource
import sys
import time

import numpy as np


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vllm_i64_tpu.config import EngineConfig, ModelConfig
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = ModelConfig(
        vocab_size=1024, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=512, num_experts=4, top_k=2,
        shared_expert=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        max_batch_size=8, max_seq_len=256, kv_block_size=16,
        max_kv_blocks=96,  # tight pool: forces preemption under load
        max_prefill_tokens=64,
        decode_batch_buckets=(2, 4, 8), prefill_batch_buckets=(2, 4, 8),
        prefill_token_buckets=(16, 32, 64), multistep_decode=4,
    )
    engine = Engine(params, cfg, ecfg)

    rng = np.random.default_rng(0)
    pyrng = random.Random(0)
    inflight = {}
    done = cancelled = submitted = 0
    t_end = time.perf_counter() + args.seconds
    rss0 = None
    step_ms = []

    while time.perf_counter() < t_end or inflight:
        feed = time.perf_counter() < t_end
        while feed and len(inflight) < 12:
            n = int(rng.integers(4, 120))
            sp = SamplingParams(
                temperature=pyrng.choice([0.0, 0.0, 0.7, 1.0]),
                top_p=pyrng.choice([1.0, 0.9]),
                max_tokens=int(rng.integers(2, 40)),
                seed=pyrng.choice([None, 7, 11]),
            )
            rid = engine.add_request(
                rng.integers(3, 1024, n).tolist(), sp,
                priority=pyrng.choice([0, 0, 0, 5]))
            inflight[rid] = time.perf_counter()
            submitted += 1
        t0 = time.perf_counter()
        engine.step()
        step_ms.append((time.perf_counter() - t0) * 1000)
        # reap + occasional cancels
        from vllm_i64_tpu.core.scheduler import RequestState
        for rid in list(inflight):
            req = engine.scheduler.get_request(rid)
            if req is not None and req.state == RequestState.FINISHED:
                engine._result_for(req, 0, 0.0)  # consume + purge
                del inflight[rid]
                done += 1
            elif req is None and rid in engine.merged_finished:
                engine.merged_finished.pop(rid)
                del inflight[rid]
                done += 1
            elif pyrng.random() < 0.002:
                if engine.cancel_request(rid):
                    del inflight[rid]
                    cancelled += 1
        if rss0 is None and done >= 20:
            rss0 = rss_mb()  # baseline after compile warmup

    rss1 = rss_mb()
    st = engine.get_stats()
    p50 = float(np.percentile(step_ms, 50))
    p99 = float(np.percentile(step_ms, 99))
    print(f"soak: {submitted} submitted, {done} done, {cancelled} cancelled "
          f"in {args.seconds:.0f}s; step p50 {p50:.1f} ms p99 {p99:.1f} ms",
          flush=True)
    print(f"rss: {rss0:.0f} -> {rss1:.0f} MB; stats: pending={st['pending']} "
          f"running={st['running']} free_kv={st['free_kv_blocks']}", flush=True)

    errors = []
    if st["pending"] or st["running"]:
        errors.append("scheduler not drained")
    if st["free_kv_blocks"] != ecfg.max_kv_blocks - 1:  # block 0 reserved
        errors.append(f"KV blocks leaked: free={st['free_kv_blocks']}")
    for name in ("_params_by_rid", "_procs_by_rid", "_slot_by_rid",
                 "_deadlines", "_logprobs_by_rid", "_soft_by_rid"):
        leftover = getattr(engine, name)
        # finished-request state is purged on result pickup
        if leftover:
            errors.append(f"{name} leaked {len(leftover)} entries")
    if len(engine._free_slots) != ecfg.max_batch_size:
        errors.append(f"sampler slots leaked: {len(engine._free_slots)}")
    if rss0 is not None and rss1 - rss0 > 256:
        errors.append(f"RSS grew {rss1 - rss0:.0f} MB")
    for e in errors:
        print(f"FAIL: {e}", flush=True)
    print("SOAK OK" if not errors else "SOAK FAILURES", flush=True)
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
