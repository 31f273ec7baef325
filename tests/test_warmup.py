"""Exhaustive step-program warmup (Engine.warmup / Runner.warmup_programs).

The engine compiles step programs lazily per bucket combination; which
combination a serving step hits depends on request-arrival timing, so a
runtime compile can land mid-traffic and stall every in-flight request
(the reference has the same lazy-capture stall with CUDA graphs and fixes
it with an exhaustive capture pass, ref: i64_engine.py:200-231). Warmup
must (a) cover every program ordinary traffic can dispatch and (b) leave
no observable engine state behind.
"""
import jax
import numpy as np
import pytest

from vllm_i64_tpu import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=128, num_experts=4, top_k=2,
        shared_expert=True,
    )
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    def ecfg():
        return EngineConfig(
            max_batch_size=4, max_seq_len=64, kv_block_size=4,
            max_kv_blocks=64, max_prefill_tokens=32,
            decode_batch_buckets=(2, 4), prefill_batch_buckets=(1, 4),
            prefill_token_buckets=(8, 16), multistep_decode=4,
        )
    return cfg, params, ecfg


def _cache_sizes(runner):
    return (
        runner._step_fn._cache_size(),
        runner._prefill_step_fn._cache_size(),
        runner._multi_decode_fn._cache_size(),
    )


def test_warmup_compiles_programs_and_covers_traffic(setup):
    cfg, params, ecfg = setup
    eng = Engine(params, cfg, ecfg())
    n = eng.warmup(
        sampling_examples=[
            SamplingParams(temperature=0.0),
            SamplingParams(temperature=0.8, top_p=0.9, top_k=5),
        ],
        include_host_sampling=False,
    )
    assert n > 0
    before = _cache_sizes(eng.runner)
    # traffic whose features match a warmed set: greedy and sampled,
    # concurrent, spanning prefill chunking and multistep decode windows
    rids = [
        eng.add_request(list(range(1, 20)),
                        SamplingParams(temperature=0.0, max_tokens=8)),
        eng.add_request([4, 5, 6],
                        SamplingParams(temperature=0.8, top_p=0.9, top_k=5,
                                       seed=3, max_tokens=8)),
    ]
    got = {r: 0 for r in rids}
    for _ in range(100):
        for rid, toks in eng.step().items():
            if rid in got:
                got[rid] += len(toks)
        if all(v >= 8 for v in got.values()):
            break
    assert all(v >= 8 for v in got.values())
    assert _cache_sizes(eng.runner) == before, (
        "warmup missed a step program ordinary traffic dispatched")


def test_warmup_covers_api_default_traffic(setup):
    """The HTTP API defaults repetition_penalty to 1.1 (reference serving
    default), putting EVERY request in the penalties=True program family —
    a warmup that only covers bare SamplingParams() features misses all of
    it (observed on v5e: ~10 mid-pass remote compiles, wire TTFT p50 40s).
    Also covers the span<token-bucket class: rows padded up to a token
    bucket whose span clamp lands on a SMALLER block bucket."""
    cfg, params, ecfg = setup
    eng = Engine(params, cfg, ecfg())
    eng.warmup(
        sampling_examples=[SamplingParams(
            temperature=0.0, repetition_penalty=1.1, min_tokens=1)],
        include_host_sampling=False,
    )
    before = _cache_sizes(eng.runner)
    rids = [
        eng.add_request(
            list(range(1, 2 + 3 * i)),
            SamplingParams(temperature=0.0, repetition_penalty=1.1,
                           min_tokens=4, max_tokens=6))
        for i in range(4)
    ]
    done = 0
    for _ in range(200):
        for rid, toks in eng.step().items():
            pass
        done = sum(
            1 for r in rids
            if eng.scheduler.get_request(r) is None
            or eng.scheduler.get_request(r).num_generated >= 6)
        if done == len(rids):
            break
    assert done == len(rids)
    assert _cache_sizes(eng.runner) == before, (
        "API-default traffic dispatched an unwarmed program")


def test_warmup_leaves_no_observable_state(setup):
    cfg, params, ecfg = setup
    warmed = Engine(params, cfg, ecfg())
    warmed.warmup(sampling_examples=[SamplingParams(temperature=0.0)],
                  include_host_sampling=False)
    cold = Engine(params, cfg, ecfg())
    sp = SamplingParams(temperature=0.0, max_tokens=8,
                        repetition_penalty=1.3)
    a = warmed.generate([5, 17, 42, 7], sp)
    b = cold.generate([5, 17, 42, 7], sp)
    assert a.output_tokens == b.output_tokens
    # seeded sampling too (key/counts state must be untouched by warmup)
    sp2 = SamplingParams(temperature=0.9, seed=11, max_tokens=8)
    a2 = warmed.generate([9, 8, 7], sp2)
    b2 = cold.generate([9, 8, 7], sp2)
    assert a2.output_tokens == b2.output_tokens


def test_warmup_feature_sets_deduplicate(setup):
    cfg, params, ecfg = setup
    eng = Engine(params, cfg, ecfg())
    # identical features from different params objects: warm once
    n1 = eng.warmup(
        sampling_examples=[SamplingParams(temperature=0.0)],
        include_host_sampling=False,
    )
    n2 = eng.warmup(
        sampling_examples=[SamplingParams(temperature=0.0),
                           SamplingParams(temperature=0.0, max_tokens=5)],
        include_host_sampling=False,
    )
    assert n1 == n2


def test_warmup_none_runner_is_noop():
    eng = Engine(None, None, EngineConfig(max_batch_size=2, max_seq_len=32,
                                          kv_block_size=4, max_kv_blocks=16))
    assert eng.warmup() == 0
