"""Mixed long/short-context serving correctness (the driver bench's second
config, bench.py --suite): long prompts spanning many KV blocks batched
with short ones must produce exactly the outputs of uncontended runs —
this is where block-table bucketing, chunked prefill, packing, and the
flash-window auto policy interact.
"""

import jax
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=2, max_position_embeddings=512,
                      num_experts=4, top_k=2, shared_expert=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _ecfg(**kw):
    base = dict(max_batch_size=4, max_seq_len=320, kv_block_size=16,
                max_kv_blocks=120, max_prefill_tokens=128,
                decode_batch_buckets=(1, 2, 4),
                prefill_batch_buckets=(1, 2, 4),
                prefill_token_buckets=(32, 64, 128), multistep_decode=8)
    base.update(kw)
    return EngineConfig(**base)


def _prompts(cfg):
    rng = np.random.default_rng(3)
    long_p = rng.integers(3, cfg.vocab_size, size=250).tolist()
    long_q = rng.integers(3, cfg.vocab_size, size=199).tolist()
    short_a = rng.integers(3, cfg.vocab_size, size=24).tolist()
    short_b = rng.integers(3, cfg.vocab_size, size=17).tolist()
    return [long_p, short_a, long_q, short_b]


def test_mixed_batch_matches_isolated_runs(setup):
    cfg, params = setup
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    prompts = _prompts(cfg)
    ref = Engine(params, cfg, _ecfg())
    expected = [ref.generate(list(p), sp).output_tokens for p in prompts]

    eng = Engine(params, cfg, _ecfg())
    rids = [eng.add_request(list(p), sp) for p in prompts]
    guard = 0
    while eng.scheduler.has_work and guard < 500:
        eng.step()
        guard += 1
    got = [eng.scheduler.get_request(r).output_token_ids for r in rids]
    assert got == expected


def test_long_prompt_chunked_prefill_progress(setup):
    """A 250-token prompt with a 128-token chunk budget prefills over
    several steps while short requests decode in between."""
    cfg, params = setup
    eng = Engine(params, cfg, _ecfg(max_prefill_tokens=64,
                                    prefill_token_buckets=(32, 64)))
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    prompts = _prompts(cfg)
    long_rid = eng.add_request(list(prompts[0]), sp)
    short_rid = eng.add_request(list(prompts[1]), sp)
    steps = 0
    while eng.scheduler.has_work and steps < 300:
        eng.step()
        steps += 1
    lr = eng.scheduler.get_request(long_rid)
    sr = eng.scheduler.get_request(short_rid)
    assert len(lr.output_token_ids) == 4
    assert len(sr.output_token_ids) == 4
    # the long prompt really spanned multiple chunks and blocks
    assert lr.prefill_done == 250
    assert len(lr.kv_block_ids) >= -(-254 // 16)


def test_mixed_lengths_with_varied_gen_budgets(setup):
    cfg, params = setup
    prompts = _prompts(cfg)
    gens = [12, 3, 7, 9]
    ref = Engine(params, cfg, _ecfg())
    expected = [
        ref.generate(list(p),
                     SamplingParams(temperature=0.0, max_tokens=g)
                     ).output_tokens
        for p, g in zip(prompts, gens)
    ]
    eng = Engine(params, cfg, _ecfg())
    rids = [eng.add_request(list(p),
                            SamplingParams(temperature=0.0, max_tokens=g))
            for p, g in zip(prompts, gens)]
    guard = 0
    while eng.scheduler.has_work and guard < 500:
        eng.step()
        guard += 1
    got = [eng.scheduler.get_request(r).output_token_ids for r in rids]
    assert got == expected


def test_near_max_context_request(setup):
    """A request whose prompt+gen touches max_seq_len serves and stops at
    the sequence limit (block table at its bucket ceiling)."""
    cfg, params = setup
    eng = Engine(params, cfg, _ecfg())
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, cfg.vocab_size, size=308).tolist()
    res = eng.generate(prompt, SamplingParams(temperature=0.0,
                                              max_tokens=10))
    assert 1 <= len(res.output_tokens) <= 10
