"""Prefill row packing (engine _pack_prefill_rows): splitting chunks into
narrow subrows must not change any generated token — each subrow carries
its own positions and per-row context length, and a request's subrows stay
ordered so later rows attend to earlier rows' KV within the same step.
"""

import jax
import numpy as np

from vllm_i64_tpu import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


CFG = ModelConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
    max_position_embeddings=256, num_experts=4, top_k=2, shared_expert=True,
)

KW = dict(
    max_batch_size=4, max_seq_len=128, kv_block_size=4, max_kv_blocks=128,
    max_prefill_tokens=64, decode_batch_buckets=(1, 2, 4),
    prefill_batch_buckets=(1, 2, 4, 8, 16),
    prefill_token_buckets=(8, 16, 32, 64), multistep_decode=2,
)


def _prompts():
    rng = np.random.default_rng(7)
    # mixed lengths: a long prompt next to short ones is the padding case
    return [list(rng.integers(0, 256, n)) for n in (61, 5, 33)]


def test_packed_matches_unpacked_greedy():
    params = cdm.init_params(CFG, jax.random.PRNGKey(0))
    outs = {}
    for tp in (0, 8):
        eng = Engine(params, CFG, EngineConfig(prefill_pack_tokens=tp, **KW))
        rids = [eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12))
                for p in _prompts()]
        outs[tp] = [eng.wait_for(r).output_tokens for r in rids]
    assert outs[0] == outs[8]


def test_packed_matches_unpacked_seeded():
    params = cdm.init_params(CFG, jax.random.PRNGKey(1))
    outs = {}
    for tp in (0, 16):
        eng = Engine(params, CFG, EngineConfig(prefill_pack_tokens=tp, **KW))
        rids = [eng.add_request(p, SamplingParams(temperature=0.7, seed=3,
                                                  max_tokens=8))
                for p in _prompts()]
        outs[tp] = [eng.wait_for(r).output_tokens for r in rids]
    assert outs[0] == outs[16]


def test_pack_preserves_row_structure():
    """Unit: subrows keep order, positions, and a single sampling row."""
    eng = Engine(None, CFG, EngineConfig(prefill_pack_tokens=8, **KW))
    from vllm_i64_tpu.core.scheduler import Request, ScheduledSeq

    req = Request(request_id=1, prompt_token_ids=list(range(20)),
                  max_new_tokens=4)
    seq = ScheduledSeq(
        request=req,
        token_ids=np.arange(20, dtype=np.int64),
        positions=np.arange(20, dtype=np.int32),
        is_prefill=True, needs_sample=True)
    rows = eng._pack_prefill_rows([seq])
    assert [len(r.token_ids) for r in rows] == [8, 8, 4]
    assert [bool(r.needs_sample) for r in rows] == [False, False, True]
    assert all(r.request is req for r in rows)
    flat = np.concatenate([r.positions for r in rows])
    np.testing.assert_array_equal(flat, np.arange(20))
