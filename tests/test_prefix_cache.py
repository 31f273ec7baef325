"""Block pool + prefix caching tests
(ref: vllm_i64/core/block_pool.py, kv_cache.py:590-661)."""

import numpy as np
import pytest

from vllm_i64_tpu.core.block_pool import BlockPool
from vllm_i64_tpu.core.scheduler import Scheduler


# ---------------------------------------------------------------------------
# pool mechanics
# ---------------------------------------------------------------------------


def test_pool_reserves_null_block():
    pool = BlockPool(8, 4)
    assert pool.num_free == 7
    ids = pool.allocate(7)
    assert 0 not in ids
    assert pool.allocate(1) is None


def test_pool_alloc_free_refcount():
    pool = BlockPool(8, 4)
    ids = pool.allocate(3)
    pool.touch(ids)  # simulate a second user
    pool.free(ids)
    assert pool.num_free == 4  # still held by the second user
    pool.free(ids)
    assert pool.num_free == 7


def test_pool_lru_eviction_order():
    """Freed blocks re-enter at MRU; allocation pops LRU first. Blocks of a
    sequence are released tail-first so prompt heads survive longest."""
    pool = BlockPool(8, 4)
    a = pool.allocate(3)  # [1,2,3]
    b = pool.allocate(4)  # [4,5,6,7]
    pool.free(a)  # 3 (tail) appended first -> evicted before 2, then 1
    got = pool.allocate(7 - 4)
    assert got == [a[2], a[1], a[0]]


def test_hash_chaining_and_namespace():
    h1 = BlockPool.hash_block([1, 2, 3, 4])
    h2 = BlockPool.hash_block([1, 2, 3, 4], prev_hash=h1)
    assert h1 != h2
    hn = BlockPool.hash_block([1, 2, 3, 4], namespace=b"tenant-a")
    assert hn != h1
    assert BlockPool.hash_block([1, 2, 3, 4]) == h1  # deterministic


def test_cache_hit_and_eviction_on_realloc():
    pool = BlockPool(4, 4)
    (bid,) = pool.allocate(1)
    h = BlockPool.hash_block([9, 9, 9, 9])
    pool.cache(bid, h)
    assert pool.get_cached(h) == bid
    pool.free([bid])
    # still cached while idle in the free list
    assert pool.get_cached(h) == bid
    # reallocating the block evicts its hash
    taken = pool.allocate(3)
    assert bid in taken
    assert pool.get_cached(h) is None


def test_cache_duplicate_hash_first_writer_wins():
    pool = BlockPool(8, 4)
    b1, b2 = pool.allocate(2)
    h = BlockPool.hash_block([1, 2, 3, 4])
    pool.cache(b1, h)
    pool.cache(b2, h)
    assert pool.get_cached(h) == b1
    # freeing + reallocating b1 must fully drop the entry (not point at b2)
    pool.free([b1])
    while True:
        got = pool.allocate(1)
        if got is None:
            break
        if b1 in got:
            break
    assert pool.get_cached(h) is None


def test_allocate_specific():
    pool = BlockPool(8, 4)
    assert pool.allocate_specific(5)
    assert not pool.allocate_specific(5)
    ids = pool.allocate(6)
    assert 5 not in ids


# ---------------------------------------------------------------------------
# scheduler integration
# ---------------------------------------------------------------------------


def make_sched(**kw):
    kw.setdefault("max_batch_size", 4)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("kv_block_size", 4)
    kw.setdefault("max_kv_blocks", 32)
    kw.setdefault("max_prefill_tokens", 64)
    return Scheduler(**kw)


def run_to_completion(sched, rid, n_tokens=4):
    """Drive the scheduler with fake sampled tokens until rid finishes."""
    req = sched.get_request(rid)
    guard = 0
    while not req.is_finished and guard < 100:
        batch = sched.schedule()
        if batch is None:
            break
        fake = {
            s.request.request_id: 7 for s in batch.seqs if s.needs_sample
        }
        sched.update_after_step(batch, fake)
        guard += 1
    # final sweep moves it to finished + frees blocks
    sched.schedule()
    return req


def test_prefix_reuse_across_requests():
    sched = make_sched()
    prompt = np.arange(16, dtype=np.int64)  # 4 full blocks
    r1 = sched.add_request(prompt, max_new_tokens=2)
    req1 = run_to_completion(sched, r1)
    assert req1.prefix_registered

    hits_before = sched.blocks.cache_hits
    r2 = sched.add_request(prompt.copy(), max_new_tokens=2)
    sched.schedule()
    req2 = sched.get_request(r2)
    # 3 of 4 blocks reusable (last token always recomputed)
    assert req2.cached_prefix_len == 12
    assert req2.prefill_done >= 12
    assert sched.blocks.cache_hits > hits_before


def test_prefix_reuse_shares_block_ids():
    sched = make_sched()
    prompt = np.arange(16, dtype=np.int64)
    r1 = sched.add_request(prompt, max_new_tokens=2)
    req1 = run_to_completion(sched, r1)
    first_blocks = list(req1.kv_block_ids[:3])

    r2 = sched.add_request(prompt.copy(), max_new_tokens=2)
    sched.schedule()
    req2 = sched.get_request(r2)
    assert list(req2.kv_block_ids[:3]) == first_blocks


def test_namespace_isolation():
    sched = make_sched()
    prompt = np.arange(16, dtype=np.int64)
    r1 = sched.add_request(prompt, max_new_tokens=2, cache_namespace=b"tenant-a")
    run_to_completion(sched, r1)

    r2 = sched.add_request(prompt.copy(), max_new_tokens=2,
                           cache_namespace=b"tenant-b")
    sched.schedule()
    req2 = sched.get_request(r2)
    assert req2.cached_prefix_len == 0  # no cross-tenant reuse

    r3 = sched.add_request(prompt.copy(), max_new_tokens=2,
                           cache_namespace=b"tenant-a")
    sched.schedule()
    req3 = sched.get_request(r3)
    assert req3.cached_prefix_len == 12  # same-tenant reuse works


def test_partial_prefix_match():
    sched = make_sched()
    prompt = np.arange(16, dtype=np.int64)
    r1 = sched.add_request(prompt, max_new_tokens=2)
    run_to_completion(sched, r1)

    # same first 2 blocks, different third
    p2 = prompt.copy()
    p2[9] = 999
    r2 = sched.add_request(p2, max_new_tokens=2)
    sched.schedule()
    req2 = sched.get_request(r2)
    assert req2.cached_prefix_len == 8


def test_full_prompt_cached_still_recomputes_last_token():
    """A fully-cached prompt must leave >= 1 token for the final chunk so
    the engine has logits to sample from."""
    sched = make_sched()
    prompt = np.arange(12, dtype=np.int64)  # exactly 3 blocks
    r1 = sched.add_request(prompt, max_new_tokens=2)
    run_to_completion(sched, r1)

    r2 = sched.add_request(prompt.copy(), max_new_tokens=2)
    batch = sched.schedule()
    req2 = sched.get_request(r2)
    assert req2.cached_prefix_len == 8  # capped at 2 of 3 blocks
    seqs = [s for s in batch.seqs if s.request.request_id == r2]
    assert seqs and seqs[0].is_prefill
    assert len(seqs[0].token_ids) == 4  # only the last block recomputed


def test_prefix_caching_disabled():
    sched = make_sched(enable_prefix_caching=False)
    prompt = np.arange(16, dtype=np.int64)
    r1 = sched.add_request(prompt, max_new_tokens=2)
    run_to_completion(sched, r1)
    r2 = sched.add_request(prompt.copy(), max_new_tokens=2)
    sched.schedule()
    assert sched.get_request(r2).cached_prefix_len == 0


def test_engine_prefix_reuse_end_to_end(tiny_config):
    """Two identical prompts through the real model: the second must reuse
    prefix blocks AND produce identical greedy output."""
    import jax

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=32,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(8, 16, 32), multistep_decode=1)
    eng = Engine(params, tiny_config, ecfg)
    prompt = list(range(10, 26))  # 4 full blocks of 4

    r1 = eng.generate(prompt, SamplingParams(temperature=0.0, max_tokens=4))
    hits_before = eng.scheduler.blocks.cache_hits
    r2 = eng.generate(prompt, SamplingParams(temperature=0.0, max_tokens=4))
    assert eng.scheduler.blocks.cache_hits > hits_before
    assert r2.output_tokens == r1.output_tokens  # reused KV is bit-identical
