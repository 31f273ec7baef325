"""Native (C++) host runtime tests — behavioral equivalence with the Python
block pool (ref pattern: kernels/kernel_loader.py compile-or-fallback)."""

import numpy as np
import pytest

from vllm_i64_tpu.core.block_pool import BlockPool
from vllm_i64_tpu.core.native import load_native, make_block_pool

native_available = load_native() is not None

pytestmark = pytest.mark.skipif(
    not native_available, reason="g++ toolchain not available")


def make_native(n, bs=4, caching=True):
    from vllm_i64_tpu.core.native import NativeBlockPool

    return NativeBlockPool(n, bs, enable_caching=caching)


def test_native_lib_loads():
    assert load_native() is not None
    pool = make_block_pool(16, 4)
    assert pool.get_stats().get("native") is True


@pytest.mark.parametrize("make", [
    lambda: BlockPool(8, 4),
    lambda: make_native(8),
], ids=["python", "native"])
def test_pools_agree_on_alloc_free(make):
    pool = make()
    assert pool.num_free == 7
    ids = pool.allocate(3)
    assert ids == [1, 2, 3]
    assert pool.allocate(10) is None
    pool.touch(ids)
    pool.free(ids)
    assert pool.num_free == 4
    pool.free(ids)
    assert pool.num_free == 7


@pytest.mark.parametrize("make", [
    lambda: BlockPool(8, 4),
    lambda: make_native(8),
], ids=["python", "native"])
def test_pools_agree_on_lru_order(make):
    pool = make()
    a = pool.allocate(3)
    pool.allocate(4)
    pool.free(a)  # tail-first re-entry: evict 3, 2, 1
    assert pool.allocate(3) == [a[2], a[1], a[0]]


@pytest.mark.parametrize("make", [
    lambda: BlockPool(16, 4),
    lambda: make_native(16),
], ids=["python", "native"])
def test_pools_agree_on_prefix_cache(make):
    pool = make()
    h1 = BlockPool.hash_block([1, 2, 3, 4])
    h2 = BlockPool.hash_block([1, 2, 3, 4], prev_hash=h1)
    b1, b2 = pool.allocate(2)
    pool.cache(b1, h1)
    pool.cache(b2, h2)
    assert pool.get_cached(h1) == b1
    assert pool.get_cached(h2) == b2
    assert pool.get_cached(BlockPool.hash_block([9])) is None
    # duplicate hash: first writer wins
    b3 = pool.allocate(1)[0]
    pool.cache(b3, h1)
    assert pool.get_cached(h1) == b1
    # eviction on realloc
    pool.free([b1])
    taken = []
    while True:
        got = pool.allocate(1)
        if got is None:
            break
        taken.extend(got)
        if b1 in got:
            break
    assert pool.get_cached(h1) is None


def test_native_allocate_specific():
    pool = make_native(8)
    assert pool.allocate_specific(5)
    assert not pool.allocate_specific(5)
    assert not pool.allocate_specific(0)
    assert 5 not in (pool.allocate(6) or [])


def test_native_stats_track_hits():
    pool = make_native(8)
    h = BlockPool.hash_block([7, 7, 7, 7])
    (b,) = pool.allocate(1)
    pool.cache(b, h)
    assert pool.get_cached(h) == b
    s = pool.get_stats()
    assert s["cache_hits"] == 1 and s["cache_queries"] == 1
    assert s["cached_blocks"] == 1


def test_scheduler_uses_native_pool():
    from vllm_i64_tpu.core.scheduler import Scheduler

    sched = Scheduler(max_batch_size=2, max_seq_len=32, kv_block_size=4,
                      max_kv_blocks=16, max_prefill_tokens=32)
    assert sched.blocks.get_stats().get("native") is True
    rid = sched.add_request(np.arange(8, dtype=np.int64), max_new_tokens=2)
    batch = sched.schedule()
    assert batch is not None
    sched.update_after_step(batch, {rid: 5})
    req = sched.get_request(rid)
    assert len(req.kv_block_ids) >= 2
