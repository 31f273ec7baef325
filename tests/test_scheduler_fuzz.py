"""Randomized invariant fuzz over the scheduler and the modelless engine.

Each step of a random operation sequence (admit / cancel / schedule /
apply-tokens / preempt-pressure) must preserve:
- KV block conservation: free + held-by-running == total - 1 (null block)
- num_pending counter == recount of live heap entries
- every running request is RUNNING and holds enough blocks for its tokens
- engine sampler slots are conserved
"""

import random

import numpy as np

from vllm_i64_tpu.core.scheduler import RequestState, Scheduler


def _check_invariants(s: Scheduler):
    held = sum(len(r.kv_block_ids) for r in s.running)
    free = s.blocks.num_free
    total = s.blocks.num_blocks if hasattr(s.blocks, "num_blocks") else None
    if total is not None:
        # cached (prefix) blocks live outside both running and the free
        # list only while ref-counted; with caching disabled the ledger
        # must balance exactly
        assert held + free <= total, (held, free, total)
    live = sum(1 for *_, r in s._pending if r.state == RequestState.PENDING)
    assert s.num_pending == live, (s.num_pending, live)
    for r in s.running:
        # FINISHED-in-running is a legitimate transient: kv_oom or EOS can
        # finish a request mid-update; the next schedule() sweeps it out
        assert r.state in (RequestState.RUNNING, RequestState.FINISHED)
        if r.state == RequestState.RUNNING:
            need = -(-max(r.prefill_done, 1) // s.kv_block_size)
            assert len(r.kv_block_ids) >= min(need, 1)


def test_scheduler_random_ops_hold_invariants():
    rng = random.Random(0)
    nprng = np.random.default_rng(0)
    s = Scheduler(max_batch_size=4, max_seq_len=64, kv_block_size=4,
                  max_kv_blocks=24, max_prefill_tokens=16,
                  enable_preemption=True, enable_prefix_caching=False)
    live_rids = []
    for step in range(400):
        op = rng.random()
        if op < 0.35 and len(live_rids) < 24:
            rid = s.add_request(
                nprng.integers(1, 200, int(nprng.integers(2, 30))),
                max_new_tokens=int(nprng.integers(1, 10)),
                priority=rng.choice([0, 0, 0, 3, -1]))
            live_rids.append(rid)
        elif op < 0.45 and live_rids:
            s.cancel(rng.choice(live_rids))
        else:
            batch = s.schedule()
            if batch is not None:
                toks = {sq.request.request_id: int(nprng.integers(1, 200))
                        for sq in batch.seqs if sq.needs_sample}
                s.update_after_step(batch, toks)
        # reap finished
        for r in list(s.finished):
            s.finished.remove(r)
            s._requests.pop(r.request_id, None)
            if r.request_id in live_rids:
                live_rids.remove(r.request_id)
        _check_invariants(s)

    # drain everything
    guard = 0
    while s.has_work and guard < 2000:
        batch = s.schedule()
        if batch is not None:
            toks = {sq.request.request_id: 7
                    for sq in batch.seqs if sq.needs_sample}
            s.update_after_step(batch, toks)
        for r in list(s.finished):
            s.finished.remove(r)
            s._requests.pop(r.request_id, None)
        _check_invariants(s)
        guard += 1
    assert not s.running and s.num_pending == 0


def test_modelless_engine_random_ops_conserve_slots():
    from vllm_i64_tpu import EngineConfig
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine

    rng = random.Random(1)
    nprng = np.random.default_rng(1)
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=32, max_prefill_tokens=16,
                        decode_batch_buckets=(2, 4),
                        prefill_batch_buckets=(2, 4),
                        prefill_token_buckets=(8, 16))
    eng = Engine(None, None, ecfg)
    inflight = []
    for step in range(300):
        op = rng.random()
        if op < 0.3 and len(inflight) < 10:
            rid = eng.add_request(
                nprng.integers(1, 200, int(nprng.integers(2, 20))).tolist(),
                SamplingParams(temperature=rng.choice([0.0, 0.8]),
                               max_tokens=int(nprng.integers(1, 8))))
            inflight.append(rid)
        elif op < 0.4 and inflight:
            eng.cancel_request(rng.choice(inflight))
        else:
            eng.step()
        # reap
        from vllm_i64_tpu.core.scheduler import RequestState as RS

        for rid in list(inflight):
            req = eng.scheduler.get_request(rid)
            if req is None:
                inflight.remove(rid)
            elif req.state == RS.FINISHED:
                eng._result_for(req, 0, 0.0)
                inflight.remove(rid)
        held_slots = len(eng._slot_by_rid)
        free_slots = len(eng._free_slots)
        assert held_slots + free_slots == ecfg.max_batch_size, (
            held_slots, free_slots)
    # drain
    guard = 0
    while (eng.scheduler.has_work or inflight) and guard < 1000:
        eng.step()
        from vllm_i64_tpu.core.scheduler import RequestState as RS

        for rid in list(inflight):
            req = eng.scheduler.get_request(rid)
            if req is None:
                inflight.remove(rid)
            elif req.state == RS.FINISHED:
                eng._result_for(req, 0, 0.0)
                inflight.remove(rid)
        guard += 1
    assert len(eng._free_slots) == ecfg.max_batch_size
    assert not eng._params_by_rid and not eng._slot_by_rid


class _FuzzSwapStore:
    """Strict swap store: flags double-restores, unknown handles, and
    tracks live bytes like core.kv_swap.RunnerKVSwap."""

    def __init__(self, reject_every=5):
        self.live = {}
        self._n = 0
        self.reject_every = reject_every

    def swap_out(self, block_ids):
        self._n += 1
        if self.reject_every and self._n % self.reject_every == 0:
            return None  # over-budget path
        handle = ("h", self._n)
        self.live[handle] = len(block_ids)
        return handle

    def swap_in(self, handle, target_block_ids):
        n = self.live.pop(handle)  # KeyError = double restore / unknown
        assert n == len(target_block_ids)

    def discard(self, handle):
        self.live.pop(handle)


def test_scheduler_random_ops_with_kv_swap():
    """The KV-swap preemption path must preserve every scheduler invariant
    AND the swap-store ledger: a handle is swapped in or discarded exactly
    once, and every swapped-PENDING request holds a live handle."""
    rng = random.Random(7)
    nprng = np.random.default_rng(7)
    store = _FuzzSwapStore()
    s = Scheduler(max_batch_size=4, max_seq_len=64, kv_block_size=4,
                  max_kv_blocks=20, max_prefill_tokens=16,
                  enable_preemption=True, enable_prefix_caching=False,
                  kv_swap=store)
    live_rids = []
    for step in range(500):
        op = rng.random()
        if op < 0.35 and len(live_rids) < 24:
            rid = s.add_request(
                nprng.integers(1, 200, int(nprng.integers(2, 30))),
                max_new_tokens=int(nprng.integers(1, 10)),
                priority=rng.choice([0, 0, 3, -1, -3]))
            live_rids.append(rid)
        elif op < 0.45 and live_rids:
            s.cancel(rng.choice(live_rids))
        else:
            batch = s.schedule()
            if batch is not None:
                toks = {sq.request.request_id: int(nprng.integers(1, 200))
                        for sq in batch.seqs if sq.needs_sample}
                s.update_after_step(batch, toks)
        _check_invariants(s)
        # swap-ledger invariants
        swapped = [r for r in s._requests.values() if r._swapped is not None]
        for r in swapped:
            assert r.state == RequestState.PENDING, r
            assert r._swapped[0] in store.live, "handle lost"
        # every live handle belongs to exactly one swapped request
        owners = [r._swapped[0] for r in swapped]
        assert len(owners) == len(set(owners))
        assert set(owners) == set(store.live), (owners, store.live)
        live_rids = [rid for rid in live_rids
                     if (req := s.get_request(rid)) is not None
                     and req.state != RequestState.FINISHED]
    # drain: everything finishes, ledger empties
    for _ in range(300):
        if not s.has_work:
            break
        batch = s.schedule()
        if batch is None:
            break
        s.update_after_step(batch, {
            sq.request.request_id: 1
            for sq in batch.seqs if sq.needs_sample})
    assert store.live == {}, f"leaked swap handles: {store.live}"
