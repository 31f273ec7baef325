"""Scheduler tests — priorities, chunked prefill, preemption, KV exhaustion.

Coverage mirrors ref tests/test_scheduler.py (small-config factory with
block_size=4, 16 blocks) adapted to this scheduler's explicit
needs_sample/chunk reporting.
"""

import numpy as np
import pytest

from vllm_i64_tpu.core.scheduler import (
    Request,
    RequestState,
    Scheduler,
)


def make_scheduler(**kw) -> Scheduler:
    defaults = dict(
        max_batch_size=4,
        max_seq_len=64,
        kv_block_size=4,
        max_kv_blocks=17,  # block 0 reserved -> 16 usable
        max_prefill_tokens=8,
    )
    defaults.update(kw)
    return Scheduler(**defaults)


def prompt(n, start=1):
    return np.arange(start, start + n, dtype=np.int64)


def run_step(s, token=7):
    """schedule + feed a fixed sampled token to every sampling row."""
    batch = s.schedule()
    if batch is None:
        return None
    tokens = {
        seq.request.request_id: token for seq in batch.seqs if seq.needs_sample
    }
    s.update_after_step(batch, tokens)
    return batch


from vllm_i64_tpu.core.block_pool import BlockPool


def BlockAllocator(n):
    return BlockPool(n, block_size=4)


class TestBlockAllocator:
    """Allocator-surface tests now run against BlockPool (the only
    allocator in production; the separate BlockAllocator was removed)."""
    def test_block_zero_reserved(self):
        a = BlockAllocator(8)
        got = a.allocate(7)
        assert got is not None and 0 not in got
        assert a.allocate(1) is None

    def test_free_and_realloc(self):
        a = BlockAllocator(4)
        ids = a.allocate(3)
        a.free(ids)
        assert a.num_free == 3
        a.free(ids)  # double free is a no-op
        assert a.num_free == 3

    def test_allocate_specific(self):
        a = BlockAllocator(8)
        assert a.allocate_specific(5)
        assert not a.allocate_specific(5)
        rest = a.allocate(6)
        assert 5 not in rest


class TestBasicScheduling:
    def test_single_request_lifecycle(self):
        s = make_scheduler()
        rid = s.add_request(prompt(5), max_new_tokens=3, eos_token_id=-1)
        batch = s.schedule()
        assert batch.num_seqs == 1
        seq = batch.seqs[0]
        assert seq.is_prefill and seq.needs_sample
        np.testing.assert_array_equal(seq.token_ids, prompt(5))
        np.testing.assert_array_equal(seq.positions, np.arange(5))
        s.update_after_step(batch, {rid: 100})
        req = s.get_request(rid)
        assert req.output_token_ids == [100]
        assert req.prefill_complete

        # two decode steps finish it (max_new_tokens=3)
        b2 = s.schedule()
        seq2 = b2.seqs[0]
        assert not seq2.is_prefill
        assert seq2.token_ids[0] == 100
        assert seq2.positions[0] == 5
        s.update_after_step(b2, {rid: 101})
        run_step(s, 102)
        b4 = s.schedule()
        assert b4 is None or rid not in [q.request.request_id for q in b4.seqs]
        assert req.state == RequestState.FINISHED
        assert req.finish_reason == "length"

    def test_eos_finishes(self):
        s = make_scheduler()
        rid = s.add_request(prompt(4), max_new_tokens=100, eos_token_id=0)
        batch = s.schedule()
        s.update_after_step(batch, {rid: 0})  # EOS immediately
        s.schedule()
        req = s.get_request(rid)
        assert req.state == RequestState.FINISHED
        assert req.finish_reason == "stop"

    def test_continuous_batching_mixes_prefill_and_decode(self):
        s = make_scheduler()
        r1 = s.add_request(prompt(4), max_new_tokens=10, eos_token_id=-1)
        run_step(s)
        r2 = s.add_request(prompt(6, start=50), max_new_tokens=10, eos_token_id=-1)
        batch = s.schedule()
        kinds = {q.request.request_id: q.is_prefill for q in batch.seqs}
        assert kinds[r1] is False and kinds[r2] is True

    def test_max_batch_size_respected(self):
        s = make_scheduler(max_batch_size=2)
        for _ in range(5):
            s.add_request(prompt(2), max_new_tokens=2, eos_token_id=-1)
        batch = s.schedule()
        assert batch.num_seqs == 2


class TestChunkedPrefill:
    def test_long_prompt_chunks(self):
        s = make_scheduler(max_prefill_tokens=8, max_kv_blocks=33)
        rid = s.add_request(prompt(20), max_new_tokens=2, eos_token_id=-1)
        b1 = s.schedule()
        seq = b1.seqs[0]
        assert len(seq.token_ids) == 8
        assert not seq.needs_sample  # mid-prefill: no token sampled
        s.update_after_step(b1, {})
        assert s.get_request(rid).prefill_done == 8

        b2 = s.schedule()
        assert len(b2.seqs[0].token_ids) == 8
        assert not b2.seqs[0].needs_sample
        s.update_after_step(b2, {})

        b3 = s.schedule()
        seq3 = b3.seqs[0]
        assert len(seq3.token_ids) == 4
        assert seq3.needs_sample  # final chunk samples
        np.testing.assert_array_equal(seq3.positions, np.arange(16, 20))
        s.update_after_step(b3, {rid: 42})
        assert s.get_request(rid).output_token_ids == [42]

    def test_budget_shared_across_requests(self):
        s = make_scheduler(max_prefill_tokens=6)
        s.add_request(prompt(4), max_new_tokens=2, eos_token_id=-1)
        s.add_request(prompt(4, start=40), max_new_tokens=2, eos_token_id=-1)
        batch = s.schedule()
        lens = sorted(len(q.token_ids) for q in batch.seqs)
        assert lens == [2, 4]  # second request gets the remaining budget


class TestPriorityAndPreemption:
    def test_priority_order(self):
        s = make_scheduler(max_batch_size=1)
        r_low = s.add_request(prompt(2), priority=5, eos_token_id=-1)
        r_high = s.add_request(prompt(2, start=10), priority=-5, eos_token_id=-1)
        batch = s.schedule()
        assert batch.seqs[0].request.request_id == r_high

    def test_preemption_frees_blocks_and_restores(self):
        # 16 usable blocks, block_size 4
        s = make_scheduler(max_kv_blocks=9, max_prefill_tokens=32)  # 8 usable
        r1 = s.add_request(prompt(16), max_new_tokens=50, priority=5, eos_token_id=-1)
        run_step(s)  # r1 prefilled (4 blocks), 1 token out
        r1_req = s.get_request(r1)
        assert r1_req.state == RequestState.RUNNING

        # high-priority arrival needing more blocks than free (4 free)
        r2 = s.add_request(
            prompt(20, start=100), max_new_tokens=5, priority=-1, eos_token_id=-1
        )
        batch = s.schedule()
        ids = [q.request.request_id for q in batch.seqs]
        assert r2 in ids and r1 not in ids
        assert r1_req.state == RequestState.PENDING  # re-queued with boost
        assert r1_req.priority <= -1
        assert r1_req._saved is not None and len(r1_req._saved[0]) == 1

        # r1 comes back (as soon as blocks free up — possibly while r2 still
        # runs) and re-prefills prompt+saved from position 0
        seen_prefill = False
        for _ in range(30):
            b = s.schedule()
            if b is None:
                break
            for q in b.seqs:
                if q.request.request_id == r1 and not seen_prefill:
                    assert q.is_prefill
                    assert int(q.positions[0]) == 0  # full re-prefill
                    seen_prefill = True
            s.update_after_step(
                b, {q.request.request_id: 7 for q in b.seqs if q.needs_sample}
            )
            if seen_prefill:
                break
        assert seen_prefill
        # the saved generated token (7, fed by run_step) was restored
        assert s.get_request(r1).output_token_ids[:1] == [7]

    def test_no_preemption_of_equal_priority(self):
        s = make_scheduler(max_kv_blocks=5)  # 4 usable
        r1 = s.add_request(prompt(16), max_new_tokens=50, priority=0, eos_token_id=-1)
        run_step(s)
        s.add_request(prompt(16, start=50), max_new_tokens=5, priority=0, eos_token_id=-1)
        batch = s.schedule()
        ids = [q.request.request_id for q in batch.seqs]
        assert ids == [r1]  # new request waits; no preemption of equal priority


class TestKVGrowth:
    def test_blocks_grow_with_generation(self):
        s = make_scheduler()
        rid = s.add_request(prompt(4), max_new_tokens=20, eos_token_id=-1)
        run_step(s)
        req = s.get_request(rid)
        blocks_before = len(req.kv_block_ids)
        for _ in range(6):
            run_step(s)
        assert len(req.kv_block_ids) > blocks_before

    def test_kv_oom_finishes_request(self):
        s = make_scheduler(max_kv_blocks=3, enable_preemption=False)  # 2 usable
        rid = s.add_request(prompt(4), max_new_tokens=100, eos_token_id=-1)
        for _ in range(8):
            run_step(s)
        req = s.get_request(rid)
        assert req.state == RequestState.FINISHED
        assert req.finish_reason == "kv_oom"
        assert s.blocks.num_free == 2  # blocks reclaimed


class TestCancel:
    def test_cancel_running(self):
        s = make_scheduler()
        rid = s.add_request(prompt(4), eos_token_id=-1)
        run_step(s)
        assert s.cancel(rid)
        assert s.get_request(rid).finish_reason == "cancelled"
        assert not s.cancel(rid)

    def test_cancel_pending(self):
        s = make_scheduler()
        rid = s.add_request(prompt(4), eos_token_id=-1)
        assert s.cancel(rid)
        assert s.schedule() is None


class TestSchedulerEdgeCases:
    """Deeper edge coverage (ref: tests/test_scheduler.py — 42 cases)."""

    def make(self, **kw):
        from vllm_i64_tpu.core.scheduler import Scheduler

        kw.setdefault("max_batch_size", 4)
        kw.setdefault("max_seq_len", 64)
        kw.setdefault("kv_block_size", 4)
        kw.setdefault("max_kv_blocks", 16)
        kw.setdefault("max_prefill_tokens", 8)
        return Scheduler(**kw)

    def drive(self, sched, tok=7, steps=1):
        for _ in range(steps):
            batch = sched.schedule()
            if batch is None:
                return None
            sched.update_after_step(
                batch,
                {s.request.request_id: tok for s in batch.seqs
                 if s.needs_sample})
        return batch

    def test_admission_blocked_until_blocks_free(self):
        sched = self.make(max_kv_blocks=5)  # 4 usable blocks
        r1 = sched.add_request(np.arange(12, dtype=np.int64),
                               max_new_tokens=2)  # needs 3 blocks
        sched.schedule()
        r2 = sched.add_request(np.arange(12, dtype=np.int64) + 50,
                               max_new_tokens=2)  # needs 3 more — no room
        sched.schedule()
        assert sched.get_request(r2).state.name == "PENDING"
        # finish r1 -> its blocks free -> r2 admits
        req1 = sched.get_request(r1)
        req1.output_token_ids = [req1.eos_token_id] * 2
        sched.schedule()  # sweep r1
        sched.schedule()
        assert sched.get_request(r2).state.name == "RUNNING"

    def test_arrival_order_within_same_priority(self):
        sched = self.make(max_batch_size=1)
        a = sched.add_request(np.arange(4, dtype=np.int64), max_new_tokens=1)
        b = sched.add_request(np.arange(4, dtype=np.int64) + 9,
                              max_new_tokens=1)
        sched.schedule()
        assert sched.get_request(a).state.name == "RUNNING"
        assert sched.get_request(b).state.name == "PENDING"

    def test_priority_overrides_arrival(self):
        sched = self.make(max_batch_size=1)
        a = sched.add_request(np.arange(4, dtype=np.int64),
                              max_new_tokens=1, priority=5)
        b = sched.add_request(np.arange(4, dtype=np.int64) + 9,
                              max_new_tokens=1, priority=-5)
        sched.schedule()
        assert sched.get_request(b).state.name == "RUNNING"
        assert sched.get_request(a).state.name == "PENDING"

    def test_chunked_prefill_positions_are_contiguous(self):
        sched = self.make(max_prefill_tokens=8)
        rid = sched.add_request(np.arange(20, dtype=np.int64),
                                max_new_tokens=1)
        seen = []
        for _ in range(4):
            batch = sched.schedule()
            if batch is None:
                break
            for s in batch.seqs:
                if s.is_prefill:
                    seen.extend(s.positions.tolist())
            sched.update_after_step(
                batch, {s.request.request_id: 3 for s in batch.seqs
                        if s.needs_sample})
        assert seen == list(range(20))

    def test_mid_prefill_chunks_do_not_sample(self):
        sched = self.make(max_prefill_tokens=8)
        sched.add_request(np.arange(20, dtype=np.int64), max_new_tokens=1)
        batch = sched.schedule()
        assert all(not s.needs_sample for s in batch.seqs)  # 8 of 20 done

    def test_restored_request_reprefills_output_tokens(self):
        sched = self.make(max_kv_blocks=8, max_prefill_tokens=64)
        victim = sched.add_request(np.arange(8, dtype=np.int64),
                                   max_new_tokens=8, priority=5)
        self.drive(sched, steps=3)
        assert sched.get_request(victim).num_generated >= 1
        n_gen = sched.get_request(victim).num_generated
        # high-priority arrival forces preemption
        hp = sched.add_request(np.arange(20, dtype=np.int64) + 100,
                               max_new_tokens=1, priority=-5)
        sched.schedule()
        vreq = sched.get_request(victim)
        assert vreq.state.name in ("PENDING", "PREEMPTED")
        # finish the high-priority request, restore the victim
        hreq = sched.get_request(hp)
        hreq.output_token_ids = [hreq.eos_token_id]
        batch = None
        for _ in range(6):
            batch = sched.schedule()
            if batch and any(s.request.request_id == victim
                             for s in batch.seqs):
                break
        # victim re-prefills prompt + saved output tokens
        pre = [s for s in batch.seqs
               if s.request.request_id == victim and s.is_prefill]
        assert pre
        assert vreq.output_token_ids[:n_gen] == [7] * n_gen  # restored

    def test_cancel_frees_blocks_immediately(self):
        sched = self.make()
        rid = sched.add_request(np.arange(12, dtype=np.int64),
                                max_new_tokens=4)
        sched.schedule()
        free_before = sched.blocks.num_free
        assert sched.cancel(rid)
        assert sched.blocks.num_free > free_before

    def test_add_prefilled_request_decodes_immediately(self):
        sched = self.make()
        rid = sched.add_prefilled_request(
            np.arange(8, dtype=np.int64), first_token=42, max_new_tokens=4)
        batch = sched.schedule()
        seqs = [s for s in batch.seqs if s.request.request_id == rid]
        assert seqs and not seqs[0].is_prefill  # straight to decode
        assert seqs[0].token_ids.tolist() == [42]

    def test_max_new_tokens_zero_like_budget(self):
        sched = self.make()
        rid = sched.add_request(np.arange(4, dtype=np.int64),
                                max_new_tokens=1)
        self.drive(sched, steps=2)
        req = sched.get_request(rid)
        assert req.is_finished and req.num_generated == 1
