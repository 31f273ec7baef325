"""Engine-integrated KV swap under memory pressure.

Reference behavior: the engine swaps preempted requests' KV blocks to a
pinned CPU mirror and restores them at re-admission, instead of always
preempting-and-recomputing (ref: vllm_i64/core/kv_cache.py:711-813,
i64_engine.py:822-828).
"""

import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.core.scheduler import RequestState, Scheduler
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm

import jax


class FakeSwapStore:
    """In-memory swap store recording the scheduler protocol calls."""

    def __init__(self, reject=False):
        self.reject = reject
        self.swap_outs = []
        self.swap_ins = []
        self.discards = []
        self._n = 0

    def swap_out(self, block_ids):
        if self.reject:
            return None
        self._n += 1
        handle = ("h", self._n, tuple(block_ids))
        self.swap_outs.append(handle)
        return handle

    def swap_in(self, handle, target_block_ids):
        self.swap_ins.append((handle, list(target_block_ids)))

    def discard(self, handle):
        self.discards.append(handle)


def make_sched(**kw):
    kw.setdefault("max_batch_size", 4)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("kv_block_size", 4)
    kw.setdefault("max_kv_blocks", 9)  # block 0 reserved -> 8 usable
    kw.setdefault("max_prefill_tokens", 64)
    return Scheduler(**kw)


def drive_decodes(sched, batch, tok=7):
    """Apply one sampled token to every needs_sample row."""
    sched.update_after_step(
        batch, {s.request.request_id: tok for s in batch.seqs if s.needs_sample}
    )


class TestSchedulerSwap:
    def test_preempt_swaps_and_restores_without_reprefill(self):
        store = FakeSwapStore()
        sched = make_sched(kv_swap=store)
        # victim: low priority, holds blocks, decodes a few tokens
        vid = sched.add_request(np.arange(12), max_new_tokens=20, priority=5)
        for _ in range(3):
            batch = sched.schedule()
            drive_decodes(sched, batch)
        victim = sched.get_request(vid)
        assert victim.num_generated >= 1
        blocks_held = len(victim.kv_block_ids)
        prefill_done_before = victim.prefill_done
        out_before = list(victim.output_token_ids)

        # aggressor: higher priority, needs more blocks than are free
        aid = sched.add_request(np.arange(40, 60), max_new_tokens=4, priority=-5)
        batch = sched.schedule()
        assert victim.state == RequestState.PENDING  # preempted
        assert victim._swapped is not None
        assert store.swap_outs, "swap_out was not called"
        assert any(s.request.request_id == aid for s in batch.seqs)

        # finish the aggressor so the victim can come back
        agg = sched.get_request(aid)
        while not agg.is_finished:
            drive_decodes(sched, batch)
            batch = sched.schedule()
            if batch is None:
                break

        # the victim must be back RUNNING with its KV restored: same state,
        # swap_in called with its freshly allocated blocks, and its next
        # scheduled row is a DECODE (no re-prefill chunk)
        assert victim.state == RequestState.RUNNING
        assert store.swap_ins
        handle, targets = store.swap_ins[-1]
        assert len(targets) == blocks_held
        assert targets == victim.kv_block_ids
        assert victim.prefill_done == prefill_done_before
        assert victim.output_token_ids == out_before
        assert victim.prefill_complete
        rows = [s for s in (batch.seqs if batch else [])
                if s.request.request_id == vid]
        if not rows:
            batch = sched.schedule()
            rows = [s for s in batch.seqs if s.request.request_id == vid]
        assert rows and not rows[0].is_prefill

    def test_swap_rejection_falls_back_to_recompute(self):
        store = FakeSwapStore(reject=True)
        sched = make_sched(kv_swap=store)
        vid = sched.add_request(np.arange(12), max_new_tokens=20, priority=5)
        for _ in range(2):
            drive_decodes(sched, sched.schedule())
        sched.add_request(np.arange(40, 60), max_new_tokens=4, priority=-5)
        sched.schedule()
        victim = sched.get_request(vid)
        assert victim.state == RequestState.PENDING
        assert victim._swapped is None  # store rejected -> recompute path
        assert victim._saved is not None

    def test_cancel_discards_swapped_handle(self):
        store = FakeSwapStore()
        sched = make_sched(kv_swap=store)
        vid = sched.add_request(np.arange(12), max_new_tokens=20, priority=5)
        for _ in range(2):
            drive_decodes(sched, sched.schedule())
        sched.add_request(np.arange(40, 60), max_new_tokens=4, priority=-5)
        sched.schedule()
        victim = sched.get_request(vid)
        assert victim._swapped is not None
        assert sched.cancel(vid)
        assert victim._swapped is None
        assert store.discards

    def test_mid_prefill_swap_restores_chunk_progress(self):
        store = FakeSwapStore()
        sched = make_sched(max_prefill_tokens=4, max_kv_blocks=13)
        sched.kv_swap = store
        vid = sched.add_request(np.arange(16), max_new_tokens=4, priority=5)
        drive_decodes(sched, sched.schedule())  # 4 of 16 prompt tokens done
        victim = sched.get_request(vid)
        assert 0 < victim.prefill_done < 16
        done_before = victim.prefill_done
        sched.add_request(np.arange(40, 80), max_new_tokens=4, priority=-5)
        batch = sched.schedule()
        assert victim.state == RequestState.PENDING and victim._swapped
        agg = batch.seqs[0].request
        while not agg.is_finished:
            drive_decodes(sched, batch)
            batch = sched.schedule()
            if batch is None:
                break
        assert victim.state == RequestState.RUNNING
        assert victim.prefill_done == done_before  # chunk progress restored
        assert not victim.prefill_complete  # continues prefilling, not redoing


@pytest.fixture(scope="module")
def tiny_setup():
    jax.config.update("jax_platforms", "cpu")
    cfg = ModelConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        num_experts=4,
        top_k=2,
        shared_expert=True,
    )
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_engine(cfg, params, *, swap: bool, max_kv_blocks: int):
    ecfg = EngineConfig(
        max_batch_size=4,
        max_seq_len=64,
        kv_block_size=4,
        max_kv_blocks=max_kv_blocks,
        max_prefill_tokens=32,
        decode_batch_buckets=(1, 2, 4),
        prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(8, 16, 32),
        multistep_decode=1,
        decode_chaining=False,
        enable_request_merging=False,
        enable_kv_swap=swap,
        kv_swap_max_mb=64,
    )
    return Engine(params, cfg, ecfg)


class TestEngineSwap:
    def test_swapped_request_resumes_bit_exact(self, tiny_setup):
        """A preempted+swapped request's final output must equal the
        uncontended run, and it must resume WITHOUT re-prefilling."""
        cfg, params = tiny_setup
        prompt = list(range(3, 17))  # 14 tokens

        # uncontended reference output
        eng0 = make_engine(cfg, params, swap=False, max_kv_blocks=64)
        ref = eng0.generate(prompt, SamplingParams(temperature=0.0, max_tokens=10))

        # contended: tight pool, aggressor preempts the victim mid-decode
        eng = make_engine(cfg, params, swap=True, max_kv_blocks=10)
        vid = eng.add_request(
            prompt, SamplingParams(temperature=0.0, max_tokens=10), priority=5
        )
        for _ in range(4):
            eng.step()
        victim = eng.scheduler.get_request(vid)
        assert victim.num_generated >= 1
        aid = eng.add_request(
            list(range(5, 25)),
            SamplingParams(temperature=0.0, max_tokens=3),
            priority=-5,
        )
        guard = 0
        while eng.scheduler.has_work and guard < 200:
            eng.step()
            guard += 1
        swap_stats = eng.scheduler.kv_swap.get_stats()
        assert swap_stats["swap_outs"] >= 1, "victim was never swapped"
        assert swap_stats["swap_ins"] >= 1, "victim was never restored"
        assert swap_stats["used_bytes"] == 0
        assert victim.output_token_ids == ref.output_tokens
        assert victim.finish_reason in ("length", "stop")

    def test_budget_zero_falls_back_to_recompute(self, tiny_setup):
        cfg, params = tiny_setup
        prompt = list(range(3, 17))
        eng = make_engine(cfg, params, swap=True, max_kv_blocks=10)
        eng.scheduler.kv_swap.max_bytes = 0
        ref = Engine(
            params, cfg, eng.engine_config.__class__(
                max_batch_size=4, max_seq_len=64, kv_block_size=4,
                max_kv_blocks=64, max_prefill_tokens=32,
                decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
                prefill_token_buckets=(8, 16, 32), multistep_decode=1,
                decode_chaining=False, enable_request_merging=False,
            )
        ).generate(prompt, SamplingParams(temperature=0.0, max_tokens=10))
        vid = eng.add_request(
            prompt, SamplingParams(temperature=0.0, max_tokens=10), priority=5
        )
        for _ in range(4):
            eng.step()
        eng.add_request(
            list(range(5, 25)),
            SamplingParams(temperature=0.0, max_tokens=3),
            priority=-5,
        )
        guard = 0
        while eng.scheduler.has_work and guard < 200:
            eng.step()
            guard += 1
        stats = eng.scheduler.kv_swap.get_stats()
        assert stats["rejected"] >= 1
        assert stats["swap_ins"] == 0
        victim = eng.scheduler.get_request(vid)
        # recompute restore is greedy-deterministic: output still matches
        assert victim.output_token_ids == ref.output_tokens
