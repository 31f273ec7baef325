"""Soak: sustained request storms must leave ZERO per-request residue.

A serving engine that leaks Request objects, sampler slots, KV blocks, or
merge-group entries falls over after hours — these tests run hundreds of
requests through every lifecycle path (finish, cancel, timeout, merge,
preempt) and assert the engine's state dictionaries return to empty.
"""

import numpy as np

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine


def make_engine(**kw):
    kw.setdefault("max_batch_size", 8)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("kv_block_size", 4)
    kw.setdefault("max_kv_blocks", 256)
    kw.setdefault("max_prefill_tokens", 32)
    return Engine(None, None, EngineConfig(**kw))


def assert_drained(eng: Engine):
    assert not eng.scheduler.running
    assert not eng._slot_by_rid
    assert len(eng._free_slots) == eng.engine_config.max_batch_size
    assert not eng._params_by_rid
    assert not eng._procs_by_rid
    assert not eng._logprobs_by_rid
    assert not eng._soft_by_rid
    assert not eng._deadlines
    assert not eng._merge_primaries
    assert not eng._merged_secondaries
    assert not eng.merged_finished
    assert not eng.scheduler._requests
    assert not eng.scheduler.finished
    # every KV block returned to the pool (block 0 = null, reserved)
    assert eng.scheduler.blocks.num_free == eng.scheduler.blocks.num_blocks - 1


def test_soak_sequential_storm():
    eng = make_engine()
    rng = np.random.default_rng(0)
    for i in range(300):
        n = int(rng.integers(1, 20))
        sp = SamplingParams(
            temperature=float(rng.choice([0.0, 0.8])),
            max_tokens=int(rng.integers(1, 8)),
            logprobs=int(rng.integers(0, 3)) or None,
            seed=int(rng.integers(0, 100)) if rng.random() < 0.3 else None,
        )
        res = eng.generate(rng.integers(1, 200, n).tolist(), sp)
        assert res.finish_reason in ("stop", "length")
    assert_drained(eng)


def test_soak_concurrent_waves_with_cancel_and_timeout():
    eng = make_engine(enable_request_merging=True)
    rng = np.random.default_rng(1)
    for wave in range(30):
        rids = []
        for j in range(12):  # oversubscribe the 8-slot batch
            prompt = rng.integers(1, 200, int(rng.integers(2, 16))).tolist()
            if j % 4 == 0:
                prompt = [7, 7, 7]  # mergeable duplicates
            rids.append(eng.add_request(
                prompt,
                SamplingParams(temperature=0.0, max_tokens=6),
                timeout_s=None if j % 5 else 30.0,
            ))
        # cancel a couple mid-flight
        eng.step()
        eng.cancel_request(rids[1])
        eng.cancel_request(rids[2])
        for r in rids:
            try:
                eng.wait_for(r, max_steps=500)
            except KeyError:
                pass  # cancelled
    assert_drained(eng)


def test_soak_preemption_churn():
    # tiny KV pool forces constant preemption/restore
    eng = make_engine(max_kv_blocks=24, enable_preemption=True)
    rng = np.random.default_rng(2)
    rids = [
        eng.add_request(
            rng.integers(1, 200, 8).tolist(),
            SamplingParams(temperature=0.0, max_tokens=10),
            priority=int(rng.integers(0, 3)),
        )
        for _ in range(10)
    ]
    for r in rids:
        res = eng.wait_for(r, max_steps=2000)
        assert len(res.output_tokens) >= 1
    assert_drained(eng)
