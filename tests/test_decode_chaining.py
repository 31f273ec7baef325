"""Pipelined multistep decode (window chaining) tests.

The chain dispatches window N+1 from window N's on-device carry before
reading window N's tokens back (engine._chain_advance / runner
resume_multi_decode). These tests pin: exact token parity with the
unchained engine (greedy and seeded sampling), chain breaks on admission
and cancel, per-row budget freezing, and that the chain actually engages
(so the parity assertions aren't vacuous).
"""

import threading
import time

import jax
import pytest

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


@pytest.fixture(scope="module")
def setup(request):
    cfg = request.getfixturevalue("tiny_config")
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    return params, cfg


def ecfg(k=4, chaining=True, max_batch=4):
    return EngineConfig(
        max_batch_size=max_batch, max_seq_len=64, kv_block_size=4,
        max_kv_blocks=128, max_prefill_tokens=32,
        dtype="float32", kv_cache_dtype="float32",
        decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(8, 16, 32),
        multistep_decode=k, decode_chaining=chaining,
    )


PROMPTS = [[5, 17, 42, 7], [9, 8, 7, 6, 5, 4], [100, 2, 3]]


def run_all(params, cfg, e, sampling):
    eng = Engine(params, cfg, e)
    rids = [eng.add_request(p, sp) for p, sp in zip(PROMPTS, sampling)]
    return [eng.wait_for(r).output_tokens for r in rids]


def test_chain_engages(setup):
    """White-box: pure-decode steps with k>1 must form a chain."""
    params, cfg = setup
    eng = Engine(params, cfg, ecfg(k=4))
    for p in PROMPTS:
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12))
    saw_chain = False
    for _ in range(64):
        eng.step()
        saw_chain = saw_chain or eng._decode_chain is not None
        if not eng.scheduler.has_work:
            break
    assert saw_chain
    assert eng._decode_chain is None  # drained cleanly


def test_chained_matches_unchained_greedy(setup):
    params, cfg = setup
    sp = [SamplingParams(temperature=0.0, max_tokens=n) for n in (3, 10, 17)]
    got = run_all(params, cfg, ecfg(chaining=True), sp)
    ref = run_all(params, cfg, ecfg(chaining=False), sp)
    assert got == ref
    # budgets respected exactly (on-device `left` freezing)
    assert [len(t) for t in got] == [len(t) for t in ref]


def test_chained_matches_single_step(setup):
    params, cfg = setup
    sp = [SamplingParams(temperature=0.0, max_tokens=8)] * 3
    got = run_all(params, cfg, ecfg(k=4, chaining=True), sp)
    ref = run_all(params, cfg, ecfg(k=1, chaining=False), sp)
    assert got == ref


def test_chained_matches_unchained_seeded_sampling(setup):
    """Seeded stochastic streams must be identical however the windows are
    chained (gen_index rides the device carry)."""
    params, cfg = setup
    sp = [SamplingParams(temperature=0.9, top_p=0.9, seed=41 + i,
                         max_tokens=12) for i in range(3)]
    got = run_all(params, cfg, ecfg(chaining=True), sp)
    ref = run_all(params, cfg, ecfg(chaining=False), sp)
    assert got == ref


def test_chain_breaks_on_admission(setup):
    """A request arriving mid-chain must still be admitted and produce the
    same tokens as in an unchained engine."""
    params, cfg = setup

    def run(chaining):
        eng = Engine(params, cfg, ecfg(chaining=chaining))
        sp = SamplingParams(temperature=0.0, max_tokens=10)
        rids = [eng.add_request(PROMPTS[0], sp),
                eng.add_request(PROMPTS[1], sp)]
        # step until decoding is underway (chain formed), then admit late
        for _ in range(3):
            eng.step()
        rids.append(eng.add_request(PROMPTS[2], sp))
        return [eng.wait_for(r).output_tokens for r in rids]

    assert run(True) == run(False)


def test_chain_cancel_mid_stream(setup):
    params, cfg = setup
    eng = Engine(params, cfg, ecfg(chaining=True))
    sp = SamplingParams(temperature=0.0, max_tokens=30)
    r0 = eng.add_request(PROMPTS[0], sp)
    r1 = eng.add_request(PROMPTS[1], sp)
    for _ in range(3):
        eng.step()
    assert eng.cancel_request(r1)
    out0 = eng.wait_for(r0)
    assert len(out0.output_tokens) > 0
    assert eng._decode_chain is None


def test_chain_with_stop_sequences_disabled(setup):
    """Rows with stop sequences must not chain (host-side finishes diverge
    from the device's frozen-row view) — and must still work."""
    params, cfg = setup
    eng = Engine(params, cfg, ecfg(chaining=True))
    # token-id stop: wired through StopSequenceProcessor
    sp = SamplingParams(temperature=0.0, max_tokens=10, stop_token_ids=[7])
    rid = eng.add_request(PROMPTS[0], sp)
    saw_chain = False
    while eng.scheduler.has_work:
        eng.step()
        saw_chain = saw_chain or eng._decode_chain is not None
    assert not saw_chain
    res = eng.wait_for(rid)
    assert len(res.output_tokens) >= 1


def test_chain_concurrent_add_thread_safety(setup):
    """Admissions from another thread while the step loop chains."""
    params, cfg = setup
    eng = Engine(params, cfg, ecfg(chaining=True))
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    rids = [eng.add_request(PROMPTS[0], sp)]
    stop = threading.Event()

    def stepper():
        while not stop.is_set():
            eng.step()
            if not eng.scheduler.has_work:
                time.sleep(0.001)

    th = threading.Thread(target=stepper, daemon=True)
    th.start()
    try:
        time.sleep(0.05)
        rids.append(eng.add_request(PROMPTS[1], sp))
        time.sleep(0.05)
        rids.append(eng.add_request(PROMPTS[2], sp))
        deadline = time.time() + 60
        for rid in rids:
            while True:
                req = eng.scheduler.get_request(rid)
                done = (req is None or req.is_finished
                        or rid in eng.merged_finished)
                if done:
                    break
                assert time.time() < deadline, "request did not finish"
                time.sleep(0.01)
    finally:
        stop.set()
        th.join(timeout=5)
