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


def _mkseq(rid, n):
    from vllm_i64_tpu.core.scheduler import Request, ScheduledSeq

    return ScheduledSeq(
        request=Request(request_id=rid,
                        prompt_token_ids=np.arange(n, dtype=np.int64),
                        max_new_tokens=1),
        token_ids=np.arange(n, dtype=np.int64),
        positions=np.arange(n, dtype=np.int32),
        is_prefill=True,
        needs_sample=True,
    )


class TestBudgetSplit:
    """engine._budget_split: parts' BUCKETED area must stay within
    max_prefill_tokens (r5: full-wave prefill dispatch) while preserving
    row order so packed subrows never reorder across parts."""

    def _engine(self, budget, bb=(1, 2, 4, 8, 16, 32, 64),
                tb=(16, 32, 64, 128, 512)):
        ecfg = EngineConfig(**{**KW, "max_prefill_tokens": budget,
                               "prefill_batch_buckets": bb,
                               "prefill_token_buckets": tb})
        return Engine(None, None, ecfg)

    def test_uniform_wave_single_part(self):
        eng = self._engine(8192)
        rows = [_mkseq(i, 128) for i in range(64)]
        parts = list(eng._budget_split(rows, 64))
        assert len(parts) == 1 and len(parts[0]) == 64

    def test_bucketed_area_never_exceeds_budget(self):
        eng = self._engine(8192)
        rng = np.random.default_rng(3)
        rows = [_mkseq(i, int(n)) for i, n in
                enumerate(rng.integers(1, 513, size=40))]
        bucket = lambda v, B: next((x for x in B if v <= x), B[-1])
        for part in eng._budget_split(rows, 64):
            b = bucket(len(part), (1, 2, 4, 8, 16, 32, 64))
            t = bucket(max(len(s.token_ids) for s in part),
                       (16, 32, 64, 128, 512))
            assert len(part) == 1 or b * t <= 8192, (len(part), b, t)

    def test_row_order_preserved(self):
        eng = self._engine(2048)
        rng = np.random.default_rng(5)
        rows = [_mkseq(i, int(n)) for i, n in
                enumerate(rng.integers(1, 513, size=30))]
        flat = [s.request.request_id
                for part in eng._budget_split(rows, 64) for s in part]
        assert flat == [s.request.request_id for s in rows]

    def test_single_wide_row_allowed(self):
        # one row wider than the budget must still dispatch (as its own part)
        eng = self._engine(256, tb=(16, 512))
        rows = [_mkseq(0, 400), _mkseq(1, 10)]
        parts = list(eng._budget_split(rows, 64))
        assert [len(p) for p in parts] == [1, 1]


class TestLazySlotCounts:
    """runner._flush_slot_counts: lazy clears/history-loads must land as
    one batched scatter with exactly the per-slot semantics of the old
    eager path."""

    def _runner(self):
        from vllm_i64_tpu.engine.runner import ModelRunner

        params = cdm.init_params(CFG, jax.random.PRNGKey(0))
        return ModelRunner(params, CFG, EngineConfig(**KW))

    def test_flush_applies_clears_and_histories(self):
        r = self._runner()
        r.load_slot_history(0, np.array([3, 3, 5], np.int64))
        r.load_slot_history(2, np.array([7], np.int64))
        r.clear_slot(1)
        r._flush_slot_counts()
        counts = np.asarray(r.counts)
        assert counts[0, 3] == 2 and counts[0, 5] == 1
        assert counts[1].sum() == 0
        assert counts[2, 7] == 1 and counts[2].sum() == 1
        assert not r._pending_slot_counts

    def test_last_update_per_slot_wins(self):
        r = self._runner()
        r.load_slot_history(1, np.array([4, 4], np.int64))
        r.clear_slot(1)  # overwrite: reassignment after release
        r._flush_slot_counts()
        assert np.asarray(r.counts)[1].sum() == 0
        r.clear_slot(1)
        r.load_slot_history(1, np.array([9], np.int64))
        r._flush_slot_counts()
        assert np.asarray(r.counts)[1, 9] == 1

    def test_flush_happens_before_dispatch(self):
        # penalties must see the prompt history loaded in the SAME step the
        # slot is first used — engine path covers it end-to-end
        params = cdm.init_params(CFG, jax.random.PRNGKey(0))
        eng = Engine(params, CFG, EngineConfig(**KW))
        sp = SamplingParams(temperature=0.7, repetition_penalty=1.8,
                            seed=3, max_tokens=6)
        a = eng.generate([5, 5, 5, 5], sp).output_tokens
        b = eng.generate([5, 5, 5, 5], sp).output_tokens
        assert a == b


class TestMixedStepOrdering:
    """r5 scheduling inversion: in a mixed step, decode windows must
    ENQUEUE before the prefill wave (a decode token's latency is bounded
    by ~one window, not the wave), and resolves must still produce the
    same tokens as a pure-FIFO engine."""

    def test_windows_dispatch_before_prefill_wave(self):
        params = cdm.init_params(CFG, jax.random.PRNGKey(0))
        ecfg = EngineConfig(**{**KW, "multistep_decode": 2,
                               "decode_chaining": False})
        eng = Engine(params, CFG, ecfg)
        calls = []
        runner = eng.runner
        orig_win = type(runner).dispatch_multi_decode
        orig_exec = type(runner).execute

        def spy_win(self_, *a, **k):
            calls.append("window")
            return orig_win(self_, *a, **k)

        def spy_exec(self_, *a, **k):
            calls.append(k.get("kind", "decode"))
            return orig_exec(self_, *a, **k)

        runner.dispatch_multi_decode = spy_win.__get__(runner)
        runner.execute = spy_exec.__get__(runner)

        sp = SamplingParams(temperature=0.0, max_tokens=8)
        rng = np.random.default_rng(0)
        eng.add_request(rng.integers(3, 250, size=8).tolist(), sp)
        eng.step()  # prefill request 1
        # request 2's prefill shares a step with request 1's decode window
        eng.add_request(rng.integers(3, 250, size=8).tolist(), sp)
        calls.clear()
        eng.step()
        assert "window" in calls and "prefill" in calls, calls
        assert calls.index("window") < calls.index("prefill"), calls

    def test_mixed_host_and_device_groups_resolve(self):
        # logprobs rows take the host-logits path; plain rows ride the
        # fused single-sync resolve — one step with both must finish both
        params = cdm.init_params(CFG, jax.random.PRNGKey(0))
        eng = Engine(params, CFG, EngineConfig(**KW))
        rng = np.random.default_rng(1)
        plain = SamplingParams(temperature=0.0, max_tokens=4)
        hostp = SamplingParams(temperature=0.0, max_tokens=4, logprobs=2)
        ids = []
        for i in range(6):
            ids.append(eng.add_request(
                rng.integers(3, 250, size=10).tolist(),
                hostp if i % 2 else plain))
        out = {}
        guard = 0
        while eng.scheduler.has_work and guard < 300:
            for rid, t in eng.step().items():
                out.setdefault(rid, []).extend(t)
            guard += 1
        assert len(out) == 6 and all(len(v) == 4 for v in out.values()), \
            {k: len(v) for k, v in out.items()}
