"""KV swap under concurrent preemption pressure (VERDICT r2 #9).

The round-2 suite covered single-victim swap scenarios; these tests drive
the byte budget through MULTIPLE simultaneous victims: partial budgets must
split one step's preemptions into swapped + recomputed victims, budget must
be released by BOTH swap_in and discard, and engine-level serving must stay
correct when more long requests contend than the budget covers
(ref: vllm_i64/core/kv_cache.py:711-813 — the reference's swap never faces
this because its engine swaps at most one victim per step).
"""

import jax
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.kv_swap import RunnerKVSwap
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


def _cfg():
    return ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=128, num_experts=4, top_k=2,
        shared_expert=True,
    )


def _engine(max_kv_blocks=10, swap_mb=512, **kw):
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=64, kv_block_size=8,
        max_kv_blocks=max_kv_blocks, max_prefill_tokens=64,
        decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(8, 16, 32), multistep_decode=1,
        enable_kv_swap=True, kv_swap_max_mb=swap_mb, **kw,
    )
    params = cdm.init_params(_cfg(), jax.random.PRNGKey(0))
    return Engine(params, _cfg(), ecfg)


class TestBudgetAccounting:
    def _swap(self, eng, max_bytes):
        return RunnerKVSwap(eng.runner, max_bytes)

    def test_budget_splits_concurrent_victims(self):
        eng = _engine()
        bb = RunnerKVSwap(eng.runner, 0)._block_bytes()
        # budget for exactly 3 blocks: two 2-block victims -> first swaps,
        # second is rejected (falls back to recompute)
        swap = RunnerKVSwap(eng.runner, 3 * bb)
        h1 = swap.swap_out([1, 2])
        assert h1 is not None
        h2 = swap.swap_out([3, 4])
        assert h2 is None
        assert swap.rejected == 1
        # one-block victim still fits the remaining budget
        h3 = swap.swap_out([5])
        assert h3 is not None
        assert swap.used_bytes == 3 * bb

    def test_swap_in_releases_budget_for_next_victim(self):
        eng = _engine()
        bb = RunnerKVSwap(eng.runner, 0)._block_bytes()
        swap = RunnerKVSwap(eng.runner, 2 * bb)
        h1 = swap.swap_out([1, 2])
        assert swap.swap_out([3, 4]) is None
        swap.swap_in(h1, [6, 7])
        assert swap.used_bytes == 0
        assert swap.swap_out([3, 4]) is not None

    def test_discard_releases_budget(self):
        eng = _engine()
        bb = RunnerKVSwap(eng.runner, 0)._block_bytes()
        swap = RunnerKVSwap(eng.runner, 2 * bb)
        h1 = swap.swap_out([1, 2])
        swap.discard(h1)
        assert swap.used_bytes == 0
        assert swap.swap_out([3, 4]) is not None

    def test_swap_roundtrip_to_different_blocks_bit_exact(self):
        eng = _engine()
        r = eng.runner
        # write recognizable values into blocks 1, 2
        k = np.array(r.kv_k, copy=True)
        k[:, 1] = 1.5
        k[:, 2] = -2.25
        r.kv_k = jax.numpy.asarray(k)
        r.kv_v = jax.numpy.asarray(k * 0.5)
        swap = RunnerKVSwap(r, 10**9)
        h = swap.swap_out([1, 2])
        # clobber the source blocks, restore into different physical ids
        z = np.array(r.kv_k, copy=True)
        z[:, 1] = 0
        z[:, 2] = 0
        r.kv_k = jax.numpy.asarray(z)
        swap.swap_in(h, [4, 5])
        out_k = np.asarray(r.kv_k)
        assert np.all(out_k[:, 4] == 1.5)
        assert np.all(out_k[:, 5] == -2.25)
        out_v = np.asarray(r.kv_v)
        assert np.all(out_v[:, 4] == 0.75)

    def test_stats_track_all_paths(self):
        eng = _engine()
        bb = RunnerKVSwap(eng.runner, 0)._block_bytes()
        swap = RunnerKVSwap(eng.runner, 2 * bb)
        h = swap.swap_out([1])
        swap.swap_out([2, 3, 4])  # rejected
        swap.swap_in(h, [5])
        s = swap.get_stats()
        assert s["swap_outs"] == 1
        assert s["swap_ins"] == 1
        assert s["rejected"] == 1
        assert s["used_bytes"] == 0


class TestEnginePressure:
    def _drive(self, eng, prompts, sp, priorities):
        rids = [eng.add_request(list(p), sp, priority=pr)
                for p, pr in zip(prompts, priorities)]
        guard = 0
        while eng.scheduler.has_work and guard < 3000:
            eng.step()
            guard += 1
        return [eng.scheduler.get_request(r).output_token_ids for r in rids]

    def test_serving_correct_with_undersized_swap_budget(self):
        """Background (low-priority) requests are preempted by urgent ones
        with a budget covering only SOME victims: every request must still
        finish with the same output as an uncontended engine (swapped and
        recomputed victims alike). Preemption only evicts strictly
        lower-priority work, so victims carry priority 2 vs the urgent 0."""
        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(1))
        base = EngineConfig(
            max_batch_size=4, max_seq_len=64, kv_block_size=8,
            max_kv_blocks=64, max_prefill_tokens=64,
            decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
            prefill_token_buckets=(8, 16, 32), multistep_decode=1,
        )
        sp = SamplingParams(temperature=0.0, max_tokens=10)
        prompts = [list(range(3 + 7 * i, 19 + 7 * i)) for i in range(4)]
        priorities = [2, 2, 2, 0]  # three background + one urgent
        ref_eng = Engine(params, cfg, base)
        expected = [ref_eng.generate(list(p), sp).output_tokens
                    for p in prompts]

        import dataclasses

        tight = dataclasses.replace(base, max_kv_blocks=13,
                                    enable_kv_swap=True, kv_swap_max_mb=1)
        eng = Engine(params, cfg, tight)
        got = self._drive(eng, prompts, sp, priorities)
        assert got == expected

    def test_zero_budget_still_serves(self):
        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(2))
        ecfg = EngineConfig(
            max_batch_size=4, max_seq_len=64, kv_block_size=8,
            max_kv_blocks=11, max_prefill_tokens=64,
            decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
            prefill_token_buckets=(8, 16, 32), multistep_decode=1,
            enable_kv_swap=True, kv_swap_max_mb=0,
        )
        eng = Engine(params, cfg, ecfg)
        sp = SamplingParams(temperature=0.0, max_tokens=8)
        prompts = [list(range(5 + i, 21 + i)) for i in range(4)]
        got = self._drive(eng, prompts, sp, [3, 2, 1, 0])
        for o in got:
            assert len(o) == 8
        swap = eng.scheduler.kv_swap
        assert swap.swap_outs == 0  # everything rejected -> pure recompute
        assert swap.rejected >= 1  # preemption did happen, swap was offered
