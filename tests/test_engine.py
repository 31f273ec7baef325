"""End-to-end engine tests: continuous batching, greedy determinism,
engine-vs-standalone-forward parity, model-less mode, sampling params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


@pytest.fixture(scope="module")
def engine_setup(request):
    cfg = request.getfixturevalue("tiny_config")
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        max_batch_size=4,
        max_seq_len=64,
        kv_block_size=4,
        max_kv_blocks=64,
        max_prefill_tokens=32,
        dtype="float32",
        kv_cache_dtype="float32",
        decode_batch_buckets=(1, 2, 4),
        prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(8, 16, 32),
    )
    return params, cfg, ecfg


def greedy(n=8):
    return SamplingParams(temperature=0.0, max_tokens=n)


def ref_greedy_tokens(params, cfg, prompt, n):
    """Greedy continuation via the standalone full forward (no cache)."""
    ids = list(prompt)
    out = []
    for _ in range(n):
        logits = cdm.forward(params, cfg, jnp.asarray([ids], dtype=jnp.int32))
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
        if tok == cfg.eos_token_id:
            break
        ids.append(tok)
    return out


class TestEngineE2E:
    def test_greedy_matches_standalone_forward(self, engine_setup):
        params, cfg, ecfg = engine_setup
        eng = Engine(params, cfg, ecfg)
        prompt = [5, 17, 42, 7]
        ref = ref_greedy_tokens(params, cfg, prompt, 6)
        res = eng.generate(prompt, greedy(6))
        assert res.output_tokens == ref

    def test_continuous_batching_multiple_requests(self, engine_setup):
        params, cfg, ecfg = engine_setup
        eng = Engine(params, cfg, ecfg)
        prompts = [[1, 2, 3], [10, 20, 30, 40], [7, 7]]
        refs = [ref_greedy_tokens(params, cfg, p, 5) for p in prompts]
        rids = [eng.add_request(p, greedy(5)) for p in prompts]
        results = [eng.wait_for(r) for r in rids]
        for res, ref in zip(results, refs):
            assert res.output_tokens == ref

    def test_batched_equals_sequential(self, engine_setup):
        """Tokens must not depend on what else is in the batch."""
        params, cfg, ecfg = engine_setup
        prompts = [[3, 1, 4, 1, 5], [9, 2, 6]]
        eng1 = Engine(params, cfg, ecfg)
        seq_results = [eng1.generate(p, greedy(4)).output_tokens for p in prompts]
        eng2 = Engine(params, cfg, ecfg)
        rids = [eng2.add_request(p, greedy(4)) for p in prompts]
        batch_results = [eng2.wait_for(r).output_tokens for r in rids]
        assert seq_results == batch_results

    def test_chunked_prefill_same_output(self, engine_setup):
        params, cfg, ecfg = engine_setup
        import dataclasses

        small = dataclasses.replace(ecfg, max_prefill_tokens=4)
        eng = Engine(params, cfg, small)
        prompt = list(range(3, 23))  # 20 tokens, chunks of 4
        ref = ref_greedy_tokens(params, cfg, prompt, 4)
        res = eng.generate(prompt, greedy(4))
        assert res.output_tokens == ref

    def test_seeded_sampling_reproducible(self, engine_setup):
        params, cfg, ecfg = engine_setup
        sp = SamplingParams(temperature=1.0, top_k=0, max_tokens=6, seed=42)
        outs = []
        for _ in range(2):
            eng = Engine(params, cfg, ecfg)
            outs.append(eng.generate([1, 2, 3], sp).output_tokens)
        assert outs[0] == outs[1]

    def test_finish_reasons(self, engine_setup):
        params, cfg, ecfg = engine_setup
        eng = Engine(params, cfg, ecfg)
        res = eng.generate([1, 2, 3], greedy(3))
        assert res.finish_reason in ("length", "stop")
        assert len(res.output_tokens) <= 3

    def test_stats(self, engine_setup):
        params, cfg, ecfg = engine_setup
        eng = Engine(params, cfg, ecfg)
        eng.generate([4, 5], greedy(2))
        stats = eng.get_stats()
        assert stats["total_tokens_generated"] >= 2
        assert stats["perf"]["avg_step_ms"] > 0
        assert stats["kv_cache_bytes"] > 0


class TestModelless:
    def test_modelless_engine_runs(self):
        eng = Engine(None, None, EngineConfig(max_batch_size=4, max_kv_blocks=64))
        rid = eng.add_request([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=5))
        res = eng.wait_for(rid)
        assert len(res.output_tokens) <= 5
        assert res.finish_reason in ("length", "stop")

    def test_modelless_many_requests(self):
        eng = Engine(None, None, EngineConfig(max_batch_size=8, max_kv_blocks=256))
        rids = [
            eng.add_request([i + 1, i + 2], SamplingParams(temperature=0.0, max_tokens=3))
            for i in range(10)
        ]
        for r in rids:
            res = eng.wait_for(r)
            assert res.finish_reason in ("length", "stop")

    def test_logprobs_collected(self):
        eng = Engine(None, None, EngineConfig(max_batch_size=2, max_kv_blocks=64))
        sp = SamplingParams(temperature=0.0, max_tokens=3, logprobs=2)
        res = eng.generate([1, 2], sp)
        assert res.logprobs is not None
        assert len(res.logprobs) == len(res.output_tokens)
        assert res.logprobs[0].top_logprobs is not None
        assert len(res.logprobs[0].top_logprobs) == 2

    def test_penalties_run_on_device_path(self, engine_setup):
        params, cfg, ecfg = engine_setup
        eng = Engine(params, cfg, ecfg)
        sp = SamplingParams(
            temperature=0.0, max_tokens=5, repetition_penalty=1.3,
            frequency_penalty=0.2, presence_penalty=0.1,
        )
        res = eng.generate([1, 2, 3], sp)
        assert len(res.output_tokens) <= 5

    def test_timeout_cancels(self):
        eng = Engine(None, None, EngineConfig(max_batch_size=2, max_kv_blocks=64))
        rid = eng.add_request(
            [1, 2], SamplingParams(temperature=0.0, max_tokens=1000),
            timeout_s=0.0001,
        )
        import time

        time.sleep(0.01)
        res = eng.wait_for(rid, max_steps=50)
        assert res.finish_reason in ("timeout", "cancelled", "length")

    def test_prompt_plus_max_tokens_validated(self):
        eng = Engine(None, None, EngineConfig(max_seq_len=16, max_kv_blocks=64))
        with pytest.raises(ValueError):
            eng.add_request(list(range(10)), SamplingParams(max_tokens=100))


class TestPipelinedDispatch:
    """The step loop dispatches every split group before resolving any
    (deferred device arrays). Outputs must be identical to the unsplit path."""

    def _ecfg(self, caps):
        return EngineConfig(
            max_batch_size=8, max_seq_len=64, kv_block_size=4,
            max_kv_blocks=256, max_prefill_tokens=16,
            dtype="float32", kv_cache_dtype="float32",
            decode_batch_buckets=caps, prefill_batch_buckets=caps,
            prefill_token_buckets=(8, 16), multistep_decode=1,
        )

    def test_split_groups_match_unsplit(self, engine_setup):
        params, cfg, _ = engine_setup
        prompts = [[5, 17, 42, 7], [9, 9, 9], [100, 2, 3, 4, 5, 6], [33, 44],
                   [1, 2, 3], [200, 201], [7, 8, 9, 10], [55]]
        # tiny buckets: 8 running seqs force 4 decode parts per step,
        # all dispatched before any host readback
        eng = Engine(params, cfg, self._ecfg((1, 2)))
        rids = [eng.add_request(p, greedy(8)) for p in prompts]
        split_out = [eng.wait_for(r).output_tokens for r in rids]
        refs = [ref_greedy_tokens(params, cfg, p, 8) for p in prompts]
        for got, ref in zip(split_out, refs):
            assert got == ref

    def test_host_sampled_rows_from_deferred_logits(self, engine_setup):
        params, cfg, _ = engine_setup
        eng = Engine(params, cfg, self._ecfg((1, 2)))
        sp = SamplingParams(temperature=0.8, top_p=0.9, max_tokens=5,
                            seed=1234, logprobs=3)
        rids = [eng.add_request([5 + i, 17, 42], sp) for i in range(4)]
        for r in rids:
            res = eng.wait_for(r)
            # EOS can legitimately be sampled before max_tokens
            assert 1 <= len(res.output_tokens) <= 5
            assert res.logprobs is not None
            assert len(res.logprobs) == len(res.output_tokens)

    def test_seeded_reproducible_through_split_path(self, engine_setup):
        params, cfg, _ = engine_setup

        def run():
            eng = Engine(params, cfg, self._ecfg((1, 2)))
            rids = [eng.add_request([5 + i, 17, 42],
                                    SamplingParams(temperature=1.0,
                                                   max_tokens=5, seed=77))
                    for i in range(4)]
            return [eng.wait_for(r).output_tokens for r in rids]

        assert run() == run()


class TestMixedMultistepPrefill:
    def test_multistep_with_concurrent_prefill_matches_single_step(
            self, engine_setup):
        """Decode rows run the fused multistep window while other requests'
        prefill chunks share the step; output must equal the K=1 engine."""
        params, cfg, _ = engine_setup

        def ecfg(k):
            return EngineConfig(
                max_batch_size=4, max_seq_len=64, kv_block_size=4,
                max_kv_blocks=128, max_prefill_tokens=8,
                dtype="float32", kv_cache_dtype="float32",
                decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
                prefill_token_buckets=(8, 16), multistep_decode=k,
            )

        prompts = [[5, 17, 42, 7], [9, 9, 9, 11, 12, 13, 14, 15, 16, 2],
                   [100, 2, 3, 4], [33, 44, 45, 46, 47, 48]]

        def run(k):
            eng = Engine(params, cfg, ecfg(k))
            # stagger admissions so chunked prefill of later requests
            # overlaps decode of earlier ones
            rids = [eng.add_request(prompts[0], greedy(10)),
                    eng.add_request(prompts[1], greedy(10))]
            eng.step()
            rids.append(eng.add_request(prompts[2], greedy(10)))
            eng.step()
            rids.append(eng.add_request(prompts[3], greedy(10)))
            return [eng.wait_for(r).output_tokens for r in rids]

        assert run(4) == run(1)
