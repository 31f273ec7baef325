"""Host-path vs device-path row partitioning (ref analog: the complex-
request partition at vllm_i64/engine/i64_engine.py:878-905).

The fused multistep window is the engine's entire performance story, so
WHICH rows it serves is load-bearing: logprobs / logit_bias / beams /
live constraint processors must go host-side; everything else — including
stop sequences and SPENT step-0 processors — must ride the device path.
"""

import jax
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.logits_processor import OutputConstraints
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


@pytest.fixture(scope="module")
def eng():
    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=2, max_position_embeddings=128,
                      num_experts=4, top_k=2, shared_expert=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    return Engine(params, cfg, EngineConfig(
        max_batch_size=4, max_seq_len=64, kv_block_size=8,
        max_kv_blocks=40, max_prefill_tokens=32,
        decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(16,), multistep_decode=8))


def _rid(eng, sp):
    return eng.add_request(list(range(5, 21)), sp)


class TestHostRows:
    def test_logprobs_is_host(self, eng):
        sp = SamplingParams(logprobs=3, max_tokens=2)
        assert eng._needs_host(sp, _rid(eng, sp))

    def test_logit_bias_is_host(self, eng):
        sp = SamplingParams(logit_bias={5: 2.0}, max_tokens=2)
        assert eng._needs_host(sp, _rid(eng, sp))

    def test_beams_is_host(self, eng):
        sp = SamplingParams(num_beams=2, max_tokens=2)
        assert eng._needs_host(sp, _rid(eng, sp))

    def test_json_mode_is_host(self, eng):
        sp = SamplingParams(json_mode=True, max_tokens=2)
        assert eng._needs_host(sp, _rid(eng, sp))

    def test_regex_constraint_is_host(self, eng):
        sp = SamplingParams(
            max_tokens=2,
            output_constraints=OutputConstraints(regex_pattern="[ab]+"))
        assert eng._needs_host(sp, _rid(eng, sp))


class TestDeviceRows:
    def test_plain_greedy_is_device(self, eng):
        sp = SamplingParams(temperature=0.0, max_tokens=2)
        assert not eng._needs_host(sp, _rid(eng, sp))

    def test_sampled_with_penalties_is_device(self, eng):
        sp = SamplingParams(temperature=0.8, top_k=20, top_p=0.9,
                            repetition_penalty=1.2, max_tokens=2)
        assert not eng._needs_host(sp, _rid(eng, sp))

    def test_min_tokens_is_device(self, eng):
        sp = SamplingParams(temperature=0.0, max_tokens=4, min_tokens=4)
        assert not eng._needs_host(sp, _rid(eng, sp))

    def test_stop_strings_are_device(self, eng):
        # stop sequences finish host-side post-sample; the row still rides
        # the device path (StopSequenceProcessor exempted)
        sp = SamplingParams(temperature=0.0, max_tokens=2, stop=["xyz"])
        rid = _rid(eng, sp)
        assert not eng._needs_host(sp, rid)

    def test_stop_token_ids_are_device(self, eng):
        sp = SamplingParams(temperature=0.0, max_tokens=2,
                            stop_token_ids=[9])
        assert not eng._needs_host(sp, _rid(eng, sp))


class TestSpentProcessors:
    def test_suppress_first_single_id_never_host(self, eng):
        """Single-id step-0 suppression rides the device sampler
        (suppress_step0 arg) — no processor, no host path at ANY step."""
        sp = SamplingParams(
            temperature=0.0, max_tokens=3,
            output_constraints=OutputConstraints(suppress_first_tokens=[7]))
        rid = _rid(eng, sp)
        assert not eng._needs_host(sp, rid)
        assert rid not in eng._procs_by_rid

    def test_suppress_first_multi_id_host_only_at_token0(self, eng):
        """Multi-id suppression keeps the host processor, but only until
        token 0 lands (then pruned back to the device path)."""
        sp = SamplingParams(
            temperature=0.0, max_tokens=3,
            output_constraints=OutputConstraints(
                suppress_first_tokens=[7, 9]))
        rid = _rid(eng, sp)
        assert eng._needs_host(sp, rid)  # token 0: suppression live
        req = eng.scheduler.get_request(rid)
        req.output_token_ids.append(11)  # token 0 landed
        eng._prune_spent_processors()
        assert not eng._needs_host(sp, rid)

    def test_prune_keeps_live_processors(self, eng):
        sp = SamplingParams(
            temperature=0.0, max_tokens=3,
            output_constraints=OutputConstraints(
                suppress_first_tokens=[7], regex_pattern="[ab]+"))
        rid = _rid(eng, sp)
        req = eng.scheduler.get_request(rid)
        req.output_token_ids.append(11)
        eng._prune_spent_processors()
        # regex processor remains -> still host
        assert eng._needs_host(sp, rid)

    def test_prune_noop_before_first_token(self, eng):
        sp = SamplingParams(
            temperature=0.0, max_tokens=3,
            output_constraints=OutputConstraints(
                suppress_first_tokens=[7, 9]))
        rid = _rid(eng, sp)
        eng._prune_spent_processors()
        assert eng._needs_host(sp, rid)


class TestOutputsCorrect:
    def test_host_and_device_rows_agree_on_greedy_tokens(self, eng):
        """A greedy request served host-side (forced via a harmless
        suppression of a token the model never picks) matches the pure
        device-path tokens."""
        sp_dev = SamplingParams(temperature=0.0, max_tokens=6)
        prompt = list(range(9, 25))
        r1 = eng.generate(list(prompt), sp_dev)
        sp_host = SamplingParams(
            temperature=0.0, max_tokens=6, logprobs=1)
        r2 = eng.generate(list(prompt), sp_host)
        assert r1.output_tokens == r2.output_tokens
        assert r2.logprobs is not None and len(r2.logprobs) == 6
