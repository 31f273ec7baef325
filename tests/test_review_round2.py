"""Regression tests for the round-2 code-review findings (API + scheduler
+ sampling)."""

import numpy as np
import pytest

from vllm_i64_tpu.core.sampling import SamplingParams, make_param_arrays
from vllm_i64_tpu.core.scheduler import RequestState, Scheduler


class _Req:
    num_generated = 0
    eos_token_id = 0


def test_out_of_range_seed_does_not_crash_the_step():
    """A user seed outside int32 folded deterministically, never an
    OverflowError inside the engine step (which would fail every
    in-flight request)."""
    p = SamplingParams(temperature=0.7, seed=2**33 + 5)
    out = make_param_arrays([p], [_Req()])
    assert out["seeds"].dtype == np.int32
    out2 = make_param_arrays([p], [_Req()])
    assert out["seeds"][0] == out2["seeds"][0]  # still deterministic


def test_bare_string_stop_is_one_sequence():
    """OpenAI allows stop as a bare string; it must become ONE stop
    sequence, not per-character sequences."""
    from vllm_i64_tpu.api.types import CompletionRequest

    req = CompletionRequest.from_body({"stop": "END", "max_tokens": 4}, "hi")
    assert req.stop == ["END"]
    sp = req.to_sampling_params()
    assert sp.output_constraints.stop_sequences == [
        [int(b) for b in b"END"]]


def test_response_cache_distinguishes_stop_and_format():
    from vllm_i64_tpu.api.tracking import RequestCache

    cache = RequestCache()
    kw_a = dict(temperature=0.0, stop=repr(["\n"]), logprobs=None)
    kw_b = dict(temperature=0.0, stop=repr(None), logprobs=None)
    cache.put("p", 8, {"text": "A"}, **kw_a)
    assert cache.get("p", 8, **kw_b) is None
    assert cache.get("p", 8, **kw_a) == {"text": "A"}


def test_num_pending_counter_tracks_heap_transitions():
    s = Scheduler(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                  max_kv_blocks=32, max_prefill_tokens=16)
    rids = [s.add_request(np.arange(4), max_new_tokens=4) for _ in range(5)]
    assert s.num_pending == 5
    assert s.cancel(rids[0])
    assert s.num_pending == 4
    batch = s.schedule()  # admits up to max_batch_size
    assert batch is not None
    assert s.num_pending == 5 - 1 - len(s.running)
    # counter matches a full recount of live heap entries
    live = sum(1 for *_, r in s._pending if r.state == RequestState.PENDING)
    assert s.num_pending == live


def test_preempted_peer_keeps_its_sampled_token():
    """update_after_step applies ALL sampled tokens before any block
    growth, so a request preempted by a peer's growth in the same batch
    keeps the token the engine already streamed."""
    s = Scheduler(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                  max_kv_blocks=9,  # block 0 reserved -> 8 usable, tight
                  max_prefill_tokens=32, enable_preemption=True)
    ra = s.add_request(np.arange(16), max_new_tokens=8, priority=0)
    rb = s.add_request(np.arange(16), max_new_tokens=8, priority=5)
    batch = s.schedule()
    assert batch is not None and len(batch.seqs) >= 1
    # drive prefill to completion for whichever requests were admitted
    for _ in range(8):
        batch = s.schedule()
        if batch is None:
            break
        s.update_after_step(
            batch, {sq.request.request_id: 7
                    for sq in batch.seqs if sq.needs_sample})
        if all(r.prefill_complete for r in s.running):
            break
    # now force growth pressure: fill tokens until somebody preempts
    for _ in range(16):
        batch = s.schedule()
        if batch is None:
            break
        tokens = {sq.request.request_id: 7
                  for sq in batch.seqs if sq.needs_sample}
        before = {
            sq.request.request_id: len(sq.request.output_token_ids)
            for sq in batch.seqs if sq.needs_sample
        }
        s.update_after_step(batch, tokens)
        for rid, n_before in before.items():
            req = s.get_request(rid)
            if req.state == RequestState.PENDING and req._saved is not None:
                # preempted THIS step: the snapshot must include the token
                assert len(req._saved[0]) == n_before + 1
        if any(r.state == RequestState.PENDING and r._saved
               for r in (s.get_request(ra), s.get_request(rb))):
            return  # exercised the preemption-mid-update path
    # preemption may not trigger with these sizes on every platform; the
    # invariant above still ran on every step


def test_spec_rejection_sampling_is_target_faithful():
    """With a deterministic draft, P(output=d) must equal q(d) — resampling
    the full distribution on rejection gave q + (1-q)q."""
    from vllm_i64_tpu.core.speculative import SpeculativeDecoder

    rng = np.random.default_rng(0)
    v = 8
    logits = np.full(v, -10.0, np.float32)
    logits[3] = 0.0
    logits[5] = 0.0  # q(3) = q(5) ~= 0.5 each
    sd = SpeculativeDecoder.__new__(SpeculativeDecoder)
    sd._rng = np.random.default_rng(0)
    sd.total_drafted = 0
    sd.total_accepted = 0
    params = SamplingParams(temperature=1.0)
    hits = 0
    n = 3000
    for _ in range(n):
        out, _ = sd.accept(np.array([3]), np.stack([logits, logits]),
                           params=params)
        if out[0] == 3:
            hits += 1
    frac = hits / n
    assert 0.45 < frac < 0.55, f"draft-token frequency {frac} biased"


def test_loader_converts_hf_prefixed_expert_keys():
    from vllm_i64_tpu.core.loader import convert_framework_weights

    sd = {}
    for layer in range(2):
        for e in range(2):
            sd[f"model.layers.{layer}.mlp.experts.{e}.gate_proj.weight"] = (
                np.zeros((8, 4), np.float32))
            sd[f"model.layers.{layer}.mlp.experts.{e}.up_proj.weight"] = (
                np.zeros((8, 4), np.float32))
            sd[f"model.layers.{layer}.mlp.experts.{e}.down_proj.weight"] = (
                np.zeros((4, 8), np.float32))
    out = convert_framework_weights(sd)
    assert "layers.0.mlp.gate_proj_w" in out
    assert out["layers.0.mlp.gate_proj_w"].shape == (2, 4, 8)


def test_disaggregated_requests_honor_stop_token_ids():
    """Per-request processors must flow through the disaggregated path."""
    import jax

    from vllm_i64_tpu import EngineConfig, ModelConfig
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.parallel.disaggregated import (
        DecodeWorker,
        DisaggregatedCoordinator,
        PrefillWorker,
    )

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      num_experts=1, shared_expert=False,
                      use_token_routed_mlp=False)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=32, kv_block_size=4,
                        max_kv_blocks=32, max_prefill_tokens=16,
                        decode_batch_buckets=(2,), prefill_batch_buckets=(2,),
                        prefill_token_buckets=(8, 16))
    coord = DisaggregatedCoordinator(
        PrefillWorker(params, cfg, ecfg), DecodeWorker(params, cfg, ecfg))
    # find the greedy token, then use it as a stop id: only 1 token emitted
    free = coord.generate([1, 2, 3], SamplingParams(
        temperature=0.0, max_tokens=6))
    assert len(free.output_tokens) == 6
    stop_tok = free.output_tokens[1]
    stopped = coord.generate([1, 2, 3], SamplingParams(
        temperature=0.0, max_tokens=6, stop_token_ids=[stop_tok]))
    assert len(stopped.output_tokens) < 6
