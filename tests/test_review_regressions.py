"""Regression tests for the round-1 code-review findings."""

import jax
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.core.scheduler import Scheduler
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


def test_restored_prefill_covers_saved_outputs_across_chunk_boundary():
    """Finding 1: a restore whose re-prefill chunk ends between the prompt
    and the saved outputs must NOT switch to decode early."""
    sched = Scheduler(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                      max_kv_blocks=64, max_prefill_tokens=8)
    rid = sched.add_request(np.arange(6, dtype=np.int64), max_new_tokens=10)
    req = sched.get_request(rid)
    # simulate a preempt/restore with 4 saved output tokens
    req._saved = ([7, 7, 7, 7], 0)
    req.state = sched.get_request(rid).state.__class__.PENDING
    batch = sched.schedule()  # admits + first chunk (8 of 10 tokens)
    seqs = [s for s in batch.seqs if s.request.request_id == rid]
    assert seqs[0].is_prefill and len(seqs[0].token_ids) == 8
    assert not seqs[0].needs_sample
    sched.update_after_step(batch, {})
    # old bug: prefill_done=8 >= prompt(6) looked "complete" and dropped
    # the KV of restored tokens at positions 6..9
    assert not req.prefill_complete
    batch = sched.schedule()
    seqs = [s for s in batch.seqs if s.request.request_id == rid]
    assert seqs[0].is_prefill
    assert seqs[0].positions.tolist() == [8, 9]
    assert seqs[0].needs_sample  # final chunk samples
    # restored content is re-fed, not skipped
    assert seqs[0].token_ids.tolist() == [7, 7]


def test_prefill_groups_split_to_bucket_cap(tiny_config):
    """Finding 2: more concurrent prefills than the largest prefill batch
    bucket must split, not crash."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=6, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=128, max_prefill_tokens=64,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(2, 6),
                        prefill_batch_buckets=(1, 2),  # cap 2 < 6 prefills
                        prefill_token_buckets=(8,), multistep_decode=1)
    eng = Engine(params, tiny_config, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=2)
    rids = [eng.add_request([3 + i, 7, 11], sp) for i in range(6)]
    results = [eng.wait_for(r) for r in rids]
    assert all(len(r.output_tokens) >= 1 for r in results)


def test_slot_pool_survives_preemption(tiny_config):
    """Finding 3: preempted requests must release sampler slots so later
    admissions don't exhaust the pool."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=9,  # tight: forces preemption
                        max_prefill_tokens=32, dtype="float32",
                        kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,), multistep_decode=1,
                        enable_request_merging=False)
    eng = Engine(params, tiny_config, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    low = eng.add_request(list(range(3, 15)), sp, priority=5)
    for _ in range(4):
        eng.step()
    hi1 = eng.add_request(list(range(20, 32)), sp, priority=-5)
    hi2 = eng.add_request(list(range(40, 52)), sp, priority=-5)
    # drive everything to completion — previously IndexError on slot pop
    for rid in (hi1, hi2, low):
        r = eng.wait_for(rid, max_steps=300)
        assert r.finish_reason in ("stop", "length", "kv_oom")
    assert len(eng._free_slots) == 2  # all slots returned


def test_merge_backfills_late_joiner(tiny_config):
    """Finding 5: a secondary merging after the primary generated tokens
    receives the full completion, not a suffix."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=32,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,), multistep_decode=1)
    eng = Engine(params, tiny_config, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    prompt = [5, 17, 42]
    primary = eng.add_request(list(prompt), sp)
    for _ in range(5):
        eng.step()
    n_done = eng.scheduler.get_request(primary).num_generated
    assert n_done >= 2
    secondary = eng.add_request(list(prompt), sp)
    assert secondary != primary
    p_res = eng.wait_for(primary)
    s_res = eng.wait_for(secondary)
    assert s_res.output_tokens == p_res.output_tokens  # full, not suffix


def test_merge_rejected_for_stop_and_min_tokens(tiny_config):
    """Finding 7: requests with their own stop/min_tokens must not merge."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=32,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2, 4),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,), multistep_decode=1)
    eng = Engine(params, tiny_config, ecfg)
    prompt = [5, 17, 42]
    a = eng.add_request(list(prompt), SamplingParams(temperature=0.0,
                                                     max_tokens=6))
    b = eng.add_request(list(prompt), SamplingParams(temperature=0.0,
                                                     max_tokens=6,
                                                     stop_token_ids=[1]))
    c = eng.add_request(list(prompt), SamplingParams(temperature=0.0,
                                                     max_tokens=6,
                                                     min_tokens=3))
    # b and c must be REAL scheduler requests, not merged secondaries
    assert eng.scheduler.get_request(b) is not None
    assert eng.scheduler.get_request(c) is not None
    for rid in (a, b, c):
        eng.wait_for(rid)


def test_state_purged_after_result_consumed(tiny_config):
    """Finding 9: consuming a result drops all per-request bookkeeping."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=32,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,),
                        enable_request_merging=False)
    eng = Engine(params, tiny_config, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=3)
    for i in range(5):
        eng.generate([3 + i, 7, 11], sp)
    assert len(eng.scheduler.finished) == 0
    assert len(eng.scheduler._requests) == 0
    assert len(eng._params_by_rid) == 0
    assert len(eng._slot_by_rid) == 0


def test_capacity_clamped_at_max_seq_len():
    """Finding 6: ensure_capacity never allocates past max_seq_len blocks."""
    sched = Scheduler(max_batch_size=2, max_seq_len=32, kv_block_size=4,
                      max_kv_blocks=64, max_prefill_tokens=32)
    rid = sched.add_request(np.arange(28, dtype=np.int64), max_new_tokens=4)
    sched.schedule()
    req = sched.get_request(rid)
    assert sched.ensure_capacity(req, 100)  # clamped, not rejected
    assert len(req.kv_block_ids) <= 8  # 32 / 4


def test_batch_sizer_never_shrinks_while_requests_wait():
    """Bench finding (gen=256 run): the adaptive sizer shrank max_batch one
    below a saturated 16-request workload; the 16th request starved for its
    neighbors' entire generation while the responsiveness fallback pinned
    multistep at k=1 — a 5x throughput collapse. Shrinking is forbidden
    while anything waits for admission."""
    from vllm_i64_tpu.engine.engine import AdaptiveBatchSizer

    s = AdaptiveBatchSizer(initial=16, window=10)
    for _ in range(5):
        s.record(10, 10_000 / 100)
    # recent throughput collapsed — but requests are pending
    for _ in range(5):
        s.record(10, 10_000 / 50)
        assert s.adjust(allow_shrink=False) == 16
    # with nobody waiting, the downward exploration is allowed again
    assert s.adjust(allow_shrink=True) == 15


def test_multistep_window_capped_not_collapsed_when_pending(tiny_config):
    """When a pending request CANNOT be admitted (slots full), the window
    must stay at the mixed cap, not collapse to 1 for the blocked request's
    whole wait."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=32,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,),
                        multistep_decode=8, multistep_mixed=4,
                        enable_request_merging=False)
    eng = Engine(params, tiny_config, ecfg)
    sp = SamplingParams(temperature=0.0, max_tokens=16)
    rids = [eng.add_request([3 + i, 7, 11], sp) for i in range(3)]
    # steps until the two admitted rows are decoding and the third pends
    for _ in range(3):
        eng.step()
    assert eng.scheduler.num_pending == 1
    batch = eng.scheduler.schedule()
    assert batch is not None
    assert eng._multistep_window(batch) == 4  # capped, not 1
    for r in rids:
        assert len(eng.wait_for(r).output_tokens) >= 1


def test_batch_sizer_floor_is_decode_bucket():
    """Shrinking max_batch_size below the largest compiled decode bucket
    cannot reduce step cost (the batch pads to the same program) — it only
    pins waiting requests out of the batch. Observed on v5e HTTP serving:
    noisy remote step timings drove the sizer from 64 toward 1, collapsing
    a saturated continuous batch to ~1 token/step."""
    import jax

    from vllm_i64_tpu.config import EngineConfig, ModelConfig
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm

    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=2, max_position_embeddings=128,
                      num_experts=4, top_k=2, shared_expert=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(params, cfg, EngineConfig(
        max_batch_size=64, max_seq_len=64, kv_block_size=16,
        max_kv_blocks=32, decode_batch_buckets=(16, 64),
        prefill_batch_buckets=(1,), prefill_token_buckets=(16,)))
    assert eng.batch_sizer.min_size == 64  # largest bucket <= max

    eng2 = Engine(params, cfg, EngineConfig(
        max_batch_size=48, max_seq_len=64, kv_block_size=16,
        max_kv_blocks=32, decode_batch_buckets=(16, 64),
        prefill_batch_buckets=(1,), prefill_token_buckets=(16,)))
    # max 48 pads to the 64-bucket; shrinking to the 16 boundary is the
    # only shrink that changes the program
    assert eng2.batch_sizer.min_size == 16

    # the sizer itself can never cross below its floor
    s = eng.batch_sizer
    for _ in range(s.window):
        s.record(1, 1000.0)
    for _ in range(50):
        s.record(1, 10000.0)  # collapsing throughput
        s.adjust(allow_shrink=True)
    assert s.current >= 64


def test_suppress_first_tokens_returns_to_device_path_after_token0():
    """The HTTP server attaches suppress-first-tokens (bare-space masking)
    to EVERY completion. The processor is inert after token 0; it must not
    condemn the request to host-sampled single-token steps for its whole
    lifetime (measured on v5e: HTTP throughput collapsed to ~1 token/
    request/step — 30 tok/s vs the engine's 5k+)."""
    import jax

    from vllm_i64_tpu.config import EngineConfig, ModelConfig
    from vllm_i64_tpu.core.logits_processor import OutputConstraints
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm

    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=2, max_position_embeddings=128,
                      num_experts=4, top_k=2, shared_expert=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(params, cfg, EngineConfig(
        max_batch_size=4, max_seq_len=64, kv_block_size=8,
        max_kv_blocks=40, max_prefill_tokens=32,
        decode_batch_buckets=(4,), prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(16,), multistep_decode=8))
    # multi-id suppression: the one form that still builds a host
    # processor chain (single-id rides the device sampler's suppress_step0)
    sp = SamplingParams(
        temperature=0.0, max_tokens=16, min_tokens=16,
        output_constraints=OutputConstraints(suppress_first_tokens=[7, 9]))
    rids = [eng.add_request(list(range(3 + i, 19 + i)), sp)
            for i in range(4)]
    # admission built a live processor chain -> host path for token 0
    assert all(eng._needs_host(sp, r) for r in rids)
    guard = 0
    while eng.scheduler.has_work and guard < 200:
        eng.step()
        guard += 1
    outs = [eng.scheduler.get_request(r).output_token_ids for r in rids]
    assert all(len(o) == 16 for o in outs)
    # the first token respected the suppression...
    assert all(o[0] != 7 for o in outs)
    # ...and the spent processors were pruned: requests rode the fused
    # multistep windows (device path), not 16 single host-sampled steps
    mix = eng.get_stats()["step_mix"]
    assert mix["window_tokens"] + mix["window_k_sum"] > 0
    assert mix["fb_host"] == 0 or mix["window_tokens"] > 0
    assert eng.total_steps < 16  # windows, not one step per token
    for r in rids:
        assert not eng._needs_host(sp, r)
