"""Logits processors, stop sequences, beam search
(ref: vllm_i64/core/logits_processor.py, core/sampling.py:622-757,
tests/test_sampling.py)."""

import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.logits_processor import (
    ChoiceLogitsProcessor,
    JSONLogitsProcessor,
    OutputConstraints,
    RegexLogitsProcessor,
    StopSequenceProcessor,
    SuppressTokensProcessor,
    apply_logits_processors,
)
from vllm_i64_tpu.core.sampling import BeamSearcher, SamplingParams
from vllm_i64_tpu.core.tokenizer import ByteTokenizer
from vllm_i64_tpu.engine import Engine

V = 300  # covers ByteTokenizer ids


def tok_ids(text: str):
    return ByteTokenizer().encode(text)


# ---------------------------------------------------------------------------
# processors
# ---------------------------------------------------------------------------


def test_json_processor_forces_eos_when_complete():
    tok = ByteTokenizer()
    proc = JSONLogitsProcessor(tokenizer=tok)
    gen = tok_ids('{"a": 1}')
    logits = np.zeros(V, np.float32)
    out = proc(logits.copy(), gen)
    assert proc.is_complete()
    assert np.argmax(out) == tok.eos_token_id
    assert np.all(np.isneginf(np.delete(out, tok.eos_token_id)))


def test_json_processor_ignores_braces_in_strings():
    tok = ByteTokenizer()
    proc = JSONLogitsProcessor(tokenizer=tok)
    gen = tok_ids('{"a": "}"')  # closing brace inside string must not close
    proc(np.zeros(V, np.float32), gen)
    assert not proc.is_complete()


def test_json_processor_incremental_state():
    tok = ByteTokenizer()
    proc = JSONLogitsProcessor(tokenizer=tok)
    gen = []
    for t in tok_ids('{"k": [1, 2]}'):
        gen.append(t)
        proc(np.zeros(V, np.float32), gen)
    assert proc.is_complete()


def test_regex_processor_full_match_boosts_eos():
    tok = ByteTokenizer()
    proc = RegexLogitsProcessor(r"[0-9]+", tokenizer=tok)
    out = proc(np.zeros(V, np.float32), tok_ids("12345"))
    assert proc.is_match()
    assert np.argmax(out) == tok.eos_token_id


def test_regex_processor_broken_prefix_forces_eos():
    tok = ByteTokenizer()
    proc = RegexLogitsProcessor(r"[0-9]+", tokenizer=tok)
    out = proc(np.zeros(V, np.float32), tok_ids("xy"))
    assert np.argmax(out) == tok.eos_token_id
    assert np.all(np.isneginf(np.delete(out, tok.eos_token_id)))


def test_choice_processor_masks_to_trie():
    tok = ByteTokenizer()
    proc = ChoiceLogitsProcessor(["yes", "no"], tokenizer=tok)
    logits = np.zeros(V, np.float32)
    out = proc(logits.copy(), [])
    allowed = {tok_ids("yes")[0], tok_ids("no")[0]}
    finite = set(np.where(np.isfinite(out))[0].tolist())
    assert finite == allowed
    # after choosing 'y', only 'e' continues
    out2 = proc(logits.copy(), [tok_ids("yes")[0]])
    finite2 = set(np.where(np.isfinite(out2))[0].tolist())
    assert finite2 == {tok_ids("yes")[1]}


def test_stop_sequence_processor_index():
    proc = StopSequenceProcessor([[7, 8]])
    assert not proc.check([1, 2, 7])
    assert proc.check([1, 2, 7, 8])
    assert proc.should_stop and proc.stop_index == 2


def test_suppress_first_tokens_only_step0():
    proc = SuppressTokensProcessor([5])
    out0 = proc(np.zeros(V, np.float32), [])
    assert np.isneginf(out0[5])
    out1 = proc(np.zeros(V, np.float32), [3])
    assert out1[5] == 0.0


def test_constraints_build_chain():
    oc = OutputConstraints(json_mode=True, stop_sequences=[[1, 2]],
                           suppress_first_tokens=[3])
    procs = oc.build_processors(tokenizer=ByteTokenizer())
    kinds = [type(p).__name__ for p in procs]
    assert kinds == ["SuppressTokensProcessor", "JSONLogitsProcessor",
                     "StopSequenceProcessor"]
    logits = apply_logits_processors(np.zeros(V, np.float32), procs, [])
    assert np.isneginf(logits[3])


# ---------------------------------------------------------------------------
# engine integration (model-less: random logits, real scheduler)
# ---------------------------------------------------------------------------


def make_engine(**kw):
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=32, **kw)
    return Engine(None, None, ecfg, tokenizer=ByteTokenizer())


def test_engine_stop_sequence_truncation():
    eng = make_engine()
    # force the model-less engine to emit known tokens: logit_bias pushes
    # token 9 always; stop after two 9s
    params = SamplingParams(
        temperature=0.0, max_tokens=10,
        logit_bias={9: 1000.0},
        output_constraints=OutputConstraints(stop_sequences=[[9, 9]]),
    )
    r = eng.generate([1, 2, 3], params)
    assert r.finish_reason == "stop"
    assert r.output_tokens == []  # stop seq [9,9] truncated from the start


def test_engine_stop_token_ids():
    eng = make_engine()
    params = SamplingParams(temperature=0.0, max_tokens=10,
                            logit_bias={9: 1000.0}, stop_token_ids=[9])
    r = eng.generate([1, 2, 3], params)
    assert r.finish_reason == "stop"
    assert r.output_tokens == []


def test_engine_stop_strings_via_tokenizer():
    eng = make_engine()
    tok = ByteTokenizer()
    stop_ids = tok.encode("X")  # single byte token
    params = SamplingParams(temperature=0.0, max_tokens=10,
                            logit_bias={stop_ids[0]: 1000.0}, stop=["X"])
    r = eng.generate([1, 2, 3], params)
    assert r.finish_reason == "stop"
    assert r.output_tokens == []


def test_engine_min_tokens_suppresses_eos():
    eng = make_engine()
    # bias EOS hard; min_tokens must hold it off for 3 tokens
    params = SamplingParams(temperature=0.0, max_tokens=8, min_tokens=3,
                            logit_bias={0: 1000.0})
    r = eng.generate([1, 2, 3], params)
    assert len(r.output_tokens) >= 3


def test_engine_json_mode_completes():
    eng = make_engine()
    tok = ByteTokenizer()
    # choice constraint steers the random engine to emit exactly "{}";
    # the JSON state machine then detects completion and forces EOS
    params = SamplingParams(
        temperature=0.0, max_tokens=10,
        output_constraints=OutputConstraints(json_mode=True, choices=["{}"]),
    )
    r = eng.generate([1, 2, 3], params)
    text = tok.decode(r.output_tokens)
    assert text.startswith("{}")
    assert r.finish_reason == "stop"  # ended on EOS forced by processor


def test_engine_logprobs_returned():
    eng = make_engine()
    params = SamplingParams(temperature=0.0, max_tokens=3, logprobs=2)
    r = eng.generate([1, 2, 3], params)
    assert r.logprobs is not None and len(r.logprobs) == len(r.output_tokens)
    for lp in r.logprobs:
        assert lp.top_logprobs is not None and len(lp.top_logprobs) == 2
        assert lp.logprob <= 0.0


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------


def test_beam_searcher_prefers_high_prob_path():
    bs = BeamSearcher(num_beams=2, max_length=4, eos_token_id=None)
    bs.init_beams([])
    # single live init beam: the first expansion must produce num_beams
    # DISTINCT continuations (the reference's identical-copies init
    # collapsed to n duplicate greedy decodes — fixed here)
    logits = np.full((1, 5), -10.0, np.float32)
    logits[:, 3] = 5.0
    logits[:, 1] = 4.0
    bs.step(logits)
    tokens = {tuple(b.token_ids) for b in bs.beams}
    assert tokens == {(3,), (1,)}
    # second step: each beam extends with its own best continuation
    logits2 = np.full((2, 5), -10.0, np.float32)
    logits2[0, 3] = 5.0
    logits2[1, 1] = 4.0
    # beam order is by score: beams[0] is (3,), beams[1] is (1,)
    assert bs.beams[0].token_ids == [3]
    bs.step(logits2)
    tokens2 = {tuple(b.token_ids) for b in bs.beams}
    assert (3, 3) in tokens2 and (1, 1) in tokens2


def test_beam_search_no_duplicate_beams_and_sane_ranking():
    """Beams stay distinct, and completed hypotheses of different lengths
    compare on a single length normalization of the RAW cumulative
    log-prob (the per-step normalization compounded it)."""
    bs = BeamSearcher(num_beams=3, max_length=6, eos_token_id=0)
    bs.init_beams([9])
    rng = np.random.default_rng(0)
    while not bs.is_done:
        logits = rng.standard_normal((len(bs.beams), 8)).astype(np.float32)
        bs.step(logits)
    live = [b for b in bs.beams if b.token_ids]
    assert len({tuple(b.token_ids) for b in live}) == len(live)
    best = bs.get_best()
    assert best.token_ids[0] == 9
    # raw score is a genuine sum of per-token log-probs: strictly negative
    # for any multi-token continuation of finite-probability tokens
    assert best.score < 0.0


def test_beam_searcher_eos_completes():
    bs = BeamSearcher(num_beams=2, max_length=10, eos_token_id=0)
    bs.init_beams([])
    logits = np.full((2, 5), -10.0, np.float32)
    logits[:, 0] = 10.0  # EOS dominates
    logits[:, 2] = 1.0
    bs.step(logits)
    assert len(bs.completed) >= 1
    best = bs.get_best()
    assert best.token_ids[-1] == 0


def test_engine_generate_beam_modelless():
    eng = make_engine()
    r = eng.generate_beam([1, 2, 3], SamplingParams(num_beams=3, max_tokens=5))
    assert r.finish_reason in ("stop", "length")
    assert len(r.output_tokens) <= 5 + 1


def test_engine_generate_beam_with_model(tiny_config):
    import jax

    from vllm_i64_tpu.models import complexity_deep as cdm

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=32, max_prefill_tokens=32,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(2,), prefill_batch_buckets=(2,),
                        prefill_token_buckets=(16,))
    eng = Engine(params, tiny_config, ecfg)
    r = eng.generate_beam([5, 17, 42], SamplingParams(num_beams=2, max_tokens=4))
    assert 1 <= len(r.output_tokens) <= 5
    assert all(0 <= t < tiny_config.vocab_size for t in r.output_tokens)
