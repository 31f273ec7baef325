"""Sampling: SamplingParams + vectorized on-device batch sampler.

Semantics mirror the reference exactly (ref: vllm_i64/core/sampling.py):
order of operations in sample_batch (:401-464) is
  repetition penalty -> frequency/presence penalties -> logit bias ->
  (temperature==0 -> argmax) -> temperature -> top-k -> min-p -> typical-p ->
  top-p -> multinomial.
Penalty semantics (:240-287, :358-390): repetition divides positive /
multiplies negative logits of every token in the request's prompt+output
history; frequency/presence subtract count- and presence-proportional terms.

TPU-native design: sampling runs ON DEVICE, fully vectorized over the batch
with per-row parameter arrays — logits never travel to the host on the fast
path. Token history lives as a per-slot (vocab,) count matrix updated by a
scatter-add each step; multinomial is the Gumbel-max trick (argmax of
log-softmax + Gumbel noise), with a per-row PRNG key folded from
(seed, generation index) so seeded requests reproduce independently of batch
composition. Filters are compiled in/out via static feature flags so the
greedy path is a single argmax with zero sorts.

Host-side numpy mirrors (sample_host) serve the complex path (logprobs,
logits processors, logit_bias) and tests.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")


@dataclass
class SamplingParams:
    """Per-request sampling parameters (ref: core/sampling.py:38-72)."""

    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 1.0
    min_p: float = 0.0
    typical_p: float = 1.0
    repetition_penalty: float = 1.0
    max_tokens: int = 256
    min_tokens: int = 0

    num_beams: int = 1
    length_penalty: float = 1.0

    json_mode: bool = False
    stop_token_ids: Optional[List[int]] = None
    stop: Optional[List[str]] = None

    logprobs: Optional[int] = None
    output_constraints: Optional[object] = None
    seed: Optional[int] = None
    logit_bias: Optional[Dict[int, float]] = None

    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0

    @property
    def needs_host_sampling(self) -> bool:
        """Rows that must sample on host (rare path)."""
        return (
            self.logprobs is not None
            or self.logit_bias is not None
            or self.output_constraints is not None
            or self.json_mode
            or self.num_beams > 1
        )

    @property
    def needs_token_history(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.frequency_penalty != 0.0
            or self.presence_penalty != 0.0
        )


@dataclass
class TokenLogprob:
    token_id: int
    logprob: float
    top_logprobs: Optional[Dict[int, float]] = None


# ---------------------------------------------------------------------------
# Device sampler
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SamplerFeatures:
    """Static flags: which filters are compiled into the sampler program."""

    penalties: bool = False
    top_k: bool = False
    top_p: bool = False
    min_p: bool = False
    typical_p: bool = False
    min_tokens: bool = False
    # every row greedy: the compiled program is argmax-only — no Gumbel
    # noise (B*V threefry draws), no log_softmax. Identical outputs (the
    # generic program's final where() picks greedy_choice for greedy rows);
    # measured as most of the 0.7 ms/iter decode sampler cost at B=64,
    # V=32k on v5e.
    all_greedy: bool = False

    @staticmethod
    def for_params(params_list) -> "SamplerFeatures":
        """Program-family key for a batch's SamplingParams.

        Two deliberate collapses keep the warmup program space bounded
        (each distinct SamplerFeatures is a full program family across
        every batch/token/block bucket — axes multiply):

        - min_tokens is ALWAYS compiled in: the eos-suppress mask is a
          value-driven (B,) bool whose False rows no-op exactly, so a
          static on/off axis bought nothing but programs (same pattern
          as the -1-masked suppress_step0 input).
        - the four sampled filters (top_k/top_p/min_p/typical_p) merge
          into ONE family whenever any is active: every filter has an
          exact neutral-value no-op guard (top_k<=0 keeps all, p==1 /
          min_p==0 mask nothing), so the merged program is bit-identical
          per row. Greedy batches keep the argmax-only specialization.
        """
        any_filter = any(
            not p.is_greedy and (
                0 < p.top_k or p.top_p < 1.0 or p.min_p > 0.0
                or p.typical_p < 1.0
            )
            for p in params_list
        )
        return SamplerFeatures(
            penalties=any(p.needs_token_history for p in params_list),
            top_k=any_filter,
            top_p=any_filter,
            min_p=any_filter,
            typical_p=any_filter,
            min_tokens=True,
            all_greedy=all(p.is_greedy for p in params_list),
        )


def _apply_penalties(logits, counts, rep_pen, freq_pen, pres_pen):
    """counts: (B, V) i32 occurrence counts over prompt+output history."""
    present = counts > 0
    rep = rep_pen[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(present, penalized, logits)
    logits = logits - jnp.where(
        present,
        freq_pen[:, None] * counts.astype(logits.dtype)
        + pres_pen[:, None],
        0.0,
    )
    return logits


def _apply_top_k(logits, top_k):
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k = jnp.clip(jnp.where(top_k <= 0, v, top_k), 1, v)
    thr = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    return jnp.where(logits < thr, NEG_INF, logits)


def _apply_min_p(logits, min_p):
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    mask = probs < top * min_p[:, None]
    active = (min_p > 0.0)[:, None]
    return jnp.where(mask & active, NEG_INF, logits)


def _apply_typical_p(logits, typical_p):
    """ref apply_typical_p (:169-209)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    neg_entropy = jnp.sum(
        jnp.where(probs > 0, probs * log_probs, 0.0), axis=-1, keepdims=True
    )
    deviation = jnp.abs(log_probs + neg_entropy)
    order = jnp.argsort(deviation, axis=-1)  # most typical first
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    mask_sorted = (cum - sorted_probs) > typical_p[:, None]
    inv = jnp.argsort(order, axis=-1)
    mask = jnp.take_along_axis(mask_sorted, inv, axis=-1)
    active = (typical_p < 1.0)[:, None]
    return jnp.where(mask & active, NEG_INF, logits)


def _apply_top_p(logits, top_p):
    order = jnp.argsort(logits, axis=-1)[:, ::-1]  # descending
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    mask_sorted = (cum - probs) > top_p[:, None]
    inv = jnp.argsort(order, axis=-1)
    mask = jnp.take_along_axis(mask_sorted, inv, axis=-1)
    active = (top_p < 1.0)[:, None]
    return jnp.where(mask & active, NEG_INF, logits)


@functools.partial(jax.jit, static_argnames=("features",))
def sample_tokens(
    logits: jax.Array,  # (B, V) f32
    *,
    features: SamplerFeatures,
    key: jax.Array,  # base PRNG key
    temperature: jax.Array,  # (B,) f32; 0 = greedy
    top_k: jax.Array,  # (B,) i32
    top_p: jax.Array,  # (B,) f32
    min_p: jax.Array,  # (B,) f32
    typical_p: jax.Array,  # (B,) f32
    rep_pen: jax.Array,  # (B,) f32
    freq_pen: jax.Array,  # (B,) f32
    pres_pen: jax.Array,  # (B,) f32
    seeds: jax.Array,  # (B,) i32 — request seed or request_id
    gen_index: jax.Array,  # (B,) i32 — tokens generated so far
    counts: Optional[jax.Array] = None,  # (B, V) i32 history counts
    eos_suppress: Optional[jax.Array] = None,  # (B,) bool
    eos_ids: Optional[jax.Array] = None,  # (B,) i32
    min_tokens: Optional[jax.Array] = None,  # (B,) i32 (used by multistep)
    suppress_step0: Optional[jax.Array] = None,  # (B,) i32; -1 = none
) -> jax.Array:
    """Vectorized batch sampling. Returns (B,) i32 token ids."""
    logits = logits.astype(jnp.float32)
    b, v = logits.shape

    if features.penalties:
        logits = _apply_penalties(logits, counts, rep_pen, freq_pen, pres_pen)

    if suppress_step0 is not None:
        # single-token step-0 suppression ON DEVICE (the server's bare-space
        # masking, ref: logits_processor.py:291-309). Value-driven (-1 rows
        # no-op), always compiled in: a host SuppressTokensProcessor forced
        # EVERY completion's first token onto the return_logits=True host
        # path — a B*V f32 readback + an extra program family per bucket.
        row = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
        hit = (gen_index == 0) & (suppress_step0 >= 0)
        logits = jnp.where(
            hit[:, None] & (row == suppress_step0[:, None]), NEG_INF, logits
        )

    if features.min_tokens:
        row = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
        is_eos = row == eos_ids[:, None]
        logits = jnp.where(is_eos & eos_suppress[:, None], NEG_INF, logits)

    greedy_choice = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if features.all_greedy:
        return greedy_choice

    is_greedy = temperature <= 0.0
    safe_temp = jnp.where(is_greedy, 1.0, temperature)
    scaled = logits / safe_temp[:, None]

    if features.top_k:
        scaled = _apply_top_k(scaled, top_k)
    if features.min_p:
        scaled = _apply_min_p(scaled, min_p)
    if features.typical_p:
        scaled = _apply_typical_p(scaled, typical_p)
    if features.top_p:
        scaled = _apply_top_p(scaled, top_p)

    # Gumbel-max multinomial with per-row deterministic keys:
    # key_i = fold(fold(base, seed_i), gen_index_i)
    def row_noise(seed, gi):
        k = jax.random.fold_in(jax.random.fold_in(key, seed), gi)
        return jax.random.gumbel(k, (v,), jnp.float32)

    noise = jax.vmap(row_noise)(seeds, gen_index)
    log_probs = jax.nn.log_softmax(scaled, axis=-1)
    sampled = jnp.argmax(log_probs + noise, axis=-1).astype(jnp.int32)

    return jnp.where(is_greedy, greedy_choice, sampled)


@jax.jit
def update_token_counts(
    counts: jax.Array,  # (S, V) i32
    slot_ids: jax.Array,  # (B,) i32
    tokens: jax.Array,  # (B,) i32
) -> jax.Array:
    """Scatter-add sampled tokens into per-slot history counts."""
    return counts.at[slot_ids, tokens].add(1, mode="drop")


# fresh entropy for unseeded rows — drawn per dispatch so unseeded sampling
# is non-deterministic while the device-side base key stays FIXED (explicit
# seeds must reproduce regardless of batch composition or dispatch count,
# matching the reference's per-request torch.Generator semantics,
# ref: sampling.py:393-398)
_UNSEEDED_RNG = np.random.default_rng()


def make_param_arrays(params_list: List[SamplingParams], requests) -> dict:
    """Host-side: pack per-row parameter vectors for sample_tokens.

    ``requests``: matching list with .request_id / .num_generated /
    .max_new_tokens / .eos_token_id attributes (scheduler Requests).
    """
    b = len(params_list)
    out = dict(
        temperature=np.zeros(b, np.float32),
        top_k=np.zeros(b, np.int32),
        top_p=np.ones(b, np.float32),
        min_p=np.zeros(b, np.float32),
        typical_p=np.ones(b, np.float32),
        rep_pen=np.ones(b, np.float32),
        freq_pen=np.zeros(b, np.float32),
        pres_pen=np.zeros(b, np.float32),
        seeds=np.zeros(b, np.int32),
        gen_index=np.zeros(b, np.int32),
        eos_suppress=np.zeros(b, bool),
        eos_ids=np.zeros(b, np.int32),
        min_tokens=np.zeros(b, np.int32),
        suppress_step0=np.full(b, -1, np.int32),
    )
    for i, (p, req) in enumerate(zip(params_list, requests)):
        out["temperature"][i] = p.temperature
        out["top_k"][i] = p.top_k
        out["top_p"][i] = p.top_p
        out["min_p"][i] = p.min_p
        out["typical_p"][i] = p.typical_p
        out["rep_pen"][i] = p.repetition_penalty
        out["freq_pen"][i] = p.frequency_penalty
        out["pres_pen"][i] = p.presence_penalty
        # fold arbitrary user seeds into int32 deterministically — a raw
        # assignment of seed >= 2**31 raises OverflowError inside the step,
        # failing every in-flight request from one malformed request
        out["seeds"][i] = (
            int(p.seed) & 0x7FFFFFFF if p.seed is not None
            else int(_UNSEEDED_RNG.integers(0, 2**31 - 1))
        )
        out["gen_index"][i] = req.num_generated
        out["eos_suppress"][i] = p.min_tokens > 0 and req.num_generated < p.min_tokens
        out["eos_ids"][i] = req.eos_token_id
        out["min_tokens"][i] = p.min_tokens
        oc = p.output_constraints
        if (oc is not None and oc.suppress_first_tokens
                and len(oc.suppress_first_tokens) == 1):
            # single-id step-0 suppression rides the device sampler; multi-id
            # lists stay on the host processor path (engine keeps the
            # SuppressTokensProcessor for those)
            out["suppress_step0"][i] = int(oc.suppress_first_tokens[0])
    return out


# ---------------------------------------------------------------------------
# Host (numpy) mirror — complex path + logprobs + tests
# ---------------------------------------------------------------------------


def _np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def apply_penalties_host(
    logits: np.ndarray,  # (V,)
    past_tokens: List[int],
    rep: float,
    freq: float,
    pres: float,
) -> np.ndarray:
    v = logits.shape[-1]
    past = np.asarray(past_tokens, dtype=np.int64)
    past = past[(past >= 0) & (past < v)]
    if past.size == 0:
        return logits
    uniq, cnt = np.unique(past, return_counts=True)
    if rep != 1.0:
        s = logits[uniq]
        logits[uniq] = np.where(s > 0, s / rep, s * rep)
    if freq != 0.0 or pres != 0.0:
        logits[uniq] -= freq * cnt.astype(logits.dtype) + pres
    return logits


def filtered_probs_host(
    logits: np.ndarray,  # (V,) f32
    params: SamplingParams,
    past_tokens: Optional[List[int]] = None,
) -> np.ndarray:
    """The exact post-filter distribution sample_host draws from.

    Exposed so speculative decoding's acceptance test and rejection
    correction use the SAME distribution as the final sampler — acceptance
    from an unfiltered softmax while correcting from the filtered one
    biases outputs toward the draft model."""
    logits = np.asarray(logits, dtype=np.float64).copy()
    v = logits.shape[-1]

    if params.needs_token_history and past_tokens:
        apply_penalties_host(
            logits,
            past_tokens,
            params.repetition_penalty,
            params.frequency_penalty,
            params.presence_penalty,
        )
    if params.logit_bias:
        for tid, bias in params.logit_bias.items():
            if 0 <= int(tid) < v:
                logits[int(tid)] += bias

    if params.temperature == 0.0:
        probs = np.zeros(v, np.float64)
        probs[int(np.argmax(logits))] = 1.0
        return probs

    if params.temperature != 1.0:
        logits = logits / params.temperature

    if 0 < params.top_k < v:
        thr = np.partition(logits, -params.top_k)[-params.top_k]
        logits[logits < thr] = NEG_INF
    if params.min_p > 0.0:
        probs = _np_softmax(logits)
        logits[probs < probs.max() * params.min_p] = NEG_INF
    if params.typical_p < 1.0:
        lp = logits - logits.max()
        lp = lp - np.log(np.exp(lp).sum())
        probs = np.exp(lp)
        neg_ent = (probs * np.where(probs > 0, lp, 0.0)).sum()
        dev = np.abs(lp + neg_ent)
        order = np.argsort(dev)
        cum = np.cumsum(probs[order])
        mask_sorted = (cum - probs[order]) > params.typical_p
        mask = np.empty(v, bool)
        mask[order] = mask_sorted
        logits[mask] = NEG_INF
    if params.top_p < 1.0:
        order = np.argsort(-logits)
        probs = _np_softmax(logits[order])
        cum = np.cumsum(probs)
        mask_sorted = (cum - probs) > params.top_p
        mask = np.empty(v, bool)
        mask[order] = mask_sorted
        logits[mask] = NEG_INF

    probs = _np_softmax(logits)
    if not np.isfinite(probs).all() or probs.sum() <= 0:
        out = np.zeros(v, np.float64)
        out[int(np.argmax(logits))] = 1.0
        return out
    return probs


def sample_host(
    logits: np.ndarray,  # (V,) f32
    params: SamplingParams,
    past_tokens: Optional[List[int]] = None,
    rng: Optional[np.random.Generator] = None,
) -> int:
    """Single-row host sampler with identical semantics (complex path)."""
    probs = filtered_probs_host(logits, params, past_tokens=past_tokens)
    if probs.max() >= 1.0:  # deterministic (greedy / degenerate): no rng
        return int(np.argmax(probs))
    if rng is None:
        rng = (
            np.random.default_rng(params.seed)
            if params.seed is not None
            else np.random.default_rng()
        )
    return int(rng.choice(probs.shape[-1], p=probs))


# ---------------------------------------------------------------------------
# Beam search (ref: core/sampling.py:622-757)
# ---------------------------------------------------------------------------


@dataclass
class BeamHypothesis:
    """Integer token sequence + float log-prob score.

    ``score`` is the RAW cumulative log-prob — applying the GNMT length
    normalization to the running score would compound it every step
    (score_L = ((lp1/f1 + lp2)/f2 + ...) instead of (sum lp)/f_L).
    ``norm_score`` is the length-normalized value, set when the hypothesis
    completes (or computed on demand for live beams in get_best).
    """

    token_ids: List[int]
    score: float
    is_finished: bool = False
    norm_score: Optional[float] = None


class BeamSearcher:
    """Beam search over per-beam logits. Deterministic i64 routing makes
    beams cheap: routing is fixed per token, so beams differ only in token
    choice (ref: core/sampling.py:630-757)."""

    def __init__(
        self,
        num_beams: int = 4,
        max_length: int = 256,
        length_penalty: float = 1.0,
        eos_token_id: Optional[int] = None,
    ):
        self.num_beams = num_beams
        self.max_length = max_length
        self.length_penalty = length_penalty
        self.eos_token_id = eos_token_id
        self.beams: List[BeamHypothesis] = []
        self.completed: List[BeamHypothesis] = []

    def init_beams(self, initial_token_ids: Optional[List[int]] = None):
        prefix = list(initial_token_ids or [])
        # ONE live beam: num_beams identical zero-score copies would each
        # contribute identical candidate rows, so every beam would pick the
        # same top token forever and the search collapses to n duplicate
        # greedy decodes. The first step() expands this beam into
        # num_beams DISTINCT continuations.
        self.beams = [BeamHypothesis(list(prefix), 0.0)]
        self.completed = []

    def step(self, logits_per_beam: np.ndarray) -> List[List[int]]:
        """One expansion step. logits_per_beam: (num_beams, V) f32."""
        logits = np.asarray(logits_per_beam, np.float64)
        v = logits.shape[-1]
        lp = logits - logits.max(axis=-1, keepdims=True)
        lp = lp - np.log(np.exp(lp).sum(axis=-1, keepdims=True))

        scores, tokens, beam_idx = [], [], []
        for bi, beam in enumerate(self.beams):
            if beam.is_finished:
                continue
            scores.append(beam.score + lp[bi])
            tokens.append(np.arange(v, dtype=np.int64))
            beam_idx.extend([bi] * v)
        if not scores:
            return [b.token_ids for b in self.beams]

        all_scores = np.concatenate(scores)
        all_tokens = np.concatenate(tokens)
        k = min(2 * self.num_beams, all_scores.shape[0])
        top = np.argsort(-all_scores)[:k]

        new_beams: List[BeamHypothesis] = []
        for idx in top:
            if len(new_beams) >= self.num_beams:
                break
            score = float(all_scores[idx])  # raw cumulative log-prob
            token_id = int(all_tokens[idx])
            bi = beam_idx[int(idx)]
            new_ids = self.beams[bi].token_ids + [token_id]
            hyp = BeamHypothesis(new_ids, score)
            if (self.eos_token_id is not None
                    and token_id == self.eos_token_id) \
                    or len(new_ids) >= self.max_length:
                hyp.is_finished = True
                hyp.norm_score = score / self._length_factor(len(new_ids))
                self.completed.append(hyp)
                continue
            new_beams.append(hyp)
        while len(new_beams) < self.num_beams:
            new_beams.append(BeamHypothesis([], NEG_INF, is_finished=True))
        self.beams = new_beams
        return [b.token_ids for b in self.beams]

    def _length_factor(self, length: int) -> float:
        return ((5.0 + length) / 6.0) ** self.length_penalty

    @property
    def is_done(self) -> bool:
        return all(b.is_finished for b in self.beams)

    def get_best(self) -> BeamHypothesis:
        candidates = self.completed + [b for b in self.beams if not b.is_finished]
        if not candidates:
            candidates = self.beams

        def norm(h: BeamHypothesis) -> float:
            if h.norm_score is not None:
                return h.norm_score
            return h.score / self._length_factor(max(len(h.token_ids), 1))

        return max(candidates, key=norm)


def compute_logprobs_host(
    logits: np.ndarray,  # (V,)
    token_id: int,
    top_n: Optional[int],
) -> TokenLogprob:
    """OpenAI-style logprobs computed on PRE-filter logits
    (ref: sample_batch_with_logprobs :467-569)."""
    lp = np.asarray(logits, np.float64)
    lp = lp - lp.max()
    lp = lp - np.log(np.exp(lp).sum())
    top = None
    if top_n:
        idx = np.argsort(-lp)[:top_n]
        top = {int(i): float(lp[i]) for i in idx}
    return TokenLogprob(token_id=int(token_id), logprob=float(lp[token_id]), top_logprobs=top)
