"""Speculative decoding: draft K tokens, verify in one target pass.

Token-routed models are ideal draft/verify pairs — routing is deterministic
from token ids, so an accepted draft token's routing was provably correct
(ref: vllm_i64/core/speculative.py).

TPU-native shape discipline:
- the draft loop is a ``lax.fori_loop`` over a FIXED padded buffer (no
  growing shapes, one compiled program per context bucket)
- verification runs through the engine's paged KV cache and writes the
  candidate positions' K/V as it goes; accepted-prefix KV is exact because
  the cache rows were computed from the very tokens that were accepted, and
  the first rejected position is overwritten by the next ordinary decode
  step (same junk-tolerance argument as ref kv_cache decode writes).
- acceptance mirrors the reference: greedy -> exact prefix match + target
  correction; stochastic -> accept with min(1, p_target(draft)), bonus token
  on full acceptance (speculative.py:105-139).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .sampling import SamplingParams, sample_host


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _draft_k_greedy(params, cfg: ModelConfig, buf: jax.Array, n: jax.Array,
                    k: int) -> jax.Array:
    """Greedy-draft k tokens into a padded (Tpad,) buffer holding n valid
    context tokens. Returns the (k,) drafted ids."""
    from ..models import complexity_deep as cdm

    tpad = buf.shape[0]
    positions = jnp.arange(tpad, dtype=jnp.int32)[None]

    def body(i, buf):
        seq_len = jnp.reshape(n + i, (1,)).astype(jnp.int32)
        hidden, _ = cdm.forward_hidden(params, cfg, buf[None],
                                       positions, seq_lens=seq_len)
        # only the predicting position touches the (H, V) lm head —
        # materializing (Tpad, V) fp32 logits per drafted token is ~Tpad x
        # more HBM traffic than the draft forward itself
        h_last = jax.lax.dynamic_index_in_dim(hidden[0], n + i - 1, 0,
                                              keepdims=False)
        logits = cdm.lm_logits(params, cfg, h_last[None])
        tok = jnp.argmax(logits[0]).astype(buf.dtype)
        return jax.lax.dynamic_update_index_in_dim(buf, tok, n + i, 0)

    buf = jax.lax.fori_loop(0, k, body, buf)
    return jax.lax.dynamic_slice(buf, (n,), (k,))


def _bucket(n: int, step: int = 128) -> int:
    return max(step, -(-n // step) * step)


class SpeculativeDecoder:
    """Draft-model speculation (greedy draft; target-faithful acceptance)."""

    def __init__(self, draft_params, draft_cfg: ModelConfig,
                 num_speculative: int = 5):
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.K = max(1, int(num_speculative))
        self.total_drafted = 0
        self.total_accepted = 0
        self._rng = np.random.default_rng(0)

    # -- drafting --------------------------------------------------------------

    def draft(self, context_ids: np.ndarray) -> np.ndarray:
        """Greedy-draft K tokens after context_ids. Returns (K,) i64."""
        n = len(context_ids)
        tpad = _bucket(n + self.K)
        buf = np.zeros(tpad, np.int32)
        buf[:n] = np.asarray(context_ids, np.int64) % self.draft_cfg.vocab_size
        out = _draft_k_greedy(self.draft_params, self.draft_cfg,
                              jnp.asarray(buf), jnp.int32(n), self.K)
        return np.asarray(out, np.int64)

    # -- acceptance ----------------------------------------------------------

    def accept(
        self,
        draft_tokens: np.ndarray,  # (K,)
        target_logits: np.ndarray,  # (K+1, V) f32 — row i predicts pos n+i
        params: Optional[SamplingParams] = None,
        past_tokens: Optional[List[int]] = None,
    ) -> Tuple[List[int], int]:
        """Returns (accepted tokens incl. correction/bonus, num_drafted)."""
        k = len(draft_tokens)
        accepted: List[int] = []
        greedy = params is None or params.temperature == 0.0
        for i in range(k):
            d = int(draft_tokens[i])
            if greedy:
                t = int(np.argmax(target_logits[i]))
                if t == d:
                    accepted.append(d)
                    continue
                accepted.append(t)
                break
            probs = _softmax(target_logits[i] / params.temperature)
            if self._rng.random() < float(probs[d]):
                accepted.append(d)
                continue
            accepted.append(sample_host(target_logits[i], params,
                                        past_tokens=past_tokens,
                                        rng=self._rng))
            break
        else:
            # all drafts accepted -> bonus token from the target's last row
            if greedy:
                accepted.append(int(np.argmax(target_logits[k])))
            else:
                accepted.append(sample_host(target_logits[k], params,
                                            past_tokens=past_tokens,
                                            rng=self._rng))
        self.total_drafted += k
        self.total_accepted += sum(
            1 for i, t in enumerate(accepted[:k])
            if i < k and t == int(draft_tokens[i]))
        return accepted, k

    @property
    def acceptance_rate(self) -> float:
        return (self.total_accepted / self.total_drafted
                if self.total_drafted else 0.0)


def _softmax(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    x = x - x.max()
    e = np.exp(x)
    return e / e.sum()
