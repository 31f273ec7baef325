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
from typing import Dict, List, Optional, Tuple

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


@functools.partial(jax.jit, static_argnames=("cfg", "k"),
                   donate_argnames=("kv_k", "kv_v"))
def _draft_k_paged(params, cfg: ModelConfig, kv_k, kv_v,
                   delta: jax.Array,  # (1, Td) i32 — new context tokens
                   delta_len: jax.Array,  # () i32 — valid count in delta
                   start: jax.Array,  # () i32 — first delta position
                   block_tables: jax.Array,  # (1, MB) i32
                   k: int):
    """Extend the draft's paged cache by the context delta, then greedy-draft
    k tokens with single-token paged steps (the draft-side analog of the
    engine's multistep decode). Returns ((k,) drafted ids, kv_k, kv_v)."""
    from ..models import complexity_deep as cdm

    td = delta.shape[1]
    offs = jnp.arange(td, dtype=jnp.int32)
    positions = (start + offs)[None]
    valid = (offs < delta_len)[None]
    n_total = start + delta_len
    logits, (kv_k, kv_v) = cdm.forward_step(
        params, cfg, delta, positions, (kv_k, kv_v), block_tables,
        jnp.reshape(n_total, (1,)), jnp.reshape(delta_len - 1, (1,)), valid,
    )
    tok0 = jnp.argmax(logits[0]).astype(jnp.int32)

    def body(carry, i):
        tok, kv_k, kv_v = carry
        pos = n_total + i
        logits, (kv_k, kv_v) = cdm.forward_step(
            params, cfg, tok[None, None], pos[None, None].astype(jnp.int32),
            (kv_k, kv_v), block_tables, jnp.reshape(pos + 1, (1,)),
            jnp.zeros((1,), jnp.int32), jnp.ones((1, 1), bool),
        )
        nxt = jnp.argmax(logits[0]).astype(jnp.int32)
        return (nxt, kv_k, kv_v), nxt

    (_, kv_k, kv_v), rest = jax.lax.scan(
        body, (tok0, kv_k, kv_v), jnp.arange(k - 1, dtype=jnp.int32))
    drafted = jnp.concatenate([tok0[None], rest]) if k > 1 else tok0[None]
    return drafted, kv_k, kv_v


class SpeculativeDecoder:
    """Draft-model speculation (greedy draft; target-faithful acceptance)."""

    def __init__(self, draft_params, draft_cfg: ModelConfig,
                 num_speculative: int = 5, paged: bool = True,
                 max_slots: int = 16, max_seq_len: int = 2048,
                 block_size: int = 16, kv_dtype=None):
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.K = max(1, int(num_speculative))
        self.total_drafted = 0
        self.total_accepted = 0
        self._rng = np.random.default_rng(0)

        # paged draft cache: each slot owns a FIXED stripe of blocks, so no
        # allocator is needed (the draft model is small — the whole cache is
        # a few tens of MB). Per-slot state tracks which context prefix the
        # cache rows were computed from; a divergence (rejected draft) just
        # truncates the valid prefix.
        self.paged = paged
        self.block_size = block_size
        self.blocks_per_slot = -(-(max_seq_len + self.K + 1) // block_size)
        self.max_slots = max_slots
        self._kv = None  # lazy (L, max_slots*blocks_per_slot, bs, Hkv, d) x2
        self._kv_dtype = kv_dtype
        self._slot_by_rid: Dict[int, int] = {}
        self._cached_by_rid: Dict[int, List[int]] = {}
        self._free_slots = list(range(max_slots - 1, -1, -1))

    def _ensure_kv(self):
        if self._kv is None:
            if self._kv_dtype is None:
                # CPU XLA lacks bf16 dot support
                self._kv_dtype = (
                    jnp.float32 if jax.default_backend() == "cpu"
                    else jnp.bfloat16)
            cfg = self.draft_cfg
            # flat pages (L, NB, bs, Hkv*d) — see engine/runner kv_shape
            shape = (cfg.num_hidden_layers,
                     self.max_slots * self.blocks_per_slot, self.block_size,
                     cfg.num_key_value_heads * cfg.head_dim)
            self._kv = (jnp.zeros(shape, self._kv_dtype),
                        jnp.zeros(shape, self._kv_dtype))
        return self._kv

    def release(self, rid: int) -> None:
        """Free a request's draft-cache slot (engine calls this at purge)."""
        slot = self._slot_by_rid.pop(rid, None)
        if slot is not None:
            self._free_slots.append(slot)
        self._cached_by_rid.pop(rid, None)

    # -- drafting --------------------------------------------------------------

    def draft(self, context_ids: np.ndarray,
              rid: Optional[int] = None) -> np.ndarray:
        """Greedy-draft K tokens after context_ids. Returns (K,) i64.

        With ``rid`` and paged mode, only the context delta since the last
        call runs through the draft model (paged cache per request); without
        it, the stateless cache-free path runs the whole context."""
        ids = np.asarray(context_ids, np.int64) % self.draft_cfg.vocab_size
        n = len(ids)
        if self.paged and rid is not None and (
            rid in self._slot_by_rid or self._free_slots
        ) and n + self.K + 1 <= self.blocks_per_slot * self.block_size:
            return self._draft_paged(ids, rid)
        tpad = _bucket(n + self.K)
        buf = np.zeros(tpad, np.int32)
        buf[:n] = ids
        out = _draft_k_greedy(self.draft_params, self.draft_cfg,
                              jnp.asarray(buf), jnp.int32(n), self.K)
        return np.asarray(out, np.int64)

    def _draft_paged(self, ids: np.ndarray, rid: int) -> np.ndarray:
        kv_k, kv_v = self._ensure_kv()
        n = len(ids)
        slot = self._slot_by_rid.get(rid)
        if slot is None:
            slot = self._free_slots.pop()
            self._slot_by_rid[rid] = slot
            self._cached_by_rid[rid] = []
        cached = self._cached_by_rid[rid]
        # longest prefix of the cache still matching this context
        keep = 0
        m = min(len(cached), n)
        while keep < m and cached[keep] == ids[keep]:
            keep += 1
        delta = ids[keep:]
        if len(delta) == 0:
            # context fully cached (e.g. identical retry) — re-run the last
            # token so the program always has >= 1 valid row
            keep = n - 1
            delta = ids[keep:]
        # delta length buckets: decode steps extend by <=K+1 tokens, the
        # first call by the whole prompt
        td = self.K + 1 if len(delta) <= self.K + 1 else _bucket(len(delta))
        buf = np.zeros((1, td), np.int32)
        buf[0, : len(delta)] = delta
        bt = np.arange(slot * self.blocks_per_slot,
                       (slot + 1) * self.blocks_per_slot,
                       dtype=np.int32)[None]
        drafted, kv_k, kv_v = _draft_k_paged(
            self.draft_params, self.draft_cfg, kv_k, kv_v,
            jnp.asarray(buf), jnp.int32(len(delta)), jnp.int32(keep),
            jnp.asarray(bt), self.K,
        )
        self._kv = (kv_k, kv_v)
        drafted = np.asarray(drafted, np.int64)
        # cache now holds the full context + the first K-1 drafted tokens
        self._cached_by_rid[rid] = list(ids) + [int(t) for t in drafted[:-1]]
        return drafted

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
            # speculative sampling with a DETERMINISTIC (greedy) draft:
            # accept d w.p. q(d) under the SAME filtered distribution the
            # sampler uses, and on rejection draw from the residual
            # norm(q with d excluded) — resampling the full distribution
            # would return d again w.p. q(d), biasing output toward the
            # draft (P(d) = q(d) + (1-q(d))q(d) instead of q(d))
            from .sampling import filtered_probs_host

            q = filtered_probs_host(target_logits[i], params,
                                    past_tokens=past_tokens)
            if self._rng.random() < float(q[d]):
                accepted.append(d)
                continue
            resid = q.copy()
            resid[d] = 0.0
            mass = resid.sum()
            if mass <= 0.0:
                accepted.append(int(np.argmax(np.where(
                    np.arange(q.shape[-1]) == d, -np.inf, q))))
            else:
                accepted.append(int(self._rng.choice(
                    q.shape[-1], p=resid / mass)))
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
