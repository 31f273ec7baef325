"""Deferred-KV multistep decode (runner windowed side buffers +
ops/attention.paged_attention_window/merge_window_kv) must be equivalent to
the write-then-read per-layer path it replaces.

The write-then-read ordering being matched is the reference's
model.py:203-236 (write current token's KV, then attend over the cache);
here the window's tokens attend in-band and the cache merge is batched to
once per multistep window.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vllm_i64_tpu import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.ops.attention import merge_window_kv


CFG = ModelConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
    max_position_embeddings=128, num_experts=4, top_k=2, shared_expert=True,
)

ECFG_KW = dict(
    max_batch_size=4, max_seq_len=64, kv_block_size=4, max_kv_blocks=64,
    max_prefill_tokens=32, decode_batch_buckets=(1, 2, 4),
    prefill_batch_buckets=(1, 2, 4), prefill_token_buckets=(8, 16, 32),
)


def _engines(**extra):
    params = cdm.init_params(CFG, jax.random.PRNGKey(0))
    kw = dict(ECFG_KW, **extra)
    return (
        Engine(params, CFG, EngineConfig(deferred_kv_decode=False, **kw)),
        Engine(params, CFG, EngineConfig(deferred_kv_decode=True, **kw)),
    )


def test_greedy_and_seeded_equivalence():
    off, on = _engines(multistep_decode=4, decode_chaining=True)
    prompts = [[5, 17, 42, 7], [9, 9, 1], [100, 101, 102, 103, 104]]
    for sp in (SamplingParams(temperature=0.0, max_tokens=17),
               SamplingParams(temperature=0.8, seed=11, max_tokens=13)):
        for p in prompts:
            assert (off.generate(p, sp).output_tokens
                    == on.generate(p, sp).output_tokens)


def test_rows_finish_mid_window():
    """max_tokens not a multiple of the window freezes rows mid-window; the
    merge must drop frozen entries (steps_taken) and later requests must
    read a correct cache."""
    off, on = _engines(multistep_decode=8, decode_chaining=True)
    for eng in (off, on):
        rids = [
            eng.add_request([5, 6, 7], SamplingParams(temperature=0.0, max_tokens=3)),
            eng.add_request([8, 9], SamplingParams(temperature=0.0, max_tokens=11)),
            eng.add_request([1, 2, 3, 4], SamplingParams(temperature=0.0, max_tokens=6)),
        ]
        eng._res = [eng.wait_for(r).output_tokens for r in rids]
    assert off._res == on._res
    # cache state stays consistent: a follow-up request still decodes right
    sp = SamplingParams(temperature=0.0, max_tokens=9)
    assert (off.generate([44, 45, 46], sp).output_tokens
            == on.generate([44, 45, 46], sp).output_tokens)


def test_window_forward_matches_stepwise_cache_writes():
    """Unit-level: N iterations of forward_step_window + one merge produce
    the same logits stream AND the same final cache as N write-then-read
    forward_step calls."""
    params = cdm.init_params(CFG, jax.random.PRNGKey(1))
    L, NB, BS = CFG.num_hidden_layers, 16, 4
    B, K, CTX0 = 2, 5, 6
    hkv, d = CFG.num_key_value_heads, CFG.head_dim
    mb = 8
    bt = jnp.asarray(
        np.arange(B * mb, dtype=np.int32).reshape(B, mb) % (NB - 1) + 1)

    # seed the cache with a shared prefill via the standard path
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 256, (B, CTX0)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(CTX0, dtype=jnp.int32), (B, CTX0))
    kv = (jnp.zeros((L, NB, BS, hkv * d), jnp.float32),
          jnp.zeros((L, NB, BS, hkv * d), jnp.float32))
    logits, kv = cdm.forward_step(
        params, CFG, prompt, pos, kv, bt,
        jnp.full((B,), CTX0, jnp.int32),
        jnp.full((B,), CTX0 - 1, jnp.int32), jnp.ones((B, CTX0), bool))
    tok0 = jnp.argmax(logits, -1).astype(jnp.int32)

    # path A: stepwise write-then-read
    kva = kv
    toks_a, t = [], tok0
    for i in range(K):
        p = jnp.full((B, 1), CTX0 + i, jnp.int32)
        lg, kva = cdm.forward_step(
            params, CFG, t[:, None], p, kva, bt,
            jnp.full((B,), CTX0 + i + 1, jnp.int32),
            jnp.zeros((B,), jnp.int32), jnp.ones((B, 1), bool))
        t = jnp.argmax(lg, -1).astype(jnp.int32)
        toks_a.append(np.asarray(t))

    # path B: deferred window + single merge
    win_k = jnp.zeros((L, B, K, hkv * d), jnp.float32)
    win_v = jnp.zeros_like(win_k)
    toks_b, t = [], tok0
    for i in range(K):
        p = jnp.full((B, 1), CTX0 + i, jnp.int32)
        lg, win_k, win_v = cdm.forward_step_window(
            params, CFG, t[:, None], p, kv, bt,
            jnp.full((B,), CTX0, jnp.int32), win_k, win_v,
            jnp.int32(i))
        t = jnp.argmax(lg, -1).astype(jnp.int32)
        toks_b.append(np.asarray(t))
    kvb = merge_window_kv(
        kv[0], kv[1], win_k, win_v, bt,
        jnp.full((B,), CTX0, jnp.int32), jnp.full((B,), K, jnp.int32))

    assert all((a == b).all() for a, b in zip(toks_a, toks_b))
    np.testing.assert_allclose(
        np.asarray(kva[0]), np.asarray(kvb[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kva[1]), np.asarray(kvb[1]), atol=1e-5, rtol=1e-5)


def test_partial_merge_respects_steps_taken():
    """Entries past a row's active steps must NOT land in the cache."""
    L, NB, BS, hkv, d = 1, 8, 4, 2, 8
    B, K = 2, 4
    kv_k = jnp.zeros((L, NB, BS, hkv * d), jnp.float32)
    kv_v = jnp.zeros_like(kv_k)
    bt = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    win_k = jnp.ones((L, B, K, hkv * d), jnp.float32)
    win_v = 2 * jnp.ones_like(win_k)
    ctx0 = jnp.array([0, 2], jnp.int32)
    steps = jnp.array([3, 0], jnp.int32)  # row1 wholly inactive
    mk, mv = merge_window_kv(kv_k, kv_v, win_k, win_v, bt, ctx0, steps)
    mk = np.asarray(mk)
    # row0: positions 0..2 -> block 1 slots 0..2 written; slot 3 untouched
    assert (mk[0, 1, :3] == 1).all() and (mk[0, 1, 3] == 0).all()
    # row1: nothing written
    assert (mk[0, 3] == 0).all() and (mk[0, 4] == 0).all()


def test_merge_sub_slab_exactness_and_history_preservation():
    """Sub-slab merge (round 4): with production-shaped 128-row blocks the
    merge must land windows at fine granularity without disturbing history
    rows in the touched slab, across sub-slab AND block boundaries, for
    every sub_rows choice."""
    import pytest as _pytest

    L, NB, BS, hkv, d = 2, 6, 128, 2, 8
    B, K = 3, 16
    rng = np.random.default_rng(7)
    hist_k = jnp.asarray(rng.standard_normal((L, NB, BS, hkv * d)), jnp.float32)
    hist_v = jnp.asarray(rng.standard_normal((L, NB, BS, hkv * d)), jnp.float32)
    bt = jnp.asarray([[1, 2], [3, 4], [5, 0]], jnp.int32)
    win_k = jnp.asarray(rng.standard_normal((L, B, K, hkv * d)), jnp.float32)
    win_v = jnp.asarray(rng.standard_normal((L, B, K, hkv * d)), jnp.float32)
    # row0 mid-slab; row1 crosses a sub-slab boundary; row2 crosses the
    # BLOCK boundary (124 + 16 > 128)
    ctx0 = jnp.asarray([5, 30, 124], jnp.int32)
    steps = jnp.asarray([16, 7, 16], jnp.int32)

    def expected():
        k = np.array(hist_k)
        v = np.array(hist_v)
        for b in range(B):
            for j in range(int(steps[b])):
                pos = int(ctx0[b]) + j
                blk = int(bt[b, pos // BS])
                k[:, blk, pos % BS] = np.array(win_k[:, b, j])
                v[:, blk, pos % BS] = np.array(win_v[:, b, j])
        return k, v

    want_k, want_v = expected()
    for sub in (None, 8, 16, 32, 128):
        got_k, got_v = merge_window_kv(
            hist_k, hist_v, win_k, win_v, bt, ctx0, steps, sub_rows=sub)
        got_k, got_v = np.asarray(got_k), np.asarray(got_v)
        # the window rows landed exactly
        for b in range(B):
            for j in range(int(steps[b])):
                pos = int(ctx0[b]) + j
                blk = int(bt[b, pos // BS])
                np.testing.assert_array_equal(
                    got_k[:, blk, pos % BS], np.array(win_k[:, b, j]),
                    err_msg=f"sub={sub} b={b} j={j}")
        # history rows BEFORE ctx0 in the touched slab are preserved
        for b in range(B):
            pos0 = int(ctx0[b])
            blk = int(bt[b, pos0 // BS])
            r0 = pos0 % BS
            np.testing.assert_array_equal(
                got_k[:, blk, :r0], want_k[:, blk, :r0],
                err_msg=f"sub={sub} history row clobbered (b={b})")
        # untouched blocks are bit-identical
        touched = {int(bt[b, (int(ctx0[b]) + j) // BS])
                   for b in range(B) for j in range(max(int(steps[b]), 1))}
        for blk in range(NB):
            if blk not in touched:
                np.testing.assert_array_equal(
                    got_k[:, blk], np.array(hist_k[:, blk]),
                    err_msg=f"sub={sub} untouched block {blk} changed")
    with _pytest.raises(ValueError, match="must divide"):
        merge_window_kv(hist_k, hist_v, win_k, win_v, bt, ctx0, steps,
                        sub_rows=24)
