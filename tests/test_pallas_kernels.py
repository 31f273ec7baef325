"""Pallas kernel tests (interpreter mode on CPU) vs XLA references
(ref analogs: csrc/I64_rmsnorm.cu, I64_gemm.cu, layers/attention.py:469-514).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.ops.attention import gather_kv, paged_attention, write_kv
from vllm_i64_tpu.ops.fused_norm import rmsnorm_pallas, rmsnorm_quant_pallas
from vllm_i64_tpu.ops.fused_swiglu import _xla_fallback, fused_swiglu
from vllm_i64_tpu.ops.norms import rms_norm
from vllm_i64_tpu.ops.paged_attention_pallas import paged_decode_attention_pallas
from vllm_i64_tpu.ops.quant import quantize_int8


@pytest.fixture()
def key():
    return jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# fused rmsnorm
# ---------------------------------------------------------------------------


def test_rmsnorm_pallas_matches_xla(key):
    x = jax.random.normal(key, (64, 256), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (256,)) * 0.1 + 1.0
    got = rmsnorm_pallas(x, w, interpret=True)
    want = rms_norm(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_rmsnorm_quant_pallas(key):
    x = jax.random.normal(key, (32, 128), jnp.float32) * 3.0
    w = jnp.ones((128,))
    q, s = rmsnorm_quant_pallas(x, w, interpret=True)
    assert q.dtype == jnp.int8 and s.shape == (32, 1)
    deq = q.astype(jnp.float32) * s
    want = np.asarray(rms_norm(x, w))
    # int8 quantization error bound: scale/2 per element
    np.testing.assert_allclose(np.asarray(deq), want,
                               atol=float(s.max()) * 0.51 + 1e-6)
    # every row uses the full int8 range
    assert np.abs(np.asarray(q)).max(axis=1).min() == 127


# ---------------------------------------------------------------------------
# fused swiglu dequant
# ---------------------------------------------------------------------------


def test_fused_swiglu_pallas_matches_xla(key):
    m, h, i = 16, 256, 256
    x = jax.random.normal(key, (m, h), jnp.float32)
    gw = jax.random.normal(jax.random.fold_in(key, 1), (h, i)) * 0.05
    uw = jax.random.normal(jax.random.fold_in(key, 2), (h, i)) * 0.05
    gq, uq = quantize_int8(gw), quantize_int8(uw)
    got = fused_swiglu(x, gq, uq, force_pallas=True, interpret=True)
    want = _xla_fallback(x, gq, uq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_swiglu_float_fallback(key):
    x = jax.random.normal(key, (4, 64), jnp.float32)
    gw = jax.random.normal(jax.random.fold_in(key, 1), (64, 96)) * 0.1
    uw = jax.random.normal(jax.random.fold_in(key, 2), (64, 96)) * 0.1
    got = fused_swiglu(x, gw, uw)
    want = jax.nn.silu(x @ gw) * (x @ uw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# paged decode attention
# ---------------------------------------------------------------------------


def make_paged_case(key, b=3, hq=8, hkv=2, d=32, bs=16, nb=64, mb=8,
                    dtype=jnp.float32):
    """Random paged KV state with per-seq context lengths."""
    keys = jax.random.split(key, 8)
    k_cache = jax.random.normal(keys[0], (nb, bs, hkv * d), dtype)
    v_cache = jax.random.normal(keys[1], (nb, bs, hkv * d), dtype)
    q = jax.random.normal(keys[2], (b, hq, d), dtype)
    # unique random physical blocks per sequence
    perm = np.random.default_rng(0).permutation(nb - 1)[: b * mb] + 1
    block_tables = jnp.asarray(perm.reshape(b, mb).astype(np.int32))
    ctx_lens = jnp.asarray([5, bs * 3, bs * mb], jnp.int32)[:b]
    return q, k_cache, v_cache, block_tables, ctx_lens


def test_paged_decode_pallas_matches_xla(key):
    q, kc, vc, bt, ctx = make_paged_case(key)
    hkv = 2
    got = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=16, num_kv_heads=hkv,
        chunk_blocks=2, interpret=True)
    positions = (ctx - 1)[:, None]
    want = paged_attention(q[:, None], kc, vc, bt, positions, ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_decode_pallas_single_chunk(key):
    q, kc, vc, bt, ctx = make_paged_case(key, b=2, mb=4)
    hkv = 2
    got = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=16, num_kv_heads=hkv,
        chunk_blocks=8, interpret=True)
    positions = (ctx - 1)[:, None]
    want = paged_attention(q[:, None], kc, vc, bt, positions, ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_decode_pallas_after_write(key):
    """End-to-end: write_kv then attend — mirrors the engine's decode step."""
    b, hq, hkv, d, bs = 2, 4, 2, 16, 4
    nb, mb = 32, 4
    kc = jnp.zeros((nb, bs, hkv * d), jnp.float32)
    vc = jnp.zeros((nb, bs, hkv * d), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    # prefill 7 tokens for each row
    t = 7
    keys = jax.random.split(key, 4)
    k_new = jax.random.normal(keys[0], (b, t, hkv, d))
    v_new = jax.random.normal(keys[1], (b, t, hkv, d))
    pos = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1))
    kc, vc = write_kv(kc, vc, k_new, v_new, bt, pos)
    q = jax.random.normal(keys[2], (b, hq, d))
    ctx = jnp.full((b,), t, jnp.int32)
    got = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=bs, num_kv_heads=hkv,
        chunk_blocks=2, interpret=True)
    want = paged_attention(q[:, None], kc, vc, bt,
                           jnp.full((b, 1), t - 1, jnp.int32), ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# paged prefill attention
# ---------------------------------------------------------------------------


def test_paged_prefill_pallas_matches_xla(key):
    from vllm_i64_tpu.ops.prefill_attention_pallas import (
        paged_prefill_attention_pallas,
    )

    b, t, hq, hkv, d, bs, nb, mb = 2, 16, 8, 2, 32, 4, 64, 16
    keys = jax.random.split(key, 6)
    kc = jnp.zeros((nb, bs, hkv * d), jnp.float32)
    vc = jnp.zeros((nb, bs, hkv * d), jnp.float32)
    perm = np.random.default_rng(1).permutation(nb - 1)[: b * mb] + 1
    bt = jnp.asarray(perm.reshape(b, mb).astype(np.int32))
    # row 0: fresh prefill of 16 tokens; row 1: chunk starting at pos 32
    starts = jnp.asarray([0, 32], jnp.int32)
    positions = starts[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    ctx = starts + t
    k_new = jax.random.normal(keys[0], (b, 48, hkv, d))
    v_new = jax.random.normal(keys[1], (b, 48, hkv, d))
    all_pos = jnp.tile(jnp.arange(48, dtype=jnp.int32)[None], (b, 1))
    valid = all_pos < ctx[:, None]
    kc, vc = write_kv(kc, vc, k_new, v_new, bt, all_pos, valid)
    q = jax.random.normal(keys[2], (b, t, hq, d))

    got = paged_prefill_attention_pallas(
        q, kc, vc, bt, positions, ctx, block_size=bs, num_kv_heads=hkv,
        chunk_blocks=2, t_tile=8, interpret=True)
    want = paged_attention(q, kc, vc, bt, positions, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_prefill_pallas_single_tile(key):
    from vllm_i64_tpu.ops.prefill_attention_pallas import (
        paged_prefill_attention_pallas,
    )

    b, t, hq, hkv, d, bs = 1, 8, 4, 2, 16, 4
    nb, mb = 16, 4
    kc = jnp.zeros((nb, bs, hkv * d), jnp.float32)
    vc = jnp.zeros((nb, bs, hkv * d), jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    positions = jnp.arange(t, dtype=jnp.int32)[None]
    ctx = jnp.asarray([t], jnp.int32)
    k_new = jax.random.normal(key, (b, t, hkv, d))
    v_new = jax.random.normal(jax.random.fold_in(key, 1), (b, t, hkv, d))
    kc, vc = write_kv(kc, vc, k_new, v_new, bt, positions)
    q = jax.random.normal(jax.random.fold_in(key, 2), (b, t, hq, d))
    got = paged_prefill_attention_pallas(
        q, kc, vc, bt, positions, ctx, block_size=bs, num_kv_heads=hkv,
        chunk_blocks=2, t_tile=8, interpret=True)
    want = paged_attention(q, kc, vc, bt, positions, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_long_context_prefill_dispatches_to_pallas(key, monkeypatch):
    """paged_attention routes T >= _PALLAS_PREFILL_MIN_T prefill to the
    flash kernel (wiring check via interpret mode on CPU)."""
    import functools

    from vllm_i64_tpu.ops import attention as attn
    from vllm_i64_tpu.ops import prefill_attention_pallas as ppa

    b, t, hq, hkv, d, bs = 1, 1024, 4, 2, 64, 16
    nb = t // bs + 2
    mb = t // bs
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, t, hq, d), jnp.float32)
    kc = jax.random.normal(k2, (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(k3, (nb, bs, hkv * d), jnp.float32)
    bt = jnp.arange(1, mb + 1, dtype=jnp.int32)[None]
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    ctx = jnp.asarray([t], jnp.int32)

    want = attn.paged_attention(q, kc, vc, bt, pos, ctx)

    called = {}
    orig = ppa.paged_prefill_attention_pallas

    def spy(*a, **kw):
        called["yes"] = True
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(ppa, "paged_prefill_attention_pallas", spy)
    monkeypatch.setattr(attn, "_use_pallas_prefill", lambda: True)
    # decode fast path is t==1 only; prefill branch must trigger here
    got = attn.paged_attention(q, kc, vc, bt, pos, ctx)
    assert called.get("yes"), "pallas prefill branch did not trigger"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_kv_write_decode_pallas_matches_scatter(key):
    """Window-RMW decode write == XLA scatter (interpret mode), including
    dropped invalid rows and the software-pipeline tail."""
    from vllm_i64_tpu.ops.kv_write_pallas import kv_write_decode_pallas

    nb, bs, hkv, d, b = 16, 16, 4, 32, 11
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kc = jax.random.normal(k1, (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(k2, (nb, bs, hkv * d), jnp.float32)
    kn = jax.random.normal(k3, (b, hkv * d), jnp.float32)
    vn = jax.random.normal(k4, (b, hkv * d), jnp.float32)
    slots = jnp.asarray(
        [5, 17, 40, 66, 100, 2**30, 130, 150, 170, 2**30, 200], jnp.int32)
    ko, vo = kv_write_decode_pallas(kc, vc, kn, vn, slots, interpret=True)

    want_k = kc.reshape(nb * bs, hkv * d).at[slots].set(kn, mode="drop")
    want_v = vc.reshape(nb * bs, hkv * d).at[slots].set(vn, mode="drop")
    np.testing.assert_allclose(
        np.asarray(ko.reshape(nb * bs, hkv * d)), np.asarray(want_k))
    np.testing.assert_allclose(
        np.asarray(vo.reshape(nb * bs, hkv * d)), np.asarray(want_v))


def test_write_kv_decode_dispatches_to_pallas(key, monkeypatch):
    """write_kv routes T=1 aligned writes to the window kernel and the
    result matches the scatter path exactly."""
    from vllm_i64_tpu.ops import attention as attn
    from vllm_i64_tpu.ops import kv_write_pallas as kwp

    nb, bs, hkv, d, b = 8, 16, 2, 64, 4
    k1, k2, k3 = jax.random.split(key, 3)
    kc = jax.random.normal(k1, (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(k2, (nb, bs, hkv * d), jnp.float32)
    kn = jax.random.normal(k3, (b, 1, hkv, d), jnp.float32)
    bt = jnp.asarray([[1, 2], [3, 4], [5, 6], [7, 0]], jnp.int32)
    pos = jnp.asarray([[3], [17], [0], [31]], jnp.int32)
    valid = jnp.asarray([[True], [True], [True], [False]])

    want_k, want_v = attn.write_kv(kc, vc, kn, kn, bt, pos, valid)

    called = {}
    orig = kwp.kv_write_decode_pallas

    def spy(*a, **kw):
        called["yes"] = True
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(kwp, "kv_write_decode_pallas", spy)
    monkeypatch.setattr(attn, "_use_pallas_decode", lambda: True)
    monkeypatch.setattr(attn, "_PALLAS_KV_WRITE", True)
    got_k, got_v = attn.write_kv(kc, vc, kn, kn, bt, pos, valid)
    assert called.get("yes"), "pallas write branch did not trigger"
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))


def test_paged_decode_pallas_stats(key):
    """return_stats (m, l) must reproduce the online-softmax invariant:
    out == (sum exp(s - m) * v) / l, with m the true row max."""
    q, kc, vc, bt, ctx = make_paged_case(key)
    hkv = 2
    out, m, l = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=16, num_kv_heads=hkv,
        chunk_blocks=2, interpret=True, return_stats=True)
    b, hq, d = q.shape
    g = hq // hkv
    scale = 1.0 / (d ** 0.5)
    k, v = gather_kv(kc, vc, bt)  # (B, S, HD) flat
    s = k.shape[1]
    k = k.reshape(b, s, hkv, d)
    v = v.reshape(b, s, hkv, d)
    qg = q.reshape(b, hkv, g, d)
    scores = jnp.einsum("bhgd,bshd->bhgs", qg, k,
                        preferred_element_type=jnp.float32) * scale
    kpos = jnp.arange(s, dtype=jnp.int32)
    mask = kpos[None, :] < ctx[:, None]  # (B, S)
    scores = jnp.where(mask[:, None, None, :], scores, -jnp.inf)
    m_ref = jnp.max(scores, axis=-1).reshape(b, hq)
    p = jnp.exp(scores - m_ref.reshape(b, hkv, g)[..., None])
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    l_ref = jnp.sum(p, axis=-1).reshape(b, hq)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-4)


def test_window_attention_flash_matches_xla(key):
    """The flash window-decode path (kernel history + in-band window,
    (m, l)-combined) must match the XLA gather paged_attention_window,
    including ctx0 == 0 rows (no history) and masked window tails."""
    from vllm_i64_tpu.ops import attention as attn
    from vllm_i64_tpu.ops import paged_attention_pallas as pap

    b, hq, hkv, d, bs, nb, mb, kwin = 3, 8, 2, 64, 8, 32, 4, 4
    keys = jax.random.split(key, 6)
    kc = jax.random.normal(keys[0], (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(keys[1], (nb, bs, hkv * d), jnp.float32)
    q = jax.random.normal(keys[2], (b, 1, hq, d), jnp.float32)
    win_k = jax.random.normal(keys[3], (b, kwin, hkv * d), jnp.float32)
    win_v = jax.random.normal(keys[4], (b, kwin, hkv * d), jnp.float32)
    perm = np.random.default_rng(2).permutation(nb - 1)[: b * mb] + 1
    bt = jnp.asarray(perm.reshape(b, mb).astype(np.int32))
    ctx0 = jnp.asarray([0, 5, bs * 3], jnp.int32)  # incl. empty history

    import unittest.mock as mock

    orig = pap.paged_decode_attention_pallas
    called = {}

    def spy(*a, **kw):
        called["yes"] = True
        kw["interpret"] = True
        return orig(*a, **kw)

    for k_idx in (0, 2, kwin - 1):
        want = attn.paged_attention_window(
            q, kc, vc, bt, ctx0, win_k, win_v, jnp.int32(k_idx))
        with mock.patch.object(
            pap, "paged_decode_attention_pallas", spy
        ), mock.patch.object(
            attn, "_use_pallas_window_decode", lambda *_: True
        ):
            got = attn.paged_attention_window(
                q, kc, vc, bt, ctx0, win_k, win_v, jnp.int32(k_idx))
        assert called.get("yes"), "flash window branch did not trigger"
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_paged_decode_pallas_contiguous_run_dma(key):
    """Physically-contiguous block tables take the single-run-DMA path
    (one async copy per chunk); result must match the per-page path and
    the XLA reference, including a partial tail chunk."""
    b, hq, hkv, d, bs, mb = 3, 8, 2, 32, 16, 8
    nb = b * mb + 2
    keys = jax.random.split(key, 3)
    kc = jax.random.normal(keys[0], (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(keys[1], (nb, bs, hkv * d), jnp.float32)
    q = jax.random.normal(keys[2], (b, hq, d), jnp.float32)
    # ascending contiguous tables, as a fresh block pool hands out
    bt = (jnp.arange(b * mb, dtype=jnp.int32) + 2).reshape(b, mb)
    # full-chunk contexts, a mid-block tail, and a sub-chunk context
    ctx = jnp.asarray([bs * mb, bs * 5 + 3, bs - 1], jnp.int32)
    got = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=bs, num_kv_heads=hkv,
        chunk_blocks=4, interpret=True)
    positions = (ctx - 1)[:, None]
    want = paged_attention(q[:, None], kc, vc, bt, positions, ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_decode_pallas_batched_tile(key):
    """Batched-tile kernel (TB sequences per program) == XLA reference,
    with mixed per-seq contexts including an empty row, scattered AND
    contiguous tables, and a partial tail chunk."""
    b, hq, hkv, d, bs, mb = 8, 8, 2, 32, 16, 8
    nb = b * mb + 2
    keys = jax.random.split(key, 3)
    kc = jax.random.normal(keys[0], (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(keys[1], (nb, bs, hkv * d), jnp.float32)
    q = jax.random.normal(keys[2], (b, hq, d), jnp.float32)
    # rows 0-3 contiguous ascending, rows 4-7 scattered
    first = (np.arange(4 * mb, dtype=np.int32) + 2).reshape(4, mb)
    perm = np.random.default_rng(3).permutation(
        np.arange(2 + 4 * mb, nb, dtype=np.int32))[: 4 * mb].reshape(4, mb)
    bt = jnp.asarray(np.concatenate([first, perm]))
    ctx = jnp.asarray([bs * mb, 0, 7, bs * 3 + 5,
                       bs * mb, 1, bs * 2, bs * 5], jnp.int32)
    got = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=bs, num_kv_heads=hkv,
        chunk_blocks=4, batch_tile=4, interpret=True)
    want = paged_attention(
        q[:, None], kc, vc, bt,
        jnp.maximum(ctx - 1, 0)[:, None], ctx)[:, 0]
    got, want = np.asarray(got), np.asarray(want)
    # empty rows produce zeros in both paths
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_paged_decode_pallas_batched_tile_stats(key):
    """Tiled kernel's (m, l) stats match the per-seq kernel's."""
    b, hq, hkv, d, bs, mb = 4, 8, 2, 32, 16, 8
    nb = b * mb + 2
    keys = jax.random.split(key, 3)
    kc = jax.random.normal(keys[0], (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(keys[1], (nb, bs, hkv * d), jnp.float32)
    q = jax.random.normal(keys[2], (b, hq, d), jnp.float32)
    perm = np.random.default_rng(4).permutation(nb - 2)[: b * mb] + 2
    bt = jnp.asarray(perm.reshape(b, mb).astype(np.int32))
    ctx = jnp.asarray([5, bs * 3, bs * mb, bs + 1], jnp.int32)
    o1, m1, l1 = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=16, num_kv_heads=hkv,
        chunk_blocks=2, batch_tile=1, interpret=True, return_stats=True)
    o2, m2, l2 = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=16, num_kv_heads=hkv,
        chunk_blocks=2, batch_tile=2, interpret=True, return_stats=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_paged_decode_pallas_fp8_kv(key):
    """fp8 e4m3 KV cache: the tiled kernel upcasts to bf16 for compute;
    result matches the XLA path run on the upcast cache."""
    b, hq, hkv, d, bs, mb = 4, 8, 2, 32, 16, 4
    nb = b * mb + 2
    keys = jax.random.split(key, 3)
    kc = jax.random.normal(keys[0], (nb, bs, hkv * d)).astype(
        jnp.float8_e4m3fn)
    vc = jax.random.normal(keys[1], (nb, bs, hkv * d)).astype(
        jnp.float8_e4m3fn)
    q = jax.random.normal(keys[2], (b, hq, d), jnp.float32)
    bt = (jnp.arange(b * mb, dtype=jnp.int32) + 2).reshape(b, mb)
    ctx = jnp.asarray([bs * mb, 3, bs + 2, bs * 2], jnp.int32)
    got = paged_decode_attention_pallas(
        q, kc, vc, bt, ctx, block_size=bs, num_kv_heads=hkv,
        chunk_blocks=2, batch_tile=2, interpret=True)
    want = paged_attention(
        q[:, None], kc.astype(jnp.float32), vc.astype(jnp.float32), bt,
        (ctx - 1)[:, None], ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_write_kv_block_aligned_matches_scatter(key):
    """Block-aligned prefill write (whole-block images) == the row scatter,
    including pad rows, pad columns, and multi-block rows."""
    from vllm_i64_tpu.ops import attention as attn

    nb, bs, hkv, d = 24, 8, 2, 16
    b, t = 4, 16  # 2 blocks per row
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kc = jax.random.normal(k1, (nb, bs, hkv * d), jnp.float32)
    vc = jax.random.normal(k2, (nb, bs, hkv * d), jnp.float32)
    kn = jax.random.normal(k3, (b, t, hkv, d), jnp.float32)
    vn = jax.random.normal(k4, (b, t, hkv, d), jnp.float32)
    bt = jnp.asarray([[1, 2, 0, 0], [3, 4, 5, 0],
                      [6, 7, 8, 9], [10, 11, 0, 0]], jnp.int32)
    # row 0: fresh 2-block prefill; row 1: chunk starting at block 1;
    # row 2: chunk starting at block 2; row 3: PAD row (no valid tokens)
    starts = jnp.asarray([0, bs, 2 * bs, 0], jnp.int32)
    positions = starts[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    valid = jnp.asarray(
        [[True] * t, [True] * t, [True] * bs + [False] * bs, [False] * t])

    want_k, want_v = attn.write_kv(kc, vc, kn, vn, bt, positions, valid)
    got_k, got_v = attn.write_kv(kc, vc, kn, vn, bt, positions, valid,
                                 block_aligned=True)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))
