"""Dispatch-gate policies in ops/attention.py: env-flag handling, the
flash-window auto policy, per-device geometry checks under a mesh, and the
fp8-itemsize exclusions (ADVICE r2: the decode kernel must never see a
1-byte KV cache; env values outside {'0','1'} must warn, not silently
no-op)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.ops import attention as attn
from vllm_i64_tpu.ops import ep_dispatch


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in ("VLLM_I64_TPU_PALLAS_PREFILL", "VLLM_I64_TPU_PALLAS_WINDOW",
                "VLLM_I64_TPU_PALLAS_INTERPRET"):
        monkeypatch.delenv(var, raising=False)
    attn._WARNED_ENVS.clear()
    prev = ep_dispatch.get_ep_mesh()
    yield
    ep_dispatch.set_ep_mesh(prev)


class TestEnvFlags:
    def test_unrecognized_value_warns_once(self, monkeypatch, caplog):
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_WINDOW", "yes")
        with caplog.at_level(logging.WARNING,
                             logger="vllm_i64_tpu.attention"):
            assert attn._env_flag("VLLM_I64_TPU_PALLAS_WINDOW") is None
            assert attn._env_flag("VLLM_I64_TPU_PALLAS_WINDOW") is None
        warnings = [r for r in caplog.records
                    if "VLLM_I64_TPU_PALLAS_WINDOW" in r.getMessage()]
        assert len(warnings) == 1  # once, not per trace

    def test_valid_values_pass_through(self, monkeypatch):
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_PREFILL", "1")
        assert attn._env_flag("VLLM_I64_TPU_PALLAS_PREFILL") == "1"
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_PREFILL", "0")
        assert attn._env_flag("VLLM_I64_TPU_PALLAS_PREFILL") == "0"
        monkeypatch.delenv("VLLM_I64_TPU_PALLAS_PREFILL")
        assert attn._env_flag("VLLM_I64_TPU_PALLAS_PREFILL") is None


class TestWindowAutoPolicy:
    def test_short_context_uses_gather(self):
        # auto policy: below the measured crossover the gather wins
        assert not attn._use_pallas_window_decode(
            attn._FLASH_WINDOW_MIN_CTX - 1)

    def test_env_zero_forces_gather_even_long(self, monkeypatch):
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_WINDOW", "0")
        assert not attn._use_pallas_window_decode(4096)

    def test_interpret_mode_enables_on_cpu(self, monkeypatch):
        # CPU-mesh validation path (driver dry-run)
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_WINDOW", "1")
        assert attn._use_pallas_window_decode(64)


class TestMeshGeometry:
    def test_no_mesh_is_tp1(self):
        ep_dispatch.set_ep_mesh(None)
        mesh, tp = attn._mesh_and_tp()
        assert mesh is None and tp == 1

    def test_mesh_reports_tp(self):
        from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh

        m = make_mesh(ParallelConfig(dp=2, ep=2, tp=2))
        ep_dispatch.set_ep_mesh(m)
        mesh, tp = attn._mesh_and_tp()
        assert mesh is m and tp == 2

    def test_window_flash_skipped_when_local_heads_misaligned(self,
                                                              monkeypatch):
        """tp=4 over 4 kv-heads x 32 d leaves (1 head x 32) = 32 lanes per
        device — below Mosaic's 128-lane page row; the gather path must
        serve (and match) instead of the kernel failing to compile."""
        from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh

        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_WINDOW", "1")
        mesh = make_mesh(ParallelConfig(dp=2, ep=1, tp=4))
        ep_dispatch.set_ep_mesh(mesh)

        b, hq, hkv, d, bs, mb, kwin = 4, 8, 4, 32, 8, 2, 4
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
        kc = jax.random.normal(ks[1], (1 + b * mb, bs, hkv * d), jnp.float32)
        vc = jax.random.normal(ks[2], (1 + b * mb, bs, hkv * d), jnp.float32)
        wk = jax.random.normal(ks[3], (b, kwin, hkv * d), jnp.float32)
        wv = jax.random.normal(ks[4], (b, kwin, hkv * d), jnp.float32)
        bt = jnp.arange(1, 1 + b * mb, dtype=jnp.int32).reshape(b, mb)
        c0 = jnp.full((b,), mb * bs, jnp.int32)

        got = attn.paged_attention_window(q, kc, vc, bt, c0, wk, wv,
                                          jnp.int32(1))
        ep_dispatch.set_ep_mesh(None)
        import os

        os.environ.pop("VLLM_I64_TPU_PALLAS_WINDOW", None)
        os.environ.pop("VLLM_I64_TPU_PALLAS_INTERPRET", None)
        ref = attn.paged_attention_window(q, kc, vc, bt, c0, wk, wv,
                                          jnp.int32(1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


class TestFp8Gates:
    def test_decode_kernel_gate_excludes_1byte_kv(self):
        """1-byte (fp8) caches tile (32, 128) in Mosaic: bs=16 page DMAs
        would fail at serve time (ADVICE r2 medium). The decode-kernel gate
        lives in paged_attention's dispatch; verify the fp8 cache path runs
        the gather and produces finite output with the kernel flag forced."""
        prev = attn._PALLAS_DECODE
        attn._PALLAS_DECODE = True
        try:
            b, hq, hkv, d, bs, mb = 2, 8, 4, 32, 16, 2
            key = jax.random.PRNGKey(1)
            q = jax.random.normal(key, (b, 1, hq, d), jnp.float32)
            kc = jnp.ones((1 + b * mb, bs, hkv * d),
                          jnp.float8_e4m3fn)
            vc = jnp.ones((1 + b * mb, bs, hkv * d), jnp.float8_e4m3fn)
            bt = jnp.arange(1, 1 + b * mb, dtype=jnp.int32).reshape(b, mb)
            pos = jnp.full((b, 1), bs * mb - 1, jnp.int32)
            ctx = jnp.full((b,), bs * mb, jnp.int32)
            out = attn.paged_attention(q, kc, vc, bt, pos, ctx)
            assert bool(jnp.isfinite(out).all())
        finally:
            attn._PALLAS_DECODE = prev

    def test_window_flash_gate_excludes_1byte_kv(self, monkeypatch):
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VLLM_I64_TPU_PALLAS_WINDOW", "1")
        b, hq, hkv, d, bs, mb, kwin = 2, 8, 4, 32, 8, 2, 4
        key = jax.random.PRNGKey(2)
        q = jax.random.normal(key, (b, 1, hq, d), jnp.float32)
        kc = jnp.ones((1 + b * mb, bs, hkv * d), jnp.float8_e4m3fn)
        vc = jnp.ones((1 + b * mb, bs, hkv * d), jnp.float8_e4m3fn)
        wk = jnp.ones((b, kwin, hkv * d), jnp.float32)
        wv = jnp.ones((b, kwin, hkv * d), jnp.float32)
        bt = jnp.arange(1, 1 + b * mb, dtype=jnp.int32).reshape(b, mb)
        c0 = jnp.full((b,), mb * bs, jnp.int32)
        # 1-byte cache: must take the gather path (kernel would need
        # (32, 128) tiles); output stays finite
        out = attn.paged_attention_window(q, kc, vc, bt, c0, wk, wv,
                                          jnp.int32(0))
        assert bool(jnp.isfinite(out).all())
