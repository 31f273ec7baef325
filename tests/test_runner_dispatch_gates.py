"""Runner dispatch-gate behavior: the block-aligned prefill write gate
(ADVICE r2: contiguity is part of the contract, a violating caller must
fall back, not corrupt the cache) and int4 serving under a mesh (the
Pallas int4 kernels are single-device; mesh forwards use the dequantize
fallback and must stay correct).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplerFeatures, SamplingParams, make_param_arrays
from vllm_i64_tpu.core.scheduler import Request
from vllm_i64_tpu.engine.runner import ModelRunner
from vllm_i64_tpu.models import complexity_deep as cdm


def _cfg():
    return ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                       num_hidden_layers=2, num_attention_heads=8,
                       num_key_value_heads=2, max_position_embeddings=128,
                       num_experts=4, top_k=2, shared_expert=True)


def _runner(cfg, **kw):
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=128, kv_block_size=16,
                        max_kv_blocks=64, max_prefill_tokens=64,
                        decode_batch_buckets=(1, 2, 4),
                        prefill_batch_buckets=(1, 2, 4),
                        prefill_token_buckets=(16, 32), **kw)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    return ModelRunner(params, cfg, ecfg)


def _exec(runner, token_ids, positions, valid, bt=None):
    b, t = token_ids.shape
    reqs = [Request(request_id=i, prompt_token_ids=token_ids[i][valid[i]],
                    max_new_tokens=4) for i in range(b)]
    sp = [SamplingParams(temperature=0.0)] * b
    if bt is None:
        bt = np.arange(1, 1 + 2 * b, dtype=np.int32).reshape(b, 2)
    return runner.execute(
        token_ids=token_ids, positions=positions, block_tables=bt,
        ctx_lens=valid.sum(axis=1).astype(np.int32),
        last_idx=np.maximum(valid.sum(axis=1) - 1, 0).astype(np.int32),
        valid=valid,
        slot_ids=np.arange(b, dtype=np.int32),
        sample_mask=np.ones(b, bool),
        sample_args=make_param_arrays(sp, reqs),
        features=SamplerFeatures.for_params(sp),
        kind="prefill",
    )


class TestBlockAlignedGate:
    def test_contiguous_block_prompt_is_aligned_and_correct(self):
        cfg = _cfg()
        r = _runner(cfg)
        b, t = 2, 32
        token_ids = np.tile(np.arange(5, 5 + t, dtype=np.int64)[None], (b, 1))
        positions = np.tile(np.arange(t, dtype=np.int32)[None], (b, 1))
        valid = np.ones((b, t), bool)
        toks, _ = _exec(r, token_ids, positions, valid)
        assert toks.shape == (b,)
        assert np.all((toks >= 0) & (toks < cfg.vocab_size))

    def test_noncontiguous_positions_fall_back_not_corrupt(self):
        """Positions with a gap inside the valid prefix violate the
        block-aligned contract; the host gate must take the row-scatter
        path and produce the same output as an explicitly contiguous
        reference computed over the same (token, position) pairs."""
        cfg = _cfg()
        r = _runner(cfg)
        b, t = 1, 32
        token_ids = np.arange(7, 7 + t, dtype=np.int64)[None]
        positions = np.arange(t, dtype=np.int32)[None].copy()
        positions[0, 16:] += 16  # gap: second block lands at block idx 2
        valid = np.ones((b, t), bool)
        bt = np.arange(1, 4, dtype=np.int32).reshape(1, 3)
        toks, _ = _exec(r, token_ids, positions, valid, bt=bt)
        assert toks.shape == (1,)
        # cache block 2 (positions 16..31 never written) must remain zeros;
        # block 3 (positions 32..47) holds the second chunk
        k = np.asarray(r.kv_k)
        assert np.all(k[:, 2] == 0)
        assert np.any(k[:, 3] != 0)

    def test_non_prefix_valid_falls_back(self):
        """A hole in the valid mask (not a prefix) must not take the
        whole-block image path."""
        cfg = _cfg()
        r = _runner(cfg)
        b, t = 1, 32
        token_ids = np.arange(9, 9 + t, dtype=np.int64)[None]
        positions = np.arange(t, dtype=np.int32)[None]
        valid = np.ones((b, t), bool)
        valid[0, 5] = False  # hole
        toks, _ = _exec(r, token_ids, positions, valid)
        assert toks.shape == (1,)
        # the hole's cache row (block 1, offset 5) stays zero
        k = np.asarray(r.kv_k)
        assert np.all(k[:, 1, 5] == 0)
        assert np.any(k[:, 1, 4] != 0)


class TestInt4UnderMesh:
    def test_int4_forward_on_mesh_uses_fallback_and_matches(self):
        """Q4 weights sharded over a dp/tp mesh: the Pallas int4 kernels
        are gated off (single-device programs) and the dequantize fallback
        serves; logits must match the single-device int4 forward."""
        from vllm_i64_tpu.core.quantize_model import quantize_params
        from vllm_i64_tpu.ops import ep_dispatch
        from vllm_i64_tpu.parallel.mesh import (
            ParallelConfig,
            make_mesh,
            shard_params,
        )

        cfg = _cfg()
        params = cdm.init_params(cfg, jax.random.PRNGKey(1))
        qparams = quantize_params(params, cfg, "int4")
        toks = jnp.asarray(
            np.random.default_rng(2).integers(3, 250, size=(2, 8)),
            jnp.int32)
        ref = cdm.forward(qparams, cfg, toks)

        mesh = make_mesh(ParallelConfig(dp=4, ep=1, tp=2))
        sharded = shard_params(qparams, cfg, mesh)
        prev = ep_dispatch.get_ep_mesh()
        try:
            ep_dispatch.set_ep_mesh(mesh)
            with jax.set_mesh(mesh):
                got = jax.jit(lambda p, t: cdm.forward(p, cfg, t))(
                    sharded, toks)
        finally:
            ep_dispatch.set_ep_mesh(prev)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
