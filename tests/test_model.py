"""Model forward tests — shapes, GQA, paged-cache parity, MoE semantics.

Mirrors the reference test strategy of running real forwards on tiny configs
(ref: tests/test_model.py) plus invariants specific to the TPU design:
the paged-cache step function must agree exactly with the cache-free forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.models import complexity_deep as cdm


def make_kv(cfg, num_blocks=64, block_size=4, dtype=jnp.float32):
    # flat pages (L, NB, bs, Hkv*d) — engine/runner kv_shape
    shape = (
        cfg.num_hidden_layers,
        num_blocks,
        block_size,
        cfg.num_key_value_heads * cfg.head_dim,
    )
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


@pytest.fixture(scope="module")
def routed_params(request):
    cfg = request.getfixturevalue("tiny_config")
    return cdm.init_params(cfg, jax.random.PRNGKey(0))


class TestForward:
    def test_logits_shape_and_dtype(self, tiny_config, routed_params):
        ids = jnp.array([[1, 2, 3, 4, 5]], dtype=jnp.int32)
        logits = cdm.forward(routed_params, tiny_config, ids)
        assert logits.shape == (1, 5, tiny_config.vocab_size)
        assert logits.dtype == jnp.float32

    def test_dense_forward(self, tiny_dense_config):
        params = cdm.init_params(tiny_dense_config, jax.random.PRNGKey(1))
        ids = jnp.array([[1, 2, 3]], dtype=jnp.int32)
        logits = cdm.forward(params, tiny_dense_config, ids)
        assert logits.shape == (1, 3, tiny_dense_config.vocab_size)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_mu_guidance_changes_output(self, tiny_config):
        cfg_mu = tiny_config.replace(use_mu_guidance=True)
        params = cdm.init_params(cfg_mu, jax.random.PRNGKey(2))
        ids = jnp.array([[5, 6, 7]], dtype=jnp.int32)
        out_mu = cdm.forward(params, cfg_mu, ids)
        # zeroed mu_proj at init -> mu biases via mu_to_{q,k,v} of clamp(ones)
        assert bool(jnp.all(jnp.isfinite(out_mu)))
        params2 = dict(params)
        params2["layers"] = dict(params["layers"])
        params2["layers"]["mu"] = params["layers"]["mu"] * 0.0
        out_mu0 = cdm.forward(params2, cfg_mu, ids)
        assert not np.allclose(np.asarray(out_mu), np.asarray(out_mu0))

    def test_padding_rows_do_not_affect_valid(self, tiny_config, routed_params):
        """Right-padding must not change earlier logits (causal + seq_lens)."""
        ids = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
        full = cdm.forward(routed_params, tiny_config, ids)
        padded = jnp.array([[1, 2, 3, 4, 9, 9]], dtype=jnp.int32)
        out = cdm.forward(
            routed_params, tiny_config, padded, seq_lens=jnp.array([4], jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(full[0, :4]), np.asarray(out[0, :4]), rtol=2e-5, atol=2e-5
        )


class TestPagedCacheParity:
    def test_prefill_matches_full_forward(self, tiny_config, routed_params):
        cfg = tiny_config
        B, T = 2, 10
        key = jax.random.PRNGKey(3)
        ids = jax.random.randint(key, (B, T), 0, cfg.vocab_size, dtype=jnp.int32)
        ref = cdm.forward(routed_params, cfg, ids)  # (B, T, V)

        kv = make_kv(cfg)
        bt = jnp.array([[1, 2, 3, 0], [4, 5, 6, 0]], jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        logits, _ = cdm.forward_step(
            routed_params, cfg, ids, pos, kv, bt,
            ctx_lens=jnp.full((B,), T, jnp.int32),
            last_idx=jnp.full((B,), T - 1, jnp.int32),
            valid=jnp.ones((B, T), bool),
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref[:, -1, :]), rtol=1e-5, atol=1e-5
        )

    def test_decode_matches_full_forward(self, tiny_config, routed_params):
        """Prefill N tokens, decode one more; compare vs full forward of N+1."""
        cfg = tiny_config
        T = 7
        ids = jax.random.randint(
            jax.random.PRNGKey(4), (1, T + 1), 0, cfg.vocab_size, dtype=jnp.int32
        )
        ref = cdm.forward(routed_params, cfg, ids)[:, -1, :]

        kv = make_kv(cfg)
        bt = jnp.array([[1, 2, 0, 0]], jnp.int32)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        _, kv = cdm.forward_step(
            routed_params, cfg, ids[:, :T], pos, kv, bt,
            ctx_lens=jnp.array([T], jnp.int32),
            last_idx=jnp.array([T - 1], jnp.int32),
            valid=jnp.ones((1, T), bool),
        )
        logits, _ = cdm.forward_step(
            routed_params, cfg, ids[:, T:], jnp.array([[T]], jnp.int32), kv, bt,
            ctx_lens=jnp.array([T + 1], jnp.int32),
            last_idx=jnp.array([0], jnp.int32),
            valid=jnp.ones((1, 1), bool),
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_chunked_prefill_matches(self, tiny_config, routed_params):
        """Prefill in two chunks == prefill in one shot."""
        cfg = tiny_config
        T = 8
        ids = jax.random.randint(
            jax.random.PRNGKey(5), (1, T), 0, cfg.vocab_size, dtype=jnp.int32
        )
        ref = cdm.forward(routed_params, cfg, ids)[:, -1, :]

        kv = make_kv(cfg)
        bt = jnp.array([[1, 2, 0, 0]], jnp.int32)
        half = T // 2
        _, kv = cdm.forward_step(
            routed_params, cfg, ids[:, :half],
            jnp.arange(half, dtype=jnp.int32)[None], kv, bt,
            ctx_lens=jnp.array([half], jnp.int32),
            last_idx=jnp.array([half - 1], jnp.int32),
            valid=jnp.ones((1, half), bool),
        )
        logits, _ = cdm.forward_step(
            routed_params, cfg, ids[:, half:],
            jnp.arange(half, T, dtype=jnp.int32)[None], kv, bt,
            ctx_lens=jnp.array([T], jnp.int32),
            last_idx=jnp.array([half - 1], jnp.int32),
            valid=jnp.ones((1, half), bool),
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_padded_batch_rows_isolated(self, tiny_config, routed_params):
        """Invalid (masked) rows must not corrupt valid rows' KV."""
        cfg = tiny_config
        T = 6
        ids = jax.random.randint(
            jax.random.PRNGKey(6), (1, T), 0, cfg.vocab_size, dtype=jnp.int32
        )
        ref = cdm.forward(routed_params, cfg, ids)[:, -1, :]

        kv = make_kv(cfg)
        # batch of 2: row 1 is all padding (valid=False), block table zeros
        ids2 = jnp.concatenate([ids, jnp.zeros_like(ids)], axis=0)
        bt = jnp.array([[1, 2, 0, 0], [0, 0, 0, 0]], jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (2, T))
        valid = jnp.stack([jnp.ones((T,), bool), jnp.zeros((T,), bool)])
        logits, _ = cdm.forward_step(
            routed_params, cfg, ids2, pos, kv, bt,
            ctx_lens=jnp.array([T, 0], jnp.int32),
            last_idx=jnp.array([T - 1, 0], jnp.int32),
            valid=valid,
        )
        np.testing.assert_allclose(
            np.asarray(logits[:1]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        assert bool(jnp.all(jnp.isfinite(logits[1])))


class TestRouting:
    def test_route_table_cyclic_default(self, tiny_config):
        table = cdm.cyclic_route_table(16, 4, 2)
        assert table.shape == (2, 16)
        np.testing.assert_array_equal(table[0], np.arange(16) % 4)
        np.testing.assert_array_equal(table[1], (np.arange(16) + 1) % 4)

    def test_routing_is_deterministic_in_token_id(self, tiny_config, routed_params):
        """Same token id at different positions must route identically:
        perturbing expert e's weights only affects tokens routed to e."""
        cfg = tiny_config
        from vllm_i64_tpu.ops.moe import compute_routes

        table = routed_params["layers"]["mlp"]["route_table"][0]
        ids = jnp.array([3, 7, 3, 11], dtype=jnp.int32)
        routes = compute_routes(table, ids, cfg.vocab_size)
        assert routes.shape == (cfg.effective_top_k, 4)
        assert int(routes[0, 0]) == int(routes[0, 2])  # same token -> same expert
