"""Sharded execution tests on the 8-device virtual CPU mesh.

This is the multi-chip validation the reference never had (its TP tests run
at tp_size=1 only, ref tests/test_tensor_parallel.py): the sharded forward
must produce the same numbers as single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.parallel import (
    ParallelConfig,
    make_mesh,
    shard_params,
    validate_divisibility,
)


@pytest.fixture(scope="module")
def setup(request):
    cfg = request.getfixturevalue("tiny_config")
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize(
    "dp,ep,tp",
    [(1, 1, 2), (1, 4, 2), (2, 2, 2), (1, 4, 1), (8, 1, 1)],
)
def test_sharded_forward_matches_single_device(setup, dp, ep, tp):
    cfg, params = setup
    ref = None

    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 0, cfg.vocab_size, dtype=jnp.int32)
    ref = np.asarray(cdm.forward(params, cfg, ids))

    pcfg = ParallelConfig(dp=dp, ep=ep, tp=tp)
    validate_divisibility(cfg, pcfg)
    mesh = make_mesh(pcfg)
    sharded = shard_params(params, cfg, mesh)
    with jax.set_mesh(mesh):
        out = np.asarray(cdm.forward(sharded, cfg, ids))
    np.testing.assert_allclose(out, ref, rtol=5e-5, atol=5e-5)


def test_divisibility_validation(setup):
    cfg, _ = setup
    with pytest.raises(ValueError):
        validate_divisibility(cfg, ParallelConfig(tp=3))
    with pytest.raises(ValueError):
        validate_divisibility(cfg, ParallelConfig(ep=3))


def test_sharded_paged_step(setup):
    """forward_step (paged KV) under a 2x2 ep/tp mesh matches unsharded."""
    cfg, params = setup
    B, T = 2, 8
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.vocab_size, dtype=jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    bt = jnp.array([[1, 2, 3], [4, 5, 6]], jnp.int32)
    kv_shape = (cfg.num_hidden_layers, 16, 4,
                cfg.num_key_value_heads * cfg.head_dim)

    def run(p, kv):
        return cdm.forward_step(
            p, cfg, ids, pos, kv, bt,
            ctx_lens=jnp.full((B,), T, jnp.int32),
            last_idx=jnp.full((B,), T - 1, jnp.int32),
            valid=jnp.ones((B, T), bool),
        )

    ref, _ = run(params, (jnp.zeros(kv_shape), jnp.zeros(kv_shape)))

    mesh = make_mesh(ParallelConfig(dp=1, ep=2, tp=2))
    sharded = shard_params(params, cfg, mesh)
    with jax.set_mesh(mesh):
        out, _ = run(sharded, (jnp.zeros(kv_shape), jnp.zeros(kv_shape)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_sharded_quantized_flat_moe(setup):
    """int8 flat-expert layout shards correctly: merged ("ep","tp") specs on
    the flattened expert axis must reproduce the single-device output."""
    import jax

    from vllm_i64_tpu.core.quantize_model import quantize_params
    from vllm_i64_tpu.parallel import (
        ParallelConfig,
        make_mesh,
        shard_params,
    )

    cfg, params = setup
    qparams = quantize_params(params, cfg, "int8")
    tokens = jnp.asarray([[5, 17, 42, 7]], jnp.int32)
    want = np.asarray(cdm.forward(qparams, cfg, tokens))

    mesh = make_mesh(ParallelConfig(dp=1, ep=2, tp=4))
    sharded = shard_params(qparams, cfg, mesh)
    # flat expert payloads actually got the merged spec
    gate = sharded["layers"]["mlp"]["gate"]
    assert gate.q.ndim == 3  # (L, H, E*I)
    with jax.set_mesh(mesh):
        got = np.asarray(cdm.forward(sharded, cfg, tokens))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sharded_fused_qkv(setup):
    """Fused QKV weight under tp sharding matches unfused output."""
    import jax

    from vllm_i64_tpu.core.quantize_model import fuse_qkv_params
    from vllm_i64_tpu.parallel import (
        ParallelConfig,
        make_mesh,
        shard_params,
    )

    cfg, params = setup
    fused = fuse_qkv_params(params)
    tokens = jnp.asarray([[9, 8, 7]], jnp.int32)
    want = np.asarray(cdm.forward(params, cfg, tokens))

    mesh = make_mesh(ParallelConfig(dp=2, ep=1, tp=4))
    sharded = shard_params(fused, cfg, mesh)
    with jax.set_mesh(mesh):
        got = np.asarray(cdm.forward(sharded, cfg, tokens))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ragged EP all-to-all dispatch (ops/ep_dispatch.py)
# ---------------------------------------------------------------------------


class TestEPAllToAll:
    def _setup(self, E=16, K=2, N=24, H=32, I=16, vocab=128, seed=0):
        import numpy as _np

        rng = _np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, vocab, N), jnp.int32)
        gate = jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32)
        up = jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32)
        down = jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32)
        # balanced-hash-like table: permuted strides, replicated, bit-exact
        table = jnp.asarray(
            _np.stack([(rng.permutation(vocab)) % E for _ in range(K)]),
            jnp.int32)
        return x, ids, gate, up, down, table

    def _masked_dense_routed(self, x, ids, gate, up, down, table, E, vocab, w0):
        from vllm_i64_tpu.ops.moe import token_routed_mlp

        return token_routed_mlp(
            x, ids, gate_w=gate, up_w=up, down_w=down, topk_table=table,
            num_experts=E, vocab_size=vocab, primary_weight=w0,
        )

    def test_matches_masked_dense(self):
        from vllm_i64_tpu.config import ModelConfig
        from vllm_i64_tpu.ops.ep_dispatch import make_ep_routed_mlp
        from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh

        E, vocab = 16, 128
        x, ids, gate, up, down, table = self._setup(E=E, vocab=vocab)
        cfg = ModelConfig(vocab_size=vocab, num_experts=E, top_k=2,
                          top_k_primary_weight=0.7)
        mesh = make_mesh(ParallelConfig(dp=1, ep=8, tp=1))
        # lossless capacity (C = K*N) so parity with masked dense is exact
        fn = jax.jit(make_ep_routed_mlp(mesh, cfg, capacity_factor=8.0))
        got = fn(x, ids, gate, up, down, table)
        want = self._masked_dense_routed(
            x, ids, gate, up, down, table, E, vocab, cfg.primary_weight)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_top1_and_duplicate_routes(self):
        from vllm_i64_tpu.config import ModelConfig
        from vllm_i64_tpu.ops.ep_dispatch import make_ep_routed_mlp
        from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh
        import numpy as _np

        E, vocab, K = 8, 64, 3
        x, ids, gate, up, down, _ = self._setup(E=E, vocab=vocab, K=K)
        # duplicate routes: all K routes of token id t map to the SAME
        # expert -> additive accumulation must match masked dense
        table = jnp.asarray(
            _np.broadcast_to(_np.arange(vocab) % E, (K, vocab)).copy(),
            jnp.int32)
        cfg = ModelConfig(vocab_size=vocab, num_experts=E, top_k=K,
                          top_k_primary_weight=0.5)
        mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=1))
        fn = jax.jit(make_ep_routed_mlp(mesh, cfg, capacity_factor=4.0))
        got = fn(x, ids, gate, up, down, table)
        want = self._masked_dense_routed(
            x, ids, gate, up, down, table, E, vocab, cfg.primary_weight)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_capacity_overflow_drops_not_crashes(self):
        from vllm_i64_tpu.ops.ep_dispatch import ep_all_to_all_routed_experts
        from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        import numpy as _np

        E, vocab, N, H, I = 8, 64, 16, 32, 16
        x, ids, gate, up, down, _ = self._setup(E=E, vocab=vocab, N=N, H=H, I=I)
        # adversarial table: EVERY route to expert 0 -> one device gets all
        # K*N pairs; with capacity_factor ~1/D the overflow must drop quietly
        table = jnp.zeros((2, vocab), jnp.int32)
        mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=1))
        fn = shard_map(
            lambda x, ids, g, u, dn, t: ep_all_to_all_routed_experts(
                x, ids, gate_w=g, up_w=u, down_w=dn, topk_table=t,
                num_experts=E, vocab_size=vocab, primary_weight=0.5,
                capacity_factor=0.3),
            mesh=mesh,
            in_specs=(P(), P(), P("ep"), P("ep"), P("ep"), P()),
            out_specs=P(), check_rep=False)
        out = np.asarray(jax.jit(fn)(x, ids, gate, up, down, table))
        assert out.shape == (N, H)
        assert _np.isfinite(out).all()
