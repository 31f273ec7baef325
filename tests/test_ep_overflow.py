"""EP all-to-all capacity overflow: observe, test, bound (VERDICT r3 #6).

Overflow must never be silent: the dispatch returns an exact on-device
dropped-pair count, the host mirror (count_ep_overflow) predicts it exactly
from (token_ids, table), a table audit yields a provably drop-free capacity
factor, padding tokens never evict real pairs, and the engine polices the
whole thing per ModelConfig.ep_overflow_policy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.ops import ep_dispatch
from vllm_i64_tpu.ops.moe import token_routed_mlp
from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh, shard_params

E, K, VOCAB, H, I = 8, 2, 64, 32, 8
EP = 8


def make_weights(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "gate": jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((E, H, I)) * 0.1, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32),
    }


def balanced_table():
    ids = np.arange(VOCAB, dtype=np.int64)
    return jnp.asarray(np.stack([(ids + r) % E for r in range(K)]))


def skewed_table(hot_expert=0):
    """Adversarial: every route of every token lands on one expert."""
    return jnp.full((K, VOCAB), hot_expert, jnp.int64)


@pytest.fixture(autouse=True)
def _restore_ep_mesh():
    prev = ep_dispatch.get_ep_mesh()
    yield
    ep_dispatch.set_ep_mesh(prev)


def run_dispatch(table, token_ids, capacity_factor=1.5, valid=None,
                 weights=None):
    mesh = make_mesh(ParallelConfig(dp=1, ep=EP, tp=1))
    ep_dispatch.set_ep_mesh(mesh)
    w = weights or make_weights()
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((len(token_ids), H)),
        jnp.float32)
    routed, dropped = ep_dispatch.ep_routed_experts(
        x, jnp.asarray(token_ids, jnp.int32),
        gate_w=w["gate"], up_w=w["up"], down_w=w["down"],
        topk_table=table, num_experts=E, vocab_size=VOCAB,
        primary_weight=0.5, capacity_factor=capacity_factor,
        return_overflow=True,
        valid=None if valid is None else jnp.asarray(valid),
    )
    return np.asarray(routed), int(dropped), x


class TestDeviceCounter:
    def test_balanced_table_no_drops_and_exact_output(self):
        ids = np.arange(16) % VOCAB
        table = balanced_table()
        w = make_weights()
        routed, dropped, x = run_dispatch(table, ids, weights=w)
        assert dropped == 0
        # exactness vs the masked-dense path when nothing drops
        want = token_routed_mlp(
            x, jnp.asarray(ids, jnp.int32), gate_w=w["gate"], up_w=w["up"],
            down_w=w["down"], topk_table=table, num_experts=E,
            vocab_size=VOCAB, primary_weight=0.5)
        np.testing.assert_allclose(routed, np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_skewed_table_counts_match_host_mirror(self):
        ids = np.zeros(16, np.int64)  # all pairs -> expert 0's device
        table = skewed_table()
        _, dropped, _ = run_dispatch(table, ids)
        want = ep_dispatch.count_ep_overflow(
            ids, table, num_experts=E, ep_size=EP, capacity_factor=1.5)
        assert dropped == want > 0

    @pytest.mark.parametrize("cf", [1.0, 1.5, 3.0])
    def test_mirror_matches_at_every_capacity(self, cf):
        rng = np.random.default_rng(7)
        ids = rng.integers(0, VOCAB, 24)
        # half-skewed table: tokens < VOCAB//2 all go to expert 1
        t = np.asarray(balanced_table()).copy()
        t[:, : VOCAB // 2] = 1
        table = jnp.asarray(t)
        _, dropped, _ = run_dispatch(table, ids, capacity_factor=cf)
        want = ep_dispatch.count_ep_overflow(
            ids, table, num_experts=E, ep_size=EP, capacity_factor=cf)
        assert dropped == want

    def test_dropped_pairs_degrade_not_corrupt(self):
        """Overflow removes expert terms from affected tokens only; tokens
        routed to cold devices keep exact outputs."""
        t = np.asarray(balanced_table()).copy()
        t[:, :32] = 0  # tokens 0..31: both routes -> expert 0 (hot)
        table = jnp.asarray(t)
        # cold tokens: routes (id+r)%8 for 41..44 are {1,2},{2,3},{3,4},
        # {4,5} — none lands on the hot device 0
        ids = np.concatenate([np.zeros(12, np.int64), [41, 42, 43, 44]])
        w = make_weights()
        routed, dropped, x = run_dispatch(table, ids, weights=w)
        assert dropped > 0
        want = token_routed_mlp(
            x, jnp.asarray(ids, jnp.int32), gate_w=w["gate"], up_w=w["up"],
            down_w=w["down"], topk_table=table, num_experts=E,
            vocab_size=VOCAB, primary_weight=0.5)
        # cold-device tokens (40..43 route to experts 40%8..43%8 != 0): exact
        np.testing.assert_allclose(routed[12:], np.asarray(want)[12:],
                                   rtol=1e-5, atol=1e-5)
        # at least one hot token lost a term
        assert not np.allclose(routed[:12], np.asarray(want)[:12], atol=1e-6)


class TestAudit:
    def test_audit_balanced(self):
        a = ep_dispatch.audit_route_table(
            balanced_table(), num_experts=E, ep_size=EP)
        assert a["max_same_device_routes"] == 1
        assert a["safe_capacity_factor"] == pytest.approx(EP / K)
        assert a["skew"] == pytest.approx(1.0)

    def test_audit_skewed(self):
        a = ep_dispatch.audit_route_table(
            skewed_table(), num_experts=E, ep_size=EP)
        assert a["max_same_device_routes"] == K
        assert a["safe_capacity_factor"] == pytest.approx(EP)
        assert a["skew"] == pytest.approx(EP)

    def test_safe_capacity_factor_never_drops(self):
        """The audit bound makes dropping impossible even for the
        adversarial all-same-token batch."""
        table = skewed_table()
        a = ep_dispatch.audit_route_table(table, num_experts=E, ep_size=EP)
        ids = np.zeros(16, np.int64)
        _, dropped, _ = run_dispatch(
            table, ids, capacity_factor=a["safe_capacity_factor"])
        assert dropped == 0
        assert ep_dispatch.count_ep_overflow(
            ids, table, num_experts=E, ep_size=EP,
            capacity_factor=a["safe_capacity_factor"]) == 0


class TestValidMask:
    def test_padding_tokens_claim_no_slots(self):
        """Bucket-pad rows must not evict real pairs: 8 real tokens + 8 pads
        whose token id routes to the same hot device. Without the mask the
        pads occupy capacity slots; with it the real tokens survive."""
        t = np.asarray(balanced_table()).copy()
        t[:, 0] = 3  # pad token id 0 routes (both k) to expert 3
        t[:, 10] = 3  # the real token routes there too
        table = jnp.asarray(t)
        ids = np.concatenate([np.full(8, 10, np.int64), np.zeros(8, np.int64)])
        valid = np.concatenate([np.ones(8, bool), np.zeros(8, bool)])
        # capacity for 16 tokens at factor 0.5: ceil(32/8)*0.5 = 2 slots
        routed_m, dropped_m, x = run_dispatch(
            table, ids, capacity_factor=0.5, valid=valid)
        routed_nm, dropped_nm, _ = run_dispatch(
            table, ids, capacity_factor=0.5)
        # masked: 16 real pairs -> device 3 holds 2 slots, 14 real drop
        assert dropped_m == 14
        # unmasked: pads also claim slots -> MORE total drops counted
        assert dropped_nm == 30
        # and with the mask, the kept slots belong to real tokens: the
        # first real token's output is nonzero (it won a slot)
        assert np.abs(routed_m[0]).sum() > 0

    def test_model_forward_threads_valid(self):
        """forward() with bucket padding: the EP backend must produce the
        same logits for the real tokens whether or not pad columns exist."""
        cfg = ModelConfig(
            vocab_size=VOCAB, hidden_size=H, intermediate_size=E * I,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=32,
            num_experts=E, top_k=K, shared_expert=False,
            moe_backend="ep_a2a",
            # tight capacity so pad eviction would be visible
            ep_capacity_factor=1.0,
        )
        params = cdm.init_params(cfg, jax.random.PRNGKey(3))
        mesh = make_mesh(ParallelConfig(dp=1, ep=EP, tp=1))
        sharded = shard_params(params, cfg, mesh)
        ep_dispatch.set_ep_mesh(mesh)
        # deterministic layout under the cyclic init table: real tokens
        # 8..15 spread exactly 2 pairs per device (never drop at factor 1
        # whether capacity is sized for N=8 or the padded N=16), while the
        # pad token id 0 hammers devices 0/1 — without the valid threading
        # its pairs would outrank and evict token 15's second route
        real = np.arange(8, 16)[None]
        toks = np.zeros((1, 16), np.int64)
        toks[:, :8] = real
        valid = np.zeros((1, 16), bool)
        valid[:, :8] = True
        got = cdm.forward(sharded, cfg, jnp.asarray(toks, jnp.int32),
                          valid=jnp.asarray(valid))
        want = cdm.forward(sharded, cfg, jnp.asarray(real, jnp.int32))
        np.testing.assert_allclose(np.asarray(got)[0, :8],
                                   np.asarray(want)[0],
                                   rtol=2e-4, atol=2e-4)


def ep_engine(policy, table=None, capacity_factor=1.5):
    cfg = ModelConfig(
        vocab_size=VOCAB, hidden_size=H, intermediate_size=E * I,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, num_experts=E, top_k=K,
        shared_expert=True, moe_backend="ep_a2a",
        ep_overflow_policy=policy, ep_capacity_factor=capacity_factor,
    )
    params = cdm.init_params(cfg, jax.random.PRNGKey(11))
    if table is not None:
        rt = jnp.broadcast_to(
            table[None], (cfg.num_hidden_layers, K, VOCAB))
        params["layers"]["mlp"]["route_table"] = jnp.asarray(rt)
    mesh = make_mesh(ParallelConfig(dp=1, ep=EP, tp=1))
    sharded = shard_params(params, cfg, mesh)
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=64, kv_block_size=8, max_kv_blocks=64,
        max_prefill_tokens=32, decode_batch_buckets=(1, 4),
        prefill_batch_buckets=(1, 4), prefill_token_buckets=(16, 32),
        multistep_decode=4, decode_chaining=False,
        enable_request_merging=False,
    )
    return Engine(sharded, cfg, ecfg, mesh=mesh), cfg


class TestEnginePolicy:
    def test_warn_policy_counts_overflow(self):
        eng, _ = ep_engine("warn", table=skewed_table())
        out = eng.generate([5, 6, 7, 8, 9, 10, 11, 12],
                           SamplingParams(temperature=0.0, max_tokens=4))
        assert len(out.output_tokens) > 0
        assert eng.get_stats()["step_mix"]["ep_overflow_pairs"] > 0

    def test_error_policy_fails_step_before_dispatch(self):
        eng, _ = ep_engine("error", table=skewed_table())
        with pytest.raises(RuntimeError, match="ep_a2a capacity overflow"):
            eng.add_request(list(range(3, 11)),
                            SamplingParams(temperature=0.0, max_tokens=4))
            eng.step()

    def test_never_drop_raises_capacity_at_init(self):
        eng, _ = ep_engine("never_drop", table=skewed_table())
        assert eng.model_config.ep_capacity_factor == pytest.approx(EP)
        out = eng.generate([5, 6, 7, 8, 9, 10, 11, 12],
                           SamplingParams(temperature=0.0, max_tokens=4))
        assert len(out.output_tokens) > 0
        assert eng.get_stats()["step_mix"]["ep_overflow_pairs"] == 0

    def test_balanced_table_stays_quiet(self):
        eng, _ = ep_engine("warn", table=np.asarray(balanced_table()))
        out = eng.generate([5, 6, 7, 8, 9, 10, 11, 12],
                           SamplingParams(temperature=0.0, max_tokens=4))
        assert len(out.output_tokens) > 0
        assert eng.get_stats()["step_mix"]["ep_overflow_pairs"] == 0
