"""Learned-gate MoE + perplexity harness tests
(ref: vllm_i64/layers/moe.py MixtralMoE/IntegerMoE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.ops.learned_moe import (
    learned_gate_routing,
    learned_moe,
    modulo_routing,
)


@pytest.fixture()
def moe_weights(rng):
    e, h, i = 4, 32, 16

    def w(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)

    return dict(gate_w=w(h, e), expert_gate_w=w(e, h, i),
                expert_up_w=w(e, h, i), expert_down_w=w(e, i, h))


def test_learned_gate_topk_renormalized(moe_weights, rng):
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    w, idx = learned_gate_routing(x, moe_weights["gate_w"], top_k=2)
    assert w.shape == (8, 2) and idx.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(w)[:, 0] >= np.asarray(w)[:, 1])  # sorted


def test_integer_mode_routing_close_to_float(moe_weights, rng):
    x = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))
    wf, idxf = learned_gate_routing(x, moe_weights["gate_w"], top_k=2,
                                    integer_mode=False)
    wi, idxi = learned_gate_routing(x, moe_weights["gate_w"], top_k=2,
                                    integer_mode=True)
    # top-1 expert choice agrees except at quantization-boundary ties
    agree = (np.asarray(idxf)[:, 0] == np.asarray(idxi)[:, 0]).mean()
    assert agree > 0.9


def test_modulo_routing_deterministic():
    ids = jnp.asarray([0, 1, 5, 6], jnp.int32)
    w, idx = modulo_routing(ids, num_experts=4, top_k=2)
    np.testing.assert_array_equal(np.asarray(idx),
                                  [[0, 1], [1, 2], [1, 2], [2, 3]])
    np.testing.assert_allclose(np.asarray(w), 0.5)


def test_learned_moe_matches_explicit_dispatch(moe_weights, rng):
    """Masked-dense output == the reference's explicit per-expert loop."""
    x = np.asarray(rng.standard_normal((16, 32)), np.float32)
    out = np.asarray(learned_moe(jnp.asarray(x), top_k=2, **moe_weights))

    gw = np.asarray(moe_weights["gate_w"])
    eg = np.asarray(moe_weights["expert_gate_w"])
    eu = np.asarray(moe_weights["expert_up_w"])
    ed = np.asarray(moe_weights["expert_down_w"])
    logits = x @ gw
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.zeros_like(x)
    for n in range(x.shape[0]):
        top = np.argsort(-probs[n])[:2]
        wts = probs[n, top] / probs[n, top].sum()
        for e, wt in zip(top, wts):
            g = x[n] @ eg[e]
            u = x[n] @ eu[e]
            inter = (g / (1 + np.exp(-g))) * u
            want[n] += wt * (inter @ ed[e])
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_integer_moe_path(moe_weights, rng):
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    ids = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)
    out = learned_moe(x, gate_w=None, token_ids=ids, top_k=1,
                      expert_gate_w=moe_weights["expert_gate_w"],
                      expert_up_w=moe_weights["expert_up_w"],
                      expert_down_w=moe_weights["expert_down_w"])
    assert out.shape == (8, 32)
    # tokens 0 and 4 use the same expert (0 % 4 == 4 % 4) — same weights,
    # different inputs; tokens with the same input+expert give equal outputs
    out2 = learned_moe(x, gate_w=None, token_ids=ids + 4, top_k=1,
                       expert_gate_w=moe_weights["expert_gate_w"],
                       expert_up_w=moe_weights["expert_up_w"],
                       expert_down_w=moe_weights["expert_down_w"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_perplexity_harness(tiny_config):
    from vllm_i64_tpu.benchmarks.perplexity import (
        compare_quantization,
        evaluate_perplexity,
    )
    from vllm_i64_tpu.models import complexity_deep as cdm

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, tiny_config.vocab_size, 16).tolist()
            for _ in range(3)]
    base = evaluate_perplexity(params, tiny_config, seqs)
    assert base["perplexity"] > 1.0
    assert base["total_tokens"] == 45

    cmp = compare_quantization(params, tiny_config, seqs, methods=("int8",))
    assert "delta_vs_fp32" in cmp["int8"]
    # random-init model: int8 delta still bounded
    assert abs(cmp["int8"]["delta_vs_fp32"]) < base["perplexity"] * 0.2
