"""Learned-gate MoE as a servable model configuration.

Round-1 verdict: ops/learned_moe.py existed but was not selectable from
ModelConfig — standalone op only. It is now a routing_strategy
("learned_gate" / "learned_gate_integer") wired through init_params,
the layer stack, the loader, and the mesh specs
(ref: layers/moe.py MixtralMoE :133-233).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


def learned_cfg(**kw) -> ModelConfig:
    kw.setdefault("vocab_size", 128)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("intermediate_size", 128)
    kw.setdefault("num_hidden_layers", 2)
    kw.setdefault("num_attention_heads", 4)
    kw.setdefault("num_key_value_heads", 2)
    kw.setdefault("max_position_embeddings", 128)
    kw.setdefault("num_experts", 4)
    kw.setdefault("top_k", 2)
    kw.setdefault("use_token_routed_mlp", False)
    kw.setdefault("routing_strategy", "learned_gate")
    kw.setdefault("shared_expert", False)
    return ModelConfig(**kw)


def test_config_flag():
    cfg = learned_cfg()
    assert cfg.learned_moe_enabled
    assert not learned_cfg(routing_strategy="modulo_cyclic").learned_moe_enabled
    assert not learned_cfg(use_token_routed_mlp=True).learned_moe_enabled


def test_init_params_has_router():
    cfg = learned_cfg()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    mlp = params["layers"]["mlp"]
    assert mlp["router"].shape == (2, 64, 4)
    assert mlp["gate"].shape == (2, 4, 64, 32)
    assert "route_table" not in mlp


def test_forward_finite_and_router_sensitive():
    cfg = learned_cfg()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[5, 17, 42, 7]], jnp.int32)
    logits = cdm.forward(params, cfg, tokens)
    assert bool(jnp.isfinite(logits).all())

    # the router must actually drive the computation: perturbing it with a
    # LARGE shift (flipping top-k selections) changes the logits
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    mlp2 = dict(p2["layers"]["mlp"])
    key = jax.random.PRNGKey(9)
    mlp2["router"] = mlp2["router"] + jax.random.normal(
        key, mlp2["router"].shape) * 5.0
    layers2 = dict(p2["layers"])
    layers2["mlp"] = mlp2
    p2 = dict(p2)
    p2["layers"] = layers2
    logits2 = cdm.forward(p2, cfg, tokens)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_integer_softmax_variant():
    cfg = learned_cfg(routing_strategy="learned_gate_integer")
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    logits = cdm.forward(params, cfg, jnp.asarray([[5, 17, 42]], jnp.int32))
    assert bool(jnp.isfinite(logits).all())


def test_matches_direct_learned_moe_op():
    """The model's MLP block must equal calling the op directly on the
    post-norm hidden states."""
    from vllm_i64_tpu.models.complexity_deep import _mlp_block
    from vllm_i64_tpu.ops.learned_moe import learned_moe

    cfg = learned_cfg()
    params = cdm.init_params(cfg, jax.random.PRNGKey(1))
    mlp = {k: v[0] for k, v in params["layers"]["mlp"].items()}  # layer 0
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 64), jnp.float32)
    got = _mlp_block({"mlp": mlp}, cfg, x,
                     jnp.zeros((1, 6), jnp.int32))
    want = learned_moe(
        x.reshape(6, 64),
        gate_w=mlp["router"], expert_gate_w=mlp["gate"],
        expert_up_w=mlp["up"], expert_down_w=mlp["down"], top_k=2,
    ).reshape(1, 6, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_engine_serves_learned_moe():
    cfg = learned_cfg()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, kv_block_size=8, max_kv_blocks=32,
        max_prefill_tokens=32, dtype="float32", kv_cache_dtype="float32",
        decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
        prefill_token_buckets=(16,), multistep_decode=2,
        decode_chaining=False,
    )
    r = Engine(params, cfg, ecfg).generate(
        list(range(3, 12)), SamplingParams(temperature=0.0, max_tokens=6))
    assert len(r.output_tokens) == 6


def test_quantized_learned_moe():
    from vllm_i64_tpu.core.quantize_model import quantize_params

    cfg = learned_cfg()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params, cfg, "int8")
    from vllm_i64_tpu.ops.quant import QTensor

    assert isinstance(qp["layers"]["mlp"]["gate"], QTensor)
    assert not isinstance(qp["layers"]["mlp"]["router"], QTensor)  # float
    ref = np.asarray(cdm.forward(params, cfg,
                                 jnp.asarray([[5, 17, 42]], jnp.int32)))
    got = np.asarray(cdm.forward(qp, cfg,
                                 jnp.asarray([[5, 17, 42]], jnp.int32)))
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() < 0.5  # int8 envelope on tiny logits


def test_loader_maps_router_and_experts():
    from vllm_i64_tpu.core.loader import build_params

    cfg = learned_cfg()
    rng = np.random.default_rng(0)
    H, E, I = 64, 4, 32
    sd = {
        "embed_tokens.weight": rng.standard_normal((128, H)).astype(np.float32),
        "norm.weight": np.ones((H,), np.float32),
    }
    for layer in range(2):
        p = f"layers.{layer}"
        sd[f"{p}.input_layernorm.weight"] = np.ones((H,), np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones((H,), np.float32)
        for proj, shape in (("q_proj", (H, H)), ("k_proj", (32, H)),
                            ("v_proj", (32, H)), ("o_proj", (H, H))):
            sd[f"{p}.self_attn.{proj}.weight"] = rng.standard_normal(
                shape).astype(np.float32)
        for e in range(E):
            sd[f"{p}.mlp.experts.{e}.gate_proj.weight"] = rng.standard_normal(
                (I, H)).astype(np.float32)
            sd[f"{p}.mlp.experts.{e}.up_proj.weight"] = rng.standard_normal(
                (I, H)).astype(np.float32)
            sd[f"{p}.mlp.experts.{e}.down_proj.weight"] = rng.standard_normal(
                (H, I)).astype(np.float32)
        sd[f"{p}.mlp.router.weight"] = rng.standard_normal(
            (E, H)).astype(np.float32)

    params, stats = build_params(cfg, sd, dtype=jnp.float32)
    assert stats["unloaded_params"] == 0, stats["missing_keys"]
    mlp = params["layers"]["mlp"]
    assert mlp["router"].shape == (2, H, E)
    assert mlp["gate"].shape == (2, E, H, I)
    # orientation: router row 0 of torch (E, H) becomes column 0 of (H, E)
    np.testing.assert_allclose(
        np.asarray(mlp["router"][0][:, 1]),
        sd["layers.0.mlp.router.weight"][1], rtol=1e-6)


def test_mesh_sharded_forward_matches(tiny_config=None):
    from vllm_i64_tpu.parallel.mesh import (
        ParallelConfig,
        make_mesh,
        shard_params,
        validate_divisibility,
    )

    cfg = learned_cfg()
    pcfg = ParallelConfig(dp=1, ep=2, tp=2)
    validate_divisibility(cfg, pcfg)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(pcfg)
    sharded = shard_params(params, cfg, mesh)
    tokens = jnp.asarray([[5, 17, 42, 7]], jnp.int32)
    ref = cdm.forward(params, cfg, tokens)
    got = cdm.forward(sharded, cfg, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
