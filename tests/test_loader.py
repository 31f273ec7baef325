"""Checkpoint loader tests: reference-format state dicts -> JAX pytrees.

Mirrors the reference loader's guarantees (ref: vllm_i64/core/loader.py):
exact route-table load, tied embeddings, framework-format conversion,
strict missing/unloaded reporting, multi-format files.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import ModelConfig
from vllm_i64_tpu.core.loader import (
    build_params,
    convert_framework_weights,
    load_model,
    load_state_dict,
)
from vllm_i64_tpu.models import complexity_deep as cdm


def make_reference_state_dict(cfg: ModelConfig, rng, prefix=""):
    """Synthesize a checkpoint in the reference's native export format:
    torch Linear orientation (out, in), keys as in ComplexityDeepModel
    (ref: models/complexity_deep/model.py:310-390)."""
    H = cfg.hidden_size
    d = cfg.head_dim
    Hq = cfg.num_attention_heads * d
    Hkv = cfg.num_key_value_heads * d
    E, K, V = cfg.num_experts, cfg.effective_top_k, cfg.vocab_size
    I = cfg.expert_intermediate_size
    S = cfg.resolved_shared_intermediate_size

    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {f"{prefix}embed_tokens.weight": w(V, H), f"{prefix}norm.weight": np.ones(H, np.float32)}
    for i in range(cfg.num_hidden_layers):
        p = f"{prefix}layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = w(Hq, H)
        sd[p + "self_attn.k_proj.weight"] = w(Hkv, H)
        sd[p + "self_attn.v_proj.weight"] = w(Hkv, H)
        sd[p + "self_attn.o_proj.weight"] = w(H, Hq)
        if cfg.use_qk_norm:
            sd[p + "self_attn.q_norm.weight"] = np.ones(d, np.float32)
            sd[p + "self_attn.k_norm.weight"] = np.ones(d, np.float32)
        if cfg.use_token_routed_mlp and E > 1:
            sd[p + "mlp.gate_proj_w"] = w(E, H, I)
            sd[p + "mlp.up_proj_w"] = w(E, H, I)
            sd[p + "mlp.down_proj_w"] = w(E, I, H)
            # random (non-cyclic) exact routing tables — must load verbatim
            sd[p + "mlp.topk_token_to_expert"] = rng.integers(
                0, E, size=(K, V)).astype(np.int64)
            if cfg.shared_expert:
                sd[p + "mlp.shared_gate.weight"] = w(S, H)
                sd[p + "mlp.shared_up.weight"] = w(S, H)
                sd[p + "mlp.shared_down.weight"] = w(H, S)
        else:
            sd[p + "mlp.gate_proj.weight"] = w(cfg.intermediate_size, H)
            sd[p + "mlp.up_proj.weight"] = w(cfg.intermediate_size, H)
            sd[p + "mlp.down_proj.weight"] = w(H, cfg.intermediate_size)
    return sd


def test_build_params_matches_layout(tiny_config, rng):
    sd = make_reference_state_dict(tiny_config, rng)
    params, stats = build_params(tiny_config, sd, dtype=jnp.float32)
    ref = cdm.init_params(tiny_config, __import__("jax").random.PRNGKey(0))
    # identical pytree structure
    import jax

    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(ref)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(ref),
    ):
        assert a.shape == b.shape, f"{ka}: {a.shape} vs {b.shape}"
    assert stats["unloaded_params"] == 0
    assert stats["missing_in_model"] == 0


def test_exact_route_tables_loaded(tiny_config, rng):
    sd = make_reference_state_dict(tiny_config, rng)
    params, _ = build_params(tiny_config, sd, dtype=jnp.float32)
    for i in range(tiny_config.num_hidden_layers):
        expected = sd[f"layers.{i}.mlp.topk_token_to_expert"].astype(np.int32)
        got = np.asarray(params["layers"]["mlp"]["route_table"][i])
        np.testing.assert_array_equal(got, expected)


def test_transpose_orientation(tiny_config, rng):
    """torch (out, in) -> jax (in, out): q_proj applied to a vector must
    match a manual matmul with the untransposed checkpoint weight."""
    sd = make_reference_state_dict(tiny_config, rng)
    params, _ = build_params(tiny_config, sd, dtype=jnp.float32)
    x = rng.standard_normal(tiny_config.hidden_size).astype(np.float32)
    wq_torch = sd["layers.0.self_attn.q_proj.weight"]
    expected = wq_torch @ x  # torch semantics: W @ x
    got = np.asarray(x @ np.asarray(params["layers"]["q"][0]))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_model_prefix_stripped(tiny_config, rng):
    sd = make_reference_state_dict(tiny_config, rng, prefix="model.")
    params, stats = build_params(tiny_config, sd, dtype=jnp.float32)
    assert stats["unloaded_params"] == 0


def test_tied_embeddings_via_lm_head(tiny_config, rng):
    sd = make_reference_state_dict(tiny_config, rng)
    emb = sd.pop("embed_tokens.weight")
    sd["lm_head.weight"] = emb
    params, stats = build_params(tiny_config, sd, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(params["embed"]), emb, rtol=1e-6)
    assert stats["unloaded_params"] == 0


def test_legacy_primary_route_derivation(tiny_config, rng):
    """Legacy checkpoints store only token_to_expert (V,); route k must be
    (primary + k) % E (ref: loader.py:389-407)."""
    sd = make_reference_state_dict(tiny_config, rng)
    E = tiny_config.num_experts
    for i in range(tiny_config.num_hidden_layers):
        key = f"layers.{i}.mlp.topk_token_to_expert"
        primary = sd.pop(key)[0]
        sd[f"layers.{i}.mlp.token_to_expert"] = primary
    params, _ = build_params(tiny_config, sd, dtype=jnp.float32)
    table = np.asarray(params["layers"]["mlp"]["route_table"])
    for i in range(tiny_config.num_hidden_layers):
        primary = sd[f"layers.{i}.mlp.token_to_expert"]
        for k in range(tiny_config.effective_top_k):
            np.testing.assert_array_equal(table[i, k], (primary + k) % E)


def test_framework_format_conversion(tiny_config, rng):
    """mlp.experts.N.{gate,up,down}_proj.weight -> stacked (E,H,I)/(E,I,H)
    (ref: loader.py:192-280)."""
    cfg = tiny_config
    H, I, E = cfg.hidden_size, cfg.expert_intermediate_size, cfg.num_experts
    sd = {}
    per_expert = {}
    for e in range(E):
        g = rng.standard_normal((I, H)).astype(np.float32)
        u = rng.standard_normal((I, H)).astype(np.float32)
        d = rng.standard_normal((H, I)).astype(np.float32)
        per_expert[e] = (g, u, d)
        sd[f"layers.0.mlp.experts.{e}.gate_proj.weight"] = g
        sd[f"layers.0.mlp.experts.{e}.up_proj.weight"] = u
        sd[f"layers.0.mlp.experts.{e}.down_proj.weight"] = d
    out = convert_framework_weights(sd)
    assert out["layers.0.mlp.gate_proj_w"].shape == (E, H, I)
    assert out["layers.0.mlp.down_proj_w"].shape == (E, I, H)
    for e in range(E):
        np.testing.assert_allclose(
            out["layers.0.mlp.gate_proj_w"][e], per_expert[e][0].T)
        np.testing.assert_allclose(
            out["layers.0.mlp.down_proj_w"][e], per_expert[e][2].T)


def test_strict_mode_raises_on_missing(tiny_config, rng, tmp_path):
    sd = make_reference_state_dict(tiny_config, rng)
    del sd["layers.0.self_attn.q_proj.weight"]
    from safetensors.numpy import save_file

    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "vocab_size": tiny_config.vocab_size,
        "hidden_size": tiny_config.hidden_size,
        "intermediate_size": tiny_config.intermediate_size,
        "num_hidden_layers": tiny_config.num_hidden_layers,
        "num_attention_heads": tiny_config.num_attention_heads,
        "num_key_value_heads": tiny_config.num_key_value_heads,
        "num_experts": tiny_config.num_experts,
        "top_k": tiny_config.top_k,
        "shared_expert": True,
        "use_qk_norm": True,
    }))
    with pytest.raises(RuntimeError):
        load_model(str(tmp_path), strict=True)


def test_load_model_end_to_end_safetensors(tiny_config, rng, tmp_path):
    """Full path: save reference-format safetensors + config.json, load,
    run a forward pass."""
    import jax

    sd = make_reference_state_dict(tiny_config, rng)
    from safetensors.numpy import save_file

    save_file(sd, str(tmp_path / "model.safetensors"))
    cfg_dict = {
        "model_type": "complexity-deep",
        "vocab_size": tiny_config.vocab_size,
        "hidden_size": tiny_config.hidden_size,
        "intermediate_size": tiny_config.intermediate_size,
        "num_hidden_layers": tiny_config.num_hidden_layers,
        "num_attention_heads": tiny_config.num_attention_heads,
        "num_key_value_heads": tiny_config.num_key_value_heads,
        "max_position_embeddings": tiny_config.max_position_embeddings,
        "num_experts": tiny_config.num_experts,
        "top_k": tiny_config.top_k,
        "shared_expert": True,
        "use_qk_norm": True,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))

    params, cfg, stats = load_model(str(tmp_path), dtype=jnp.float32)
    assert cfg.vocab_size == tiny_config.vocab_size
    assert stats["unloaded_params"] == 0

    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    logits = cdm.forward(params, cfg, tokens)
    assert logits.shape == (2, 8, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_load_torch_bin(tiny_config, rng, tmp_path):
    torch = pytest.importorskip("torch")
    sd = make_reference_state_dict(tiny_config, rng)
    torch_sd = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    torch.save(torch_sd, str(tmp_path / "pytorch_model.bin"))
    loaded = load_state_dict(str(tmp_path))
    assert set(loaded) == set(sd)
    np.testing.assert_allclose(loaded["embed_tokens.weight"],
                               sd["embed_tokens.weight"])
