"""Model-architecture variant matrix (ref analog: tests/test_model.py's 28
shape/feature forwards): every ModelConfig axis the loader can produce must
forward cleanly and respect its semantic (GQA grouping, rope theta, QK
norm, sliding window, tied vs untied head, top-k mixing weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import ModelConfig
from vllm_i64_tpu.models import complexity_deep as cdm


def _fwd(cfg, seed=0, b=2, t=8):
    params = cdm.init_params(cfg, jax.random.PRNGKey(seed))
    toks = jnp.asarray(
        np.random.default_rng(1).integers(3, cfg.vocab_size - 1, size=(b, t)),
        jnp.int32)
    out = cdm.forward(params, cfg, toks)
    assert out.shape == (b, t, cfg.vocab_size)
    assert bool(jnp.isfinite(out).all())
    return params, toks, out


def _base(**kw):
    d = dict(vocab_size=256, hidden_size=128, intermediate_size=256,
             num_hidden_layers=2, num_attention_heads=8,
             num_key_value_heads=2, max_position_embeddings=64,
             num_experts=4, top_k=2, shared_expert=True)
    d.update(kw)
    return ModelConfig(**d)


@pytest.mark.parametrize("kv_heads", [1, 2, 4, 8])
def test_gqa_group_sizes(kv_heads):
    _fwd(_base(num_key_value_heads=kv_heads))


@pytest.mark.parametrize("theta", [1e4, 5e5])
def test_rope_theta_changes_logits(theta):
    cfg_a = _base(rope_theta=1e4)
    cfg_b = _base(rope_theta=theta)
    pa, toks, out_a = _fwd(cfg_a)
    out_b = cdm.forward(pa, cfg_b, toks)
    if theta == 1e4:
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    else:
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_qk_norm_off():
    _fwd(_base(use_qk_norm=False))


def test_sliding_window_masks_history():
    cfg = _base(sliding_window=4)
    params, toks, _ = _fwd(cfg, t=12)
    # last-token logits must be invariant to tokens older than the window
    toks2 = np.asarray(toks).copy()
    toks2[:, 0] = 250  # far outside every window at position 11
    out_a = cdm.forward(params, cfg, toks)
    out_b = cdm.forward(params, cfg, jnp.asarray(toks2))
    np.testing.assert_allclose(
        np.asarray(out_a)[:, -1], np.asarray(out_b)[:, -1],
        rtol=1e-5, atol=1e-5)


def test_no_sliding_window_sees_history():
    cfg = _base()
    params, toks, _ = _fwd(cfg, t=12)
    toks2 = np.asarray(toks).copy()
    toks2[:, 0] = 250
    out_a = cdm.forward(params, cfg, toks)
    out_b = cdm.forward(params, cfg, jnp.asarray(toks2))
    assert not np.allclose(np.asarray(out_a)[:, -1], np.asarray(out_b)[:, -1])


def test_untied_lm_head():
    cfg = _base(tie_word_embeddings=False)
    params, _, _ = _fwd(cfg)
    assert "lm_head" in params


@pytest.mark.parametrize("top_k,primary", [(1, None), (2, 0.5), (2, 0.95),
                                           (3, 0.6), (4, 0.25)])
def test_topk_mixing_weights(top_k, primary):
    cfg = _base(top_k=top_k, top_k_primary_weight=primary)
    _fwd(cfg)
    if top_k > 1:
        w0 = cfg.primary_weight
        assert 0.0 <= w0 <= 1.0
        # remaining routes share (1 - w0) evenly
        assert abs(w0 + (top_k - 1) * ((1 - w0) / (top_k - 1)) - 1) < 1e-9


def test_shared_routed_learnable_gates():
    cfg = _base(use_shared_routed_gates=True, shared_gate_init=0.7,
                routed_gate_init=1.3)
    params, toks, out = _fwd(cfg)
    assert "shared_gate_scalar" in params["layers"]["mlp"]


def test_output_scales_change_logits():
    cfg_a = _base()
    cfg_b = _base(shared_output_scale=0.5, routed_output_scale=2.0)
    params, toks, out_a = _fwd(cfg_a)
    out_b = cdm.forward(params, cfg_b, toks)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_no_shared_expert():
    _fwd(_base(shared_expert=False))


def test_single_expert_degenerates_to_dense():
    _fwd(_base(use_token_routed_mlp=False, num_experts=1,
               shared_expert=False))


def test_mu_guidance_threads_state():
    cfg = _base(use_mu_guidance=True)
    params, toks, out = _fwd(cfg)
    assert "mu_init" in params
    # disable flag produces a different forward (mu biases removed)
    cfg_off = _base(use_mu_guidance=True, disable_mu_guidance=True)
    out_off = cdm.forward(params, cfg_off, toks)
    assert not np.allclose(np.asarray(out), np.asarray(out_off))


def test_vocab_clipping_out_of_range_ids():
    cfg = _base()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray([[5, 9999, -3, 7]], jnp.int32)
    out = cdm.forward(params, cfg, toks)
    assert bool(jnp.isfinite(out).all())


def test_from_dict_framework_format():
    cfg = ModelConfig.from_dict({
        "vocab_size": 512, "hidden_size": 128, "intermediate_size": 256,
        "num_hidden_layers": 3, "num_attention_heads": 4,
        "num_key_value_heads": 2, "mlp_type": "token_routed",
        "num_experts": 8, "top_k": 2, "norm_eps": 1e-5,
        "parameters": "ignored", "unknown_key": 1,
    })
    assert cfg.use_token_routed_mlp and cfg.num_experts == 8
    assert cfg.rms_norm_eps == 1e-5


def test_from_dict_dense_format():
    cfg = ModelConfig.from_dict({
        "vocab_size": 512, "hidden_size": 128, "mlp_type": "swiglu",
    })
    assert not cfg.use_token_routed_mlp and cfg.num_experts == 1
