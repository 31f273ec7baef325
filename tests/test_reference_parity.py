"""Cross-framework parity: the torch reference model and this JAX model must
produce matching logits from IDENTICAL weights.

This is the executable form of the north-star bit-exactness requirement
(SURVEY §6: INT8 perplexity delta <= 0.01 starts with fp32 logit parity).
The reference implementation at /root/reference is imported directly and
its state_dict round-trips through our checkpoint loader.

Skipped automatically when the reference tree or torch is unavailable.
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
try:
    from vllm_i64.models.complexity_deep.config import ComplexityDeepConfig
    from vllm_i64.models.complexity_deep.model import ComplexityDeepModel

    HAS_REFERENCE = True
except Exception:  # pragma: no cover
    HAS_REFERENCE = False

pytestmark = pytest.mark.skipif(not HAS_REFERENCE,
                                reason="reference tree not importable")

import jax.numpy as jnp  # noqa: E402

from vllm_i64_tpu.config import ModelConfig  # noqa: E402
from vllm_i64_tpu.core.loader import build_params  # noqa: E402
from vllm_i64_tpu.models import complexity_deep as cdm  # noqa: E402


def make_pair(seed=0, **overrides):
    """Build (torch reference model, our params, our config) with shared
    weights."""
    kw = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=64,
              num_experts=4, top_k=2, shared_expert=True, use_qk_norm=True,
              tie_word_embeddings=True)
    kw.update(overrides)
    torch.manual_seed(seed)
    ref_cfg = ComplexityDeepConfig(**kw)
    ref_model = ComplexityDeepModel(ref_cfg).eval()

    sd = {k: v.detach().cpu().float().numpy()
          for k, v in ref_model.state_dict().items()}
    my_cfg = ModelConfig(**kw)
    params, stats = build_params(my_cfg, sd, dtype=jnp.float32)
    assert stats["unloaded_params"] == 0, stats["missing_keys"]
    return ref_model, params, my_cfg


def ref_logits(ref_model, token_ids):
    with torch.no_grad():
        out = ref_model(torch.tensor(token_ids, dtype=torch.long))
    return out.float().numpy()  # (T, V)


def my_logits(params, cfg, token_ids):
    ids = jnp.asarray([token_ids], jnp.int32)
    return np.asarray(cdm.forward(params, cfg, ids))[0]  # (T, V)


def assert_logits_match(a, b, rtol=2e-4, atol=2e-4):
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
    # argmax agreement — the property sampling actually depends on
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_routed_model_logits_match():
    ref_model, params, cfg = make_pair()
    tokens = [5, 17, 42, 7, 9, 11, 13, 2]
    assert_logits_match(ref_logits(ref_model, tokens),
                        my_logits(params, cfg, tokens))


def test_dense_model_logits_match():
    ref_model, params, cfg = make_pair(
        num_experts=1, shared_expert=False, use_qk_norm=False)
    tokens = [3, 1, 4, 1, 5, 9, 2, 6]
    assert_logits_match(ref_logits(ref_model, tokens),
                        my_logits(params, cfg, tokens))


def test_no_qk_norm_variant_matches():
    ref_model, params, cfg = make_pair(use_qk_norm=False)
    tokens = [8, 6, 7, 5, 3, 0, 9]
    assert_logits_match(ref_logits(ref_model, tokens),
                        my_logits(params, cfg, tokens))


def test_top1_routing_matches():
    ref_model, params, cfg = make_pair(top_k=1)
    tokens = [2, 7, 1, 8, 2, 8]
    assert_logits_match(ref_logits(ref_model, tokens),
                        my_logits(params, cfg, tokens))


def test_route_tables_identical():
    """Routing decisions are bit-exact, not just close."""
    ref_model, params, cfg = make_pair()
    ref_table = (ref_model.layers[0].mlp.topk_token_to_expert
                 .detach().numpy())
    my_table = np.asarray(params["layers"]["mlp"]["route_table"][0])
    np.testing.assert_array_equal(my_table, ref_table.astype(np.int32))


def test_greedy_continuations_match():
    """16 greedy decode steps track the reference exactly."""
    ref_model, params, cfg = make_pair()
    tokens = [5, 17, 42]
    ref_seq = list(tokens)
    my_seq = list(tokens)
    for _ in range(16):
        r = int(ref_logits(ref_model, ref_seq)[-1].argmax())
        m = int(my_logits(params, cfg, my_seq)[-1].argmax())
        assert r == m
        ref_seq.append(r)
        my_seq.append(m)


def test_longer_random_prompts_match():
    ref_model, params, cfg = make_pair(seed=3)
    rng = np.random.default_rng(0)
    for _ in range(3):
        tokens = rng.integers(0, cfg.vocab_size, size=24).tolist()
        assert_logits_match(ref_logits(ref_model, tokens),
                            my_logits(params, cfg, tokens))


def test_int8_quantized_logits_close_to_reference_fp32():
    """INT8 path must stay within the quantization error envelope of the
    reference fp32 logits (precursor to the perplexity delta target)."""
    from vllm_i64_tpu.core.quantize_model import quantize_params

    ref_model, params, cfg = make_pair(seed=1)
    qparams = quantize_params(params, cfg, "int8")
    tokens = [5, 17, 42, 7, 9]
    ref = ref_logits(ref_model, tokens)
    mine = my_logits(qparams, cfg, tokens)
    # int8 per-channel error accumulates but must stay small at this scale
    assert np.abs(ref - mine).mean() < 0.05
    assert (ref.argmax(-1) == mine.argmax(-1)).mean() >= 0.8
