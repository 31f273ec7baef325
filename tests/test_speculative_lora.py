"""Speculative decoding + LoRA adapter tests
(ref: vllm_i64/core/speculative.py, layers/lora.py)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.core.speculative import SpeculativeDecoder
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


def make_engine(tiny_config, speculative=None, fuse_qkv=False, **kw):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=128, kv_block_size=4,
                        max_kv_blocks=96, max_prefill_tokens=64,
                        dtype="float32", kv_cache_dtype="float32",
                        decode_batch_buckets=(1, 2), prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16, 32, 64),
                        multistep_decode=1, fuse_qkv=fuse_qkv, **kw)
    return Engine(params, tiny_config, ecfg, speculative=speculative)


# ---------------------------------------------------------------------------
# speculative
# ---------------------------------------------------------------------------


def test_draft_is_greedy_continuation(tiny_config):
    """The draft must equal the model's own greedy continuation."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    spec = SpeculativeDecoder(params, tiny_config, num_speculative=3)
    context = [5, 17, 42, 7]
    draft = spec.draft(np.asarray(context))
    # reference greedy continuation by explicit full forwards
    cur = list(context)
    expected = []
    for _ in range(3):
        logits = cdm.forward(params, tiny_config,
                             jnp.asarray([cur], jnp.int32))
        tok = int(jnp.argmax(logits[0, -1]))
        expected.append(tok)
        cur.append(tok)
    assert list(draft) == expected


def test_accept_greedy_prefix_and_correction():
    spec = SpeculativeDecoder(None, None, num_speculative=3)
    draft = np.array([4, 7, 9])
    v = 12
    logits = np.full((4, v), -10.0, np.float32)
    logits[0, 4] = 5.0   # matches draft[0]
    logits[1, 2] = 5.0   # mismatch -> correction 2
    logits[2, 9] = 5.0
    logits[3, 1] = 5.0
    accepted, k = spec.accept(draft, logits, params=None)
    assert accepted == [4, 2]
    assert k == 3


def test_accept_all_gets_bonus():
    spec = SpeculativeDecoder(None, None, num_speculative=2)
    draft = np.array([3, 5])
    logits = np.full((3, 8), -10.0, np.float32)
    logits[0, 3] = 5.0
    logits[1, 5] = 5.0
    logits[2, 6] = 5.0  # bonus
    accepted, _ = spec.accept(draft, logits, params=None)
    assert accepted == [3, 5, 6]
    assert spec.acceptance_rate == 1.0


def test_speculative_engine_matches_plain_greedy(tiny_config):
    """Self-speculation (draft == target) must reproduce plain greedy decode
    exactly — the strongest correctness check for the verify-KV path."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    plain = make_engine(tiny_config)
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    prompt = [5, 17, 42, 7, 11]
    expected = plain.generate(list(prompt), sp).output_tokens

    spec = SpeculativeDecoder(params, tiny_config, num_speculative=4)
    eng = make_engine(tiny_config, speculative=spec)
    got = eng.generate(list(prompt), sp).output_tokens
    assert got == expected
    assert spec.acceptance_rate == 1.0  # draft == target -> all accepted


def test_speculative_uses_fewer_steps(tiny_config):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    spec = SpeculativeDecoder(params, tiny_config, num_speculative=4)
    eng = make_engine(tiny_config, speculative=spec)
    r = eng.generate([5, 17, 42], SamplingParams(temperature=0.0,
                                                 max_tokens=12))
    assert len(r.output_tokens) >= 10
    # 12 tokens in ~ prefill + ceil(12/5) spec steps << 12 decode steps
    assert r.num_steps <= 8


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------


def make_adapter_dir(tmp_path, cfg, rank=4, scale_targets=("q_proj",)):
    """Write a synthetic HF-style LoRA adapter."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    d = cfg.head_dim
    hq = cfg.num_attention_heads * d
    tensors = {}
    for i in range(cfg.num_hidden_layers):
        for tgt in scale_targets:
            # torch layout: lora_A (r, in), lora_B (out, r)
            tensors[f"base_model.model.layers.{i}.self_attn.{tgt}.lora_A.weight"] = (
                rng.standard_normal((rank, cfg.hidden_size)).astype(np.float32) * 0.1)
            tensors[f"base_model.model.layers.{i}.self_attn.{tgt}.lora_B.weight"] = (
                rng.standard_normal((hq, rank)).astype(np.float32) * 0.1)
    adir = tmp_path / "adapter"
    adir.mkdir()
    save_file(tensors, str(adir / "adapter_model.safetensors"))
    (adir / "adapter_config.json").write_text(
        json.dumps({"r": rank, "lora_alpha": rank * 2}))
    return str(adir)


def test_lora_load_activate_deactivate(tiny_config, tmp_path):
    eng = make_engine(tiny_config)
    adir = make_adapter_dir(tmp_path, tiny_config)

    base_q = np.asarray(eng.runner.params["layers"]["q"])
    aid = eng.load_lora_adapter("test", adir)
    assert aid == 0
    adapters = eng.lora_manager.list_adapters()
    assert adapters[0]["name"] == "test" and adapters[0]["rank"] == 4
    assert adapters[0]["scaling"] == 2.0

    eng.set_active_lora("test")
    merged_q = np.asarray(eng.runner.params["layers"]["q"])
    assert not np.allclose(base_q, merged_q)
    # delta = scaling * A @ B for layer 0
    from safetensors.numpy import load_file

    t = load_file(str(tmp_path / "adapter" / "adapter_model.safetensors"))
    a0 = t["base_model.model.layers.0.self_attn.q_proj.lora_A.weight"].T
    b0 = t["base_model.model.layers.0.self_attn.q_proj.lora_B.weight"].T
    np.testing.assert_allclose(merged_q[0] - base_q[0], 2.0 * (a0 @ b0),
                               rtol=1e-4, atol=1e-5)

    eng.set_active_lora(None)
    np.testing.assert_allclose(
        np.asarray(eng.runner.params["layers"]["q"]), base_q)


def test_lora_changes_generation(tiny_config, tmp_path):
    eng = make_engine(tiny_config)
    adir = make_adapter_dir(tmp_path, tiny_config)
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    prompt = jnp.asarray([[5, 17, 42]], jnp.int32)
    base_logits = np.asarray(
        cdm.forward(eng.runner.params, tiny_config, prompt))
    base_out = eng.generate([5, 17, 42], sp).output_tokens
    eng.load_lora_adapter("a", adir)
    eng.set_active_lora("a")
    lora_logits = np.asarray(
        cdm.forward(eng.runner.params, tiny_config, prompt))
    assert not np.allclose(base_logits, lora_logits)  # delta moved the logits
    lora_out = eng.generate([5, 17, 42], sp).output_tokens
    assert len(lora_out) == len(base_out)
    eng.set_active_lora(None)
    restored = eng.generate([5, 17, 42], sp).output_tokens
    assert restored == base_out


def test_lora_unload_active_restores_base(tiny_config, tmp_path):
    eng = make_engine(tiny_config)
    adir = make_adapter_dir(tmp_path, tiny_config)
    base_q = np.asarray(eng.runner.params["layers"]["q"])
    eng.load_lora_adapter("a", adir)
    eng.set_active_lora("a")
    assert eng.lora_manager.unload_adapter("a")
    assert eng.lora_manager.active is None
    np.testing.assert_allclose(
        np.asarray(eng.runner.params["layers"]["q"]), base_q)
    assert not eng.lora_manager.unload_adapter("a")


def test_fused_qkv_engine_matches_unfused(tiny_config):
    """fuse_qkv=True must not change greedy outputs."""
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    plain = make_engine(tiny_config, fuse_qkv=False).generate([5, 17, 42], sp)
    fused_eng = make_engine(tiny_config, fuse_qkv=True)
    assert "qkv" in fused_eng.runner.params["layers"]
    assert "q" not in fused_eng.runner.params["layers"]
    fused = fused_eng.generate([5, 17, 42], sp)
    assert fused.output_tokens == plain.output_tokens


def test_lora_merge_into_fused_qkv(tiny_config, tmp_path):
    """q_proj adapters land in the right column slice of the fused weight."""
    eng = make_engine(tiny_config, fuse_qkv=True)
    adir = make_adapter_dir(tmp_path, tiny_config)
    base = np.asarray(eng.runner.params["layers"]["qkv"])
    eng.load_lora_adapter("a", adir)
    eng.set_active_lora("a")
    merged = np.asarray(eng.runner.params["layers"]["qkv"])
    d = tiny_config.head_dim
    hq = tiny_config.num_attention_heads * d
    # only the q columns changed
    assert not np.allclose(base[:, :, :hq], merged[:, :, :hq])
    np.testing.assert_allclose(base[:, :, hq:], merged[:, :, hq:])
    eng.set_active_lora(None)
    np.testing.assert_allclose(
        np.asarray(eng.runner.params["layers"]["qkv"]), base)


def test_lora_on_int8_weights(tiny_config, tmp_path):
    from vllm_i64_tpu.core.quantize_model import quantize_params
    from vllm_i64_tpu.ops.quant import QTensor

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    qparams = quantize_params(params, tiny_config, "int8")
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=128, kv_block_size=4,
                        max_kv_blocks=96, dtype="float32",
                        kv_cache_dtype="float32", quantization="int8",
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16, 32), fuse_qkv=False)
    eng = Engine(qparams, tiny_config, ecfg)
    if not isinstance(eng.runner.params["layers"]["q"], QTensor):
        pytest.skip("int8 pass does not quantize attention projections")
    adir = make_adapter_dir(tmp_path, tiny_config)
    eng.load_lora_adapter("a", adir)
    eng.set_active_lora("a")
    assert isinstance(eng.runner.params["layers"]["q"], QTensor)
    r = eng.generate([5, 6, 7], SamplingParams(temperature=0.0, max_tokens=3))
    assert len(r.output_tokens) >= 1


# ---------------------------------------------------------------------------
# paged draft cache
# ---------------------------------------------------------------------------


def test_paged_draft_matches_cache_free(tiny_config):
    """The paged draft path (context-delta + per-slot paged KV) must produce
    the exact tokens of the stateless cache-free path, including across
    rejection-truncated cache prefixes."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    paged = SpeculativeDecoder(params, tiny_config, num_speculative=3,
                               max_seq_len=128, block_size=4)
    plain = SpeculativeDecoder(params, tiny_config, num_speculative=3,
                               paged=False)
    rng = np.random.default_rng(0)
    context = [5, 17, 42, 7]
    for step in range(6):
        d_paged = paged.draft(np.asarray(context), rid=1)
        d_plain = plain.draft(np.asarray(context))
        assert list(d_paged) == list(d_plain), (step, d_paged, d_plain)
        # simulate the engine accepting a random prefix + a correction token
        n_acc = int(rng.integers(0, len(d_paged) + 1))
        context = context + [int(t) for t in d_paged[:n_acc]]
        if n_acc < len(d_paged):
            context.append(int(rng.integers(3, tiny_config.vocab_size)))
    paged.release(1)
    assert paged._free_slots and 1 not in paged._slot_by_rid


def test_paged_draft_slot_reuse_and_exhaustion(tiny_config):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    spec = SpeculativeDecoder(params, tiny_config, num_speculative=2,
                              max_slots=2, max_seq_len=64, block_size=4)
    c1, c2, c3 = [5, 6, 7], [8, 9, 10], [11, 12, 13]
    d1 = spec.draft(np.asarray(c1), rid=1)
    d2 = spec.draft(np.asarray(c2), rid=2)
    # slots exhausted -> rid=3 falls back to the cache-free path (same result)
    d3 = spec.draft(np.asarray(c3), rid=3)
    plain = SpeculativeDecoder(params, tiny_config, num_speculative=2,
                               paged=False)
    assert list(d3) == list(plain.draft(np.asarray(c3)))
    spec.release(1)
    d3b = spec.draft(np.asarray(c3), rid=3)  # now gets the freed slot
    assert list(d3b) == list(d3)
    assert 3 in spec._slot_by_rid


def test_speculative_engine_paged_matches_plain_greedy(tiny_config):
    """Engine-level: speculative engine with the paged draft cache still
    produces token-identical greedy output."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    draft_cfg = tiny_config.replace(num_hidden_layers=1)
    draft_params = cdm.init_params(draft_cfg, jax.random.PRNGKey(1))
    spec = SpeculativeDecoder(draft_params, draft_cfg, num_speculative=3,
                              max_seq_len=128, block_size=4)
    eng_spec = make_engine(tiny_config, speculative=spec)
    eng_plain = make_engine(tiny_config)
    for p in ([5, 17, 42, 7], [9, 9, 9]):
        a = eng_spec.generate(p, SamplingParams(temperature=0.0, max_tokens=10))
        b = eng_plain.generate(p, SamplingParams(temperature=0.0, max_tokens=10))
        assert a.output_tokens == b.output_tokens
    # draft slots were released at purge
    assert not spec._slot_by_rid
