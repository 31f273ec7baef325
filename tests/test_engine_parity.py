"""Engine-level parity and robustness:
- the full paged engine (chunked prefill + paged KV + on-device sampling +
  multistep + prefix cache) must reproduce the torch reference's greedy
  continuation from identical weights
- preemption save/restore must not change greedy output
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
try:
    from vllm_i64.models.complexity_deep.config import ComplexityDeepConfig
    from vllm_i64.models.complexity_deep.model import ComplexityDeepModel

    HAS_REFERENCE = True
except Exception:  # pragma: no cover
    HAS_REFERENCE = False

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_i64_tpu.config import EngineConfig, ModelConfig  # noqa: E402
from vllm_i64_tpu.core.loader import build_params  # noqa: E402
from vllm_i64_tpu.core.sampling import SamplingParams  # noqa: E402
from vllm_i64_tpu.engine import Engine  # noqa: E402
from vllm_i64_tpu.models import complexity_deep as cdm  # noqa: E402


def shared_weights(seed=0, **overrides):
    kw = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=128,
              num_experts=4, top_k=2, shared_expert=True, use_qk_norm=True)
    kw.update(overrides)
    torch.manual_seed(seed)
    ref = ComplexityDeepModel(ComplexityDeepConfig(**kw)).eval()
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    cfg = ModelConfig(**kw)
    params, stats = build_params(cfg, sd, dtype=jnp.float32)
    assert stats["unloaded_params"] == 0
    return ref, params, cfg


def ref_greedy(ref_model, prompt, n):
    seq = list(prompt)
    for _ in range(n):
        with torch.no_grad():
            logits = ref_model(torch.tensor(seq, dtype=torch.long))
        seq.append(int(logits[-1].argmax()))
    return seq[len(prompt):]


def make_engine(params, cfg, **kw):
    defaults = dict(max_batch_size=4, max_seq_len=128, kv_block_size=4,
                    max_kv_blocks=128, max_prefill_tokens=8,  # forces chunking
                    dtype="float32", kv_cache_dtype="float32",
                    decode_batch_buckets=(1, 2, 4),
                    prefill_batch_buckets=(1, 2, 4),
                    prefill_token_buckets=(8, 16))
    defaults.update(kw)
    return Engine(params, cfg, EngineConfig(**defaults))


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not importable")
def test_paged_engine_matches_reference_greedy():
    """Chunked prefill + paged KV + fused QKV + on-device argmax must track
    the torch reference exactly for 16 tokens."""
    ref, params, cfg = shared_weights()
    prompt = [5, 17, 42, 7, 9, 11, 13, 2, 30, 31]  # > chunk budget of 8
    want = ref_greedy(ref, prompt, 16)
    eng = make_engine(params, cfg, multistep_decode=1)
    got = eng.generate(list(prompt),
                       SamplingParams(temperature=0.0, max_tokens=16))
    assert got.output_tokens == want


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not importable")
def test_multistep_engine_matches_reference_greedy():
    ref, params, cfg = shared_weights(seed=1)
    prompt = [3, 1, 4, 1, 5]
    want = ref_greedy(ref, prompt, 12)
    eng = make_engine(params, cfg, multistep_decode=6)
    got = eng.generate(list(prompt),
                       SamplingParams(temperature=0.0, max_tokens=12))
    assert got.output_tokens == want


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not importable")
def test_concurrent_batched_requests_match_reference():
    """Batched continuous batching must not cross-contaminate rows."""
    ref, params, cfg = shared_weights(seed=2)
    prompts = [[5, 17, 42], [9, 8, 7, 6], [1, 2], [11, 12, 13, 14, 15]]
    wants = [ref_greedy(ref, p, 8) for p in prompts]
    eng = make_engine(params, cfg, multistep_decode=1)
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    rids = [eng.add_request(list(p), sp) for p in prompts]
    results = [eng.wait_for(r) for r in rids]
    for r, want in zip(results, wants):
        assert r.output_tokens == want


def test_preemption_restore_preserves_greedy_output(tiny_config):
    """A preempted+restored request must finish with the same tokens as an
    uninterrupted run (save/restore + re-prefill correctness)."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    base = make_engine(params, tiny_config, max_kv_blocks=64,
                       multistep_decode=1)
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    prompt = list(range(20, 32))
    want = base.generate(list(prompt), sp).output_tokens

    eng = make_engine(params, tiny_config, max_kv_blocks=64,
                      multistep_decode=1)
    rid = eng.add_request(list(prompt), sp, priority=5)  # low priority
    for _ in range(6):
        eng.step()
    req = eng.scheduler.get_request(rid)
    assert req.num_generated >= 1
    # force-preempt by a flood of high-priority requests (distinct prompts —
    # identical greedy prompts would be merged, not scheduled)
    hp = [eng.add_request(list(range(40 + i, 56 + i)), sp, priority=-10)
          for i in range(3)]
    for _ in range(80):
        eng.step()
        if (eng.scheduler.get_request(rid).is_finished
                and all(eng.scheduler.get_request(h).is_finished for h in hp)):
            break
    got = eng.wait_for(rid)
    assert got.output_tokens == want
