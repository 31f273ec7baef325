"""Serving through the expert-parallel MoE backend (moe_backend="ep_a2a").

The EP path (ops/ep_dispatch.ep_routed_experts) must produce the same model
outputs as the default masked-dense backend on the virtual 8-device mesh —
routed experts run capacity-bounded on their owning devices and combine via
psum (ref semantics: token_routed_i64/layer.py:229-299).
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
from vllm_i64_tpu.parallel.mesh import ParallelConfig, make_mesh, shard_params


def many_expert_config(num_experts: int, top_k: int = 2) -> ModelConfig:
    return ModelConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=16 * num_experts,  # per-expert I = 16
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=128,
        num_experts=num_experts,
        top_k=top_k,
        shared_expert=True,
    )


@pytest.fixture(autouse=True)
def _restore_ep_mesh():
    prev = ep_dispatch.get_ep_mesh()
    yield
    ep_dispatch.set_ep_mesh(prev)


@pytest.mark.parametrize("num_experts", [8, 16])
def test_ep_forward_matches_masked_dense(num_experts):
    cfg = many_expert_config(num_experts)
    params = cdm.init_params(cfg, jax.random.PRNGKey(1))
    mesh = make_mesh(ParallelConfig(dp=1, ep=8, tp=1))
    sharded = shard_params(params, cfg, mesh)
    ep_dispatch.set_ep_mesh(mesh)

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(3, 250, size=(2, 12)), jnp.int32
    )
    ref = cdm.forward(params, cfg, tokens)
    ep_cfg = cfg.replace(moe_backend="ep_a2a")
    got = cdm.forward(sharded, ep_cfg, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ep_forward_matches_with_tp(tiny_config=None):
    cfg = many_expert_config(8)
    params = cdm.init_params(cfg, jax.random.PRNGKey(2))
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    sharded = shard_params(params, cfg, mesh)
    ep_dispatch.set_ep_mesh(mesh)

    tokens = jnp.asarray(
        np.random.default_rng(3).integers(3, 250, size=(1, 9)), jnp.int32
    )
    ref = cdm.forward(params, cfg, tokens)
    got = cdm.forward(sharded, cfg.replace(moe_backend="ep_a2a"), tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ep_forward_int8_flat_layout():
    """The quantized flat-expert layout (H, E*I) serves through the EP path:
    the flat axis shards ep-major so each device's shard IS its local
    expert stack."""
    from vllm_i64_tpu.core.quantize_model import quantize_params

    cfg = many_expert_config(8)
    params = cdm.init_params(cfg, jax.random.PRNGKey(4))
    qparams = quantize_params(params, cfg, "int8")
    mesh = make_mesh(ParallelConfig(dp=1, ep=8, tp=1))
    sharded = shard_params(qparams, cfg, mesh)
    ep_dispatch.set_ep_mesh(mesh)

    tokens = jnp.asarray(
        np.random.default_rng(5).integers(3, 250, size=(1, 8)), jnp.int32
    )
    # reference: the SAME quantized weights through masked dense (single dev)
    ref = cdm.forward(qparams, cfg, tokens)
    got = cdm.forward(sharded, cfg.replace(moe_backend="ep_a2a"), tokens)
    # int8 dequant sums split across devices reassociate the fp32
    # accumulation — absolute tolerance on the logits, not relative
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=5e-3
    )


def test_engine_serves_many_expert_config_through_ep():
    """End-to-end: an engine on the 8-device mesh serves an E=16 model with
    moe_backend="ep_a2a"; greedy output must match the masked-dense engine."""
    cfg = many_expert_config(16)
    params = cdm.init_params(cfg, jax.random.PRNGKey(6))
    ecfg = EngineConfig(
        max_batch_size=2,
        max_seq_len=64,
        kv_block_size=8,
        max_kv_blocks=32,
        max_prefill_tokens=32,
        decode_batch_buckets=(1, 2),
        prefill_batch_buckets=(1, 2),
        prefill_token_buckets=(16, 32),
        multistep_decode=4,
        decode_chaining=False,
        enable_request_merging=False,
    )
    prompt = list(range(3, 19))
    sp = SamplingParams(temperature=0.0, max_tokens=8)

    ref_eng = Engine(params, cfg, ecfg)
    ref = ref_eng.generate(prompt, sp)

    mesh = make_mesh(ParallelConfig(dp=1, ep=8, tp=1))
    sharded = shard_params(params, cfg, mesh)
    eng = Engine(sharded, cfg.replace(moe_backend="ep_a2a"), ecfg, mesh=mesh)
    got = eng.generate(prompt, sp)
    assert got.output_tokens == ref.output_tokens


def test_ep_forward_int8_flat_layout_with_tp():
    """flat (H, E*I) int8 sharded over BOTH ep and tp: with tp > 1 a
    device's chunk covers fractional experts, so the column->expert mask
    mapping must be exact (regression: a uniform repeat masked the wrong
    columns whenever tp > 1)."""
    from vllm_i64_tpu.core.quantize_model import quantize_params

    cfg = many_expert_config(8)
    params = cdm.init_params(cfg, jax.random.PRNGKey(7))
    qparams = quantize_params(params, cfg, "int8")
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=2))
    sharded = shard_params(qparams, cfg, mesh)
    ep_dispatch.set_ep_mesh(mesh)

    tokens = jnp.asarray(
        np.random.default_rng(8).integers(3, 250, size=(1, 10)), jnp.int32)
    ref = cdm.forward(qparams, cfg, tokens)
    got = cdm.forward(sharded, cfg.replace(moe_backend="ep_a2a"), tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=5e-3)


def test_ep_rejects_indivisible_experts():
    """E not divisible by ep must raise, not silently drop expert mass."""
    cfg = many_expert_config(8).replace(num_experts=6, intermediate_size=96)
    params = cdm.init_params(cfg, jax.random.PRNGKey(9))
    mesh = make_mesh(ParallelConfig(dp=1, ep=4, tp=1))
    ep_dispatch.set_ep_mesh(mesh)
    mlp = {k: v[0] for k, v in params["layers"]["mlp"].items()}
    x = jnp.zeros((4, cfg.hidden_size), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        ep_dispatch.ep_routed_experts(
            x, jnp.zeros((4,), jnp.int32),
            gate_w=mlp["gate"], up_w=mlp["up"], down_w=mlp["down"],
            topk_table=mlp["route_table"], num_experts=6,
            vocab_size=cfg.vocab_size, primary_weight=0.5)


def test_ep_consumes_prequant_acts():
    """The fused-norm-quant marker must flow through the EP path (it
    dequantizes it locally — identical numerics)."""
    from vllm_i64_tpu.ops.quant import PreQuantActs, quantize_activations_int8

    cfg = many_expert_config(8)
    params = cdm.init_params(cfg, jax.random.PRNGKey(10))
    mesh = make_mesh(ParallelConfig(dp=1, ep=8, tp=1))
    ep_dispatch.set_ep_mesh(mesh)
    mlp = {k: v[0] for k, v in params["layers"]["mlp"].items()}
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, cfg.hidden_size)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 250, size=(4,)), jnp.int32)

    def run(inp):
        return np.asarray(ep_dispatch.ep_routed_experts(
            inp, ids, gate_w=mlp["gate"], up_w=mlp["up"],
            down_w=mlp["down"], topk_table=mlp["route_table"],
            num_experts=8, vocab_size=cfg.vocab_size, primary_weight=0.5))

    q, sscale = quantize_activations_int8(x)
    pre = PreQuantActs(q, sscale, x.shape, x.dtype)
    got = run(pre)
    want = run(pre.to_float())
    np.testing.assert_array_equal(got, want)
