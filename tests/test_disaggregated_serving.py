"""CLI-servable disaggregated prefill/decode (VERDICT r2 missing #3).

engine/async_disaggregated.AsyncDisaggregatedEngine adapts a
DisaggregatedCoordinator to the server's async engine interface: admission
prefills on the prefill worker (batched via the coordinator's background
thread), KV crosses device-to-device, and the request decodes in the decode
engine's normal continuous-batching loop. The prefill-sampled FIRST token
must reach streams (the decode engine's step results never contain it;
ref: PrefillWorker samples token 0, vllm_i64/parallel/disaggregated.py:372-455).
"""

import asyncio

import jax
import numpy as np
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.engine.async_disaggregated import AsyncDisaggregatedEngine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.parallel.disaggregated import setup_disaggregated


def _cfg():
    return ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=128, num_experts=4, top_k=2,
        shared_expert=True,
    )


def _ecfg():
    return EngineConfig(
        max_batch_size=4, max_seq_len=64, kv_block_size=16,
        max_kv_blocks=32, max_prefill_tokens=64,
        decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2),
        prefill_token_buckets=(16, 32), multistep_decode=1,
    )


@pytest.fixture()
def coordinator():
    cfg = _cfg()
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    coord = setup_disaggregated(params, cfg, _ecfg())
    yield coord, params, cfg
    coord.stop()


def test_prefill_blocking_resolves_through_batching_thread(coordinator):
    coord, _, cfg = coordinator
    coord.start()
    pr = coord.prefill_blocking(list(range(5, 21)),
                                SamplingParams(temperature=0.0, max_tokens=4))
    assert pr.prompt_len == 16
    assert 0 <= pr.first_token < cfg.vocab_size
    assert pr.num_blocks == 1
    rid = coord.decode.receive_and_add_request(pr)
    assert rid is not None


def test_prefill_blocking_matches_single_engine(coordinator):
    coord, params, cfg = coordinator
    coord.start()
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    prompt = list(range(7, 23))
    expected = Engine(params, cfg, _ecfg()).generate(
        list(prompt), sp).output_tokens
    pr = coord.prefill_blocking(list(prompt), sp)
    assert pr.first_token == expected[0]


@pytest.mark.asyncio
async def test_async_generate_end_to_end(coordinator):
    coord, params, cfg = coordinator
    eng = AsyncDisaggregatedEngine(coord)
    await eng.start()
    try:
        sp = SamplingParams(temperature=0.0, max_tokens=5)
        prompt = list(range(9, 25))
        expected = Engine(params, cfg, _ecfg()).generate(
            list(prompt), sp).output_tokens
        res = await asyncio.wait_for(eng.generate(list(prompt), sp), 60)
        assert res.output_tokens == expected
    finally:
        await eng.stop(drain_timeout=5)


@pytest.mark.asyncio
async def test_async_stream_includes_prefill_first_token(coordinator):
    coord, params, cfg = coordinator
    eng = AsyncDisaggregatedEngine(coord)
    await eng.start()
    try:
        sp = SamplingParams(temperature=0.0, max_tokens=4)
        prompt = list(range(11, 27))
        expected = Engine(params, cfg, _ecfg()).generate(
            list(prompt), sp).output_tokens
        got = []
        async for item in eng.generate_stream(list(prompt), sp):
            if isinstance(item, tuple):  # ("__done__", reason)
                break
            got.append(item)
        # token 0 was sampled on the PREFILL worker — the stream must still
        # deliver it first
        assert got == expected
    finally:
        await eng.stop(drain_timeout=5)


@pytest.mark.asyncio
async def test_async_concurrent_requests_batch_prefills(coordinator):
    coord, params, cfg = coordinator
    eng = AsyncDisaggregatedEngine(coord)
    await eng.start()
    try:
        sp = SamplingParams(temperature=0.0, max_tokens=3)
        prompts = [list(range(3 + i, 19 + i)) for i in range(4)]
        results = await asyncio.wait_for(
            asyncio.gather(*[eng.generate(list(p), sp) for p in prompts]), 120)
        ref = Engine(params, cfg, _ecfg())
        for p, r in zip(prompts, results):
            assert r.output_tokens == ref.generate(list(p), sp).output_tokens
        assert coord.prefill.prefills_done >= 4
    finally:
        await eng.stop(drain_timeout=5)


def test_cli_parses_disaggregated_and_perf_flags(monkeypatch):
    """serve --disaggregated / --prefill-devices / perf knobs parse and
    reach cmd_serve with the right values (cmd_serve stubbed)."""
    import sys

    import vllm_i64_tpu.cli as cli

    captured = {}
    monkeypatch.setattr(cli, "cmd_serve", lambda a: captured.update(a=a))
    monkeypatch.setattr(sys, "argv", [
        "vllm-i64-tpu", "serve", "--no-model", "--disaggregated",
        "--prefill-devices", "2", "--multistep", "4", "--no-w8a8",
        "--enable-kv-swap", "--kv-fp8-auto", "--no-fused-norm-quant",
    ])
    cli.main()
    a = captured["a"]
    assert a.disaggregated and a.prefill_devices == 2
    assert a.multistep == 4 and a.w8a8 is False
    assert a.enable_kv_swap and a.kv_fp8_auto
    assert a.fused_norm_quant is False


def test_serve_flags_reach_engine_config():
    """The new CLI perf flags land in EngineConfig (no-model server)."""
    from vllm_i64_tpu.config import EngineConfig

    ecfg = EngineConfig(w8a8=True, fused_norm_quant=True,
                        multistep_decode=16, enable_kv_swap=True,
                        kv_swap_max_mb=64, kv_fp8_auto=True)
    assert ecfg.w8a8 and ecfg.fused_norm_quant
    assert ecfg.multistep_decode == 16
    assert ecfg.enable_kv_swap and ecfg.kv_swap_max_mb == 64
    assert ecfg.kv_fp8_auto


@pytest.mark.asyncio
async def test_async_stream_coalesced_includes_first_token(coordinator):
    """coalesce=True must still deliver the prefill-sampled token 0 first
    (the out-of-band _pending_first merge happens before queue drains)."""
    coord, params, cfg = coordinator
    eng = AsyncDisaggregatedEngine(coord)
    await eng.start()
    try:
        sp = SamplingParams(temperature=0.0, max_tokens=4)
        prompt = list(range(13, 29))
        expected = Engine(params, cfg, _ecfg()).generate(
            list(prompt), sp).output_tokens
        got = []
        async for item in eng.generate_stream(list(prompt), sp,
                                              coalesce=True):
            if isinstance(item, tuple):
                break
            got.extend(item if isinstance(item, list) else [item])
        assert got == expected
    finally:
        await eng.stop(drain_timeout=5)
