"""Prometheus metrics tests (ref: core/metrics.py) — isolated registry,
no HTTP server, so CI has no port contention."""

import pytest

prometheus_client = pytest.importorskip("prometheus_client")
from prometheus_client import CollectorRegistry, generate_latest  # noqa: E402

from vllm_i64_tpu.config import EngineConfig  # noqa: E402
from vllm_i64_tpu.core.metrics import PrometheusMetrics  # noqa: E402
from vllm_i64_tpu.core.sampling import SamplingParams  # noqa: E402
from vllm_i64_tpu.engine import AsyncEngine, Engine  # noqa: E402


def make_metrics():
    reg = CollectorRegistry()
    m = PrometheusMetrics(port=0, model_name="t", registry=reg, serve=False)
    return m, reg


def test_counters_and_histograms_export():
    m, reg = make_metrics()
    start = m.on_request_start()
    m.on_request_end(start, prompt_tokens=10, output_tokens=5)
    m.ttft.observe(0.05)
    m.itl.observe(0.002)
    text = generate_latest(reg).decode()
    assert "vllm_i64_tpu_requests_total 1.0" in text
    assert "vllm_i64_tpu_tokens_generated_total 5.0" in text
    assert "vllm_i64_tpu_tokens_prompt_total 10.0" in text
    assert 'vllm_i64_tpu_time_to_first_token_seconds_bucket{le="0.1"} 1.0' in text


def test_engine_gauges():
    m, reg = make_metrics()
    eng = Engine(None, None, EngineConfig(max_batch_size=2, max_seq_len=32,
                                          kv_block_size=4, max_kv_blocks=16))
    eng.add_request([1, 2, 3], SamplingParams(max_tokens=2))
    eng.step()
    m.update_engine_gauges(eng)
    text = generate_latest(reg).decode()
    assert "vllm_i64_tpu_batch_size 1.0" in text
    assert "vllm_i64_tpu_kv_cache_usage_ratio" in text


async def test_async_engine_hooks_fire():
    m, reg = make_metrics()
    eng = AsyncEngine(Engine(None, None, EngineConfig(
        max_batch_size=2, max_seq_len=32, kv_block_size=4, max_kv_blocks=16)))
    m.attach(eng)
    await eng.start()
    try:
        await eng.generate([1, 2, 3], SamplingParams(temperature=0.0,
                                                     max_tokens=3))
    finally:
        await eng.stop(drain_timeout=2)
    text = generate_latest(reg).decode()
    assert "vllm_i64_tpu_time_to_first_token_seconds_count 1.0" in text
    assert "vllm_i64_tpu_inter_token_latency_seconds_count" in text
