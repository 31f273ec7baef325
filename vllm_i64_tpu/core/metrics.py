"""Prometheus metrics (ref: vllm_i64/core/metrics.py).

Counters stay integer (the i64 philosophy); only latency histograms are
float. Gracefully degrades to no-ops when prometheus_client is missing.
"""

from __future__ import annotations

import time
from typing import Optional

try:
    from prometheus_client import (
        REGISTRY,
        Counter,
        Gauge,
        Histogram,
        Info,
        start_http_server,
    )

    HAS_PROMETHEUS = True
except ImportError:  # pragma: no cover
    HAS_PROMETHEUS = False


def _make(cls, name, doc, registry=None, **kw):
    if registry is not None:
        kw["registry"] = registry
    return cls(name, doc, **kw)


class PrometheusMetrics:
    """TTFT/ITL/throughput/KV-usage metrics exported on an HTTP port."""

    def __init__(self, port: int = 9090, model_name: str = "",
                 registry=None, serve: bool = True):
        self.enabled = HAS_PROMETHEUS
        if not self.enabled:
            return

        self.model_info = _make(Info, "vllm_i64_tpu_model",
                                "Model information", registry)
        self.model_info.info({"name": model_name or "unknown",
                              "engine": "vllm-i64-tpu"})

        self.requests_total = _make(
            Counter, "vllm_i64_tpu_requests_total",
            "Total requests served", registry)
        self.tokens_generated = _make(
            Counter, "vllm_i64_tpu_tokens_generated_total",
            "Total tokens generated", registry)
        self.tokens_prompt = _make(
            Counter, "vllm_i64_tpu_tokens_prompt_total",
            "Total prompt tokens processed", registry)

        self.request_duration = _make(
            Histogram, "vllm_i64_tpu_request_duration_seconds",
            "Request latency", registry,
            buckets=[0.01, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0])
        self.ttft = _make(
            Histogram, "vllm_i64_tpu_time_to_first_token_seconds",
            "Time to first token (prefill latency)", registry,
            buckets=[0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0])
        self.itl = _make(
            Histogram, "vllm_i64_tpu_inter_token_latency_seconds",
            "Inter-token latency (decode step)", registry,
            buckets=[0.001, 0.002, 0.005, 0.01, 0.02, 0.05, 0.1])
        self.queue_time = _make(
            Histogram, "vllm_i64_tpu_queue_time_seconds",
            "Queue wait before processing", registry,
            buckets=[0.001, 0.01, 0.05, 0.1, 0.5, 1.0, 5.0, 10.0])

        self.batch_size = _make(Gauge, "vllm_i64_tpu_batch_size",
                                "Current batch size", registry)
        self.kv_cache_usage = _make(
            Gauge, "vllm_i64_tpu_kv_cache_usage_ratio",
            "KV cache block usage (0-1)", registry)
        self.pending_requests = _make(
            Gauge, "vllm_i64_tpu_pending_requests",
            "Requests waiting in queue", registry)

        if serve and port:
            start_http_server(port)

    # -- hooks -------------------------------------------------------------------

    def attach(self, async_engine) -> None:
        """Wire TTFT/ITL observation + per-step engine gauges into an
        AsyncEngine (the ONLY call site — everything must hook here or it
        exports permanently-zero series)."""
        if not self.enabled:
            return
        engine = async_engine.engine

        def _ttft(v: float) -> None:
            self.ttft.observe(v)
            # queue wait before processing ~ TTFT minus the first step's
            # compute; the admission wait dominates it under load
            self.queue_time.observe(v)

        def _itl(v: float) -> None:
            self.itl.observe(v)
            self.update_engine_gauges(engine)

        async_engine.on_ttft = _ttft
        async_engine.on_itl = _itl

    def on_request_start(self) -> float:
        if self.enabled:
            self.requests_total.inc()
        return time.perf_counter()

    def on_request_end(self, start: float, prompt_tokens: int,
                       output_tokens: int) -> None:
        if not self.enabled:
            return
        self.request_duration.observe(time.perf_counter() - start)
        self.tokens_prompt.inc(prompt_tokens)
        self.tokens_generated.inc(output_tokens)

    def update_engine_gauges(self, engine) -> None:
        if not self.enabled:
            return
        stats = engine.scheduler.get_stats()
        self.batch_size.set(stats["running"])
        self.pending_requests.set(stats["pending"])
        self.kv_cache_usage.set(engine.scheduler.blocks.usage())
