"""OpenAI-compatible API server (aiohttp).

Same endpoint surface as the reference server (ref: vllm_i64/api/server.py):
completions/chat (sync + SSE), health/models/tokenize/embeddings/usage/
batch/metrics/logs/priority/cancel, WebSocket completions, OpenAPI, LoRA
management, cache stats/purge, monitor, /v1/experts, RAG index/search/stats,
sandboxed execution, agent SSE events.

Middleware stack: CORS -> auth (Bearer) -> token-bucket rate limit ->
load shed (ref: server.py:204-215).
"""

from __future__ import annotations

import asyncio
import logging
import time
from typing import Optional

from aiohttp import web

from ..core.chat_template import ChatTemplate
from ..core.context_manager import ContextManager
from ..engine import AsyncEngine, Engine
from ._admin import AdminMixin
from ._completions import CompletionsMixin
from ._services import ServicesMixin
from .events import EventBus
from .middleware import (
    TokenBucketRateLimiter,
    make_auth_middleware,
    make_cors_middleware,
    make_load_shed_middleware,
    make_rate_limit_middleware,
)
from .tracking import (
    ContextMetricsTracker,
    LatencyTracker,
    PriorityManager,
    RequestCache,
    RequestLogger,
    UsageTracker,
)


class Server(CompletionsMixin, AdminMixin, ServicesMixin):
    """Inference server over an async continuous-batching engine."""

    def __init__(
        self,
        engine: Optional[Engine],
        tokenizer=None,
        chat_template: Optional[ChatTemplate] = None,
        model_name: str = "vllm-i64-tpu",
        host: str = "0.0.0.0",
        port: int = 8000,
        api_key: Optional[str] = None,
        rate_limit: int = 0,
        max_pending: int = 0,
        retriever=None,
        sandbox=None,
        metrics_port: int = 0,
        router=None,
        async_engine=None,
    ):
        self.logger = logging.getLogger("vllm_i64_tpu.server")
        self.engine = engine
        if async_engine is not None:
            # caller-provided wrapper (disaggregated prefill/decode serving:
            # engine/async_disaggregated.py; ref CLI entry: cli.py:61-78)
            self.async_engine = async_engine
        else:
            self.async_engine = (AsyncEngine(engine)
                                 if engine is not None else None)
        if router is not None:
            # cross-host serving: completions route to the least-loaded
            # host through the router; admin endpoints read the local
            # engine when one exists (parallel/cross_host.py)
            from ..parallel.cross_host import AsyncRouterEngine

            self.async_engine = AsyncRouterEngine(router)
            if self.engine is None:
                self.engine = router.local_engine
        self.tokenizer = tokenizer
        self.chat_template = chat_template or ChatTemplate.default()
        self.model_name = model_name
        self.host = host
        self.port = port
        self.api_key = api_key
        self.rate_limit = rate_limit
        self.max_pending = max_pending
        self.retriever = retriever
        self.sandbox = sandbox
        self.metrics_port = metrics_port
        self._prometheus = None

        self._started_at = time.monotonic()
        self._usage_tracker = UsageTracker()
        self._context_tracker = ContextMetricsTracker()
        self._request_cache = RequestCache()
        self._latency_tracker = LatencyTracker()
        self._request_logger = RequestLogger()
        self._priority_manager = PriorityManager()
        self.event_bus = EventBus()
        self._last_expert_response = None

        # rolling-summary context manager over the real tokenizer + template
        self.context_manager = None
        if engine is not None:
            self.context_manager = ContextManager(
                encode=self._encode,
                decode=self._decode,
                render=self._render_chat,
                max_seq_len=engine.engine_config.max_seq_len,
            )

        # suppress a bare-space first token in chat (ref: server.py:127-139)
        self._space_suppress_ids = None
        if tokenizer is not None:
            try:
                ids = tokenizer.encode(" ")
                if len(ids) == 1:
                    self._space_suppress_ids = ids
            except Exception:
                pass

    # -- app assembly -------------------------------------------------------------

    def build_app(self) -> web.Application:
        middlewares = [make_cors_middleware()]
        if self.api_key:
            middlewares.append(make_auth_middleware(self.api_key))
        if self.rate_limit and self.rate_limit > 0:
            middlewares.append(make_rate_limit_middleware(
                TokenBucketRateLimiter(self.rate_limit)))
        if self.max_pending and self.max_pending > 0:
            middlewares.append(make_load_shed_middleware(
                lambda: (self.async_engine.active_requests
                         if self.async_engine else 0),
                self.max_pending))

        app = web.Application(middlewares=middlewares)
        r = app.router

        # inference
        r.add_route("OPTIONS", "/v1/completions", self._handle_options)
        r.add_route("OPTIONS", "/v1/chat/completions", self._handle_options)
        r.add_post("/v1/completions", self.handle_completions)
        r.add_post("/v1/chat/completions", self.handle_chat_completions)

        # admin
        r.add_get("/health", self.handle_health)
        r.add_get("/v1/models", self.handle_models)
        r.add_get("/v1/models/{model_id}", self.handle_model_info)
        r.add_post("/v1/tokenize", self.handle_tokenize)
        r.add_post("/v1/embeddings", self.handle_embeddings)
        r.add_get("/v1/usage", self.handle_usage)
        r.add_post("/v1/batch", self.handle_batch)
        r.add_get("/v1/metrics", self.handle_metrics)
        r.add_get("/v1/logs", self.handle_request_log)
        r.add_post("/v1/priority", self.handle_priority)
        r.add_post("/v1/cancel/{request_id}", self.handle_cancel)
        r.add_get("/v1/ws/completions", self.handle_ws_completions)
        r.add_get("/docs", self.handle_openapi)

        # lora
        r.add_post("/v1/lora/load", self.handle_lora_load)
        r.add_post("/v1/lora/unload", self.handle_lora_unload)
        r.add_get("/v1/lora/list", self.handle_lora_list)

        # caches / monitoring
        r.add_get("/v1/cache/stats", self.handle_cache_stats)
        r.add_post("/v1/cache/purge", self.handle_cache_purge)
        r.add_route("OPTIONS", "/v1/cache/purge", self._handle_options)
        r.add_get("/v1/monitor", self.handle_monitor)
        r.add_get("/v1/experts", self.handle_expert_stats)

        # rag
        r.add_post("/v1/rag/index", self.handle_rag_index)
        r.add_post("/v1/rag/search", self.handle_rag_search)
        r.add_get("/v1/rag/stats", self.handle_rag_stats)
        r.add_route("OPTIONS", "/v1/rag/index", self._handle_options)
        r.add_route("OPTIONS", "/v1/rag/search", self._handle_options)

        # sandbox / agent
        r.add_post("/v1/execute", self.handle_execute)
        r.add_route("OPTIONS", "/v1/execute", self._handle_options)
        r.add_get("/v1/agent/events", self.handle_agent_events)
        r.add_get("/v1/agent/history", self.handle_agent_history)

        r.add_get("/", self.handle_root)

        app.on_startup.append(self._on_startup)
        app.on_cleanup.append(self._on_cleanup)
        return app

    async def _on_startup(self, app) -> None:
        if self.async_engine is not None:
            await self.async_engine.start()
            if self.metrics_port:
                from ..core.metrics import PrometheusMetrics

                self._prometheus = PrometheusMetrics(port=self.metrics_port)
                self._prometheus.attach(self.async_engine)

    async def _on_cleanup(self, app) -> None:
        if self.async_engine is not None:
            await self.async_engine.stop()

    def run(self) -> None:
        """Blocking serve (ref: server.py:289-318)."""
        app = self.build_app()
        self.logger.info("serving %s on http://%s:%d",
                         self.model_name, self.host, self.port)
        web.run_app(app, host=self.host, port=self.port,
                    access_log=None, handle_signals=True)
