"""HTTP middleware: CORS -> auth -> rate limit -> load shed
(ref: vllm_i64/api/middleware.py:21-146)."""

from __future__ import annotations

import asyncio
import hmac
import time
from typing import Dict

from aiohttp import web


class TokenBucketRateLimiter:
    """Per-IP token bucket with stale-bucket cleanup (ref: middleware.py:21-80)."""

    def __init__(self, requests_per_minute: int, max_buckets: int = 10000,
                 cleanup_interval: float = 300.0):
        self.rate = requests_per_minute / 60.0
        self.capacity = requests_per_minute
        self._buckets: Dict[str, list] = {}  # ip -> [tokens, last_ts]
        self._max_buckets = max_buckets
        self._cleanup_interval = cleanup_interval
        self._last_cleanup = time.monotonic()
        self._lock = asyncio.Lock()

    async def allow(self, ip: str) -> bool:
        async with self._lock:
            now = time.monotonic()
            if now - self._last_cleanup > self._cleanup_interval:
                self._cleanup(now)
            bucket = self._buckets.get(ip)
            if bucket is None:
                if len(self._buckets) >= self._max_buckets:
                    self._cleanup(now)
                    if len(self._buckets) >= self._max_buckets:
                        oldest = min(self._buckets, key=lambda k: self._buckets[k][1])
                        del self._buckets[oldest]
                self._buckets[ip] = [self.capacity - 1.0, now]
                return True
            tokens, last = bucket
            tokens = min(self.capacity, tokens + (now - last) * self.rate)
            ok = tokens >= 1.0
            bucket[0] = tokens - 1.0 if ok else tokens
            bucket[1] = now
            return ok

    def _cleanup(self, now: float) -> None:
        threshold = self.capacity / self.rate if self.rate > 0 else 3600.0
        for ip in [ip for ip, (_, last) in self._buckets.items()
                   if now - last > threshold]:
            del self._buckets[ip]
        self._last_cleanup = now


def make_cors_middleware():
    @web.middleware
    async def cors(request, handler):
        resp = web.Response() if request.method == "OPTIONS" else await handler(request)
        resp.headers["Access-Control-Allow-Origin"] = "*"
        resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
        resp.headers["Access-Control-Allow-Headers"] = "Content-Type, Authorization"
        return resp
    return cors


def make_auth_middleware(api_key: str):
    """Bearer auth over /v1/* with constant-time compare (ref: :98-117)."""
    @web.middleware
    async def auth(request, handler):
        if request.path.startswith("/v1/"):
            header = request.headers.get("Authorization", "")
            provided = header[7:] if header.startswith("Bearer ") else None
            if provided is None or not hmac.compare_digest(
                    provided.encode("utf-8"), api_key.encode("utf-8")):
                return web.json_response(
                    {"error": {"message": "Invalid API key",
                               "type": "authentication_error"}},
                    status=401,
                )
        return await handler(request)
    return auth


def make_rate_limit_middleware(limiter: TokenBucketRateLimiter):
    """Charge only inference-style POSTs, not telemetry GETs (ref: :120-134)."""
    @web.middleware
    async def rate_limit(request, handler):
        if request.method == "POST" and request.path.startswith("/v1/"):
            if not await limiter.allow(request.remote or "unknown"):
                return web.json_response(
                    {"error": {"message": "Rate limit exceeded",
                               "type": "rate_limit_error"}},
                    status=429, headers={"Retry-After": "60"},
                )
        return await handler(request)
    return rate_limit


def make_load_shed_middleware(get_load_fn, max_pending: int):
    """503 when the engine queue is saturated (ref: :137-150).

    Inference POSTs only: cancel must stay reachable to SHED load, and
    the monitoring endpoints must stay readable to diagnose it."""
    @web.middleware
    async def load_shed(request, handler):
        sheddable = (
            request.method == "POST"
            and request.path.startswith("/v1/")
            and not request.path.startswith("/v1/cancel")
        )
        if sheddable and get_load_fn() >= max_pending:
            return web.json_response(
                {"error": {"message": "Server overloaded, try again later",
                           "type": "overloaded_error"}},
                status=503, headers={"Retry-After": "5"},
            )
        return await handler(request)
    return load_shed
