"""Server-side trackers: usage, context metrics, response cache, latency
percentiles, request log ring, API-key priorities
(ref: vllm_i64/api/tracking.py)."""

from __future__ import annotations

import hashlib
import json
import logging
import time
from collections import OrderedDict, deque
from typing import Dict, List, Optional


class UsageTracker:
    """Per-API-key token usage (ref: tracking.py:17-45)."""

    def __init__(self):
        self._usage: Dict[str, dict] = {}

    def record(self, api_key: str, prompt_tokens: int, completion_tokens: int):
        row = self._usage.setdefault(
            api_key, {"prompt_tokens": 0, "completion_tokens": 0, "requests": 0})
        row["prompt_tokens"] += prompt_tokens
        row["completion_tokens"] += completion_tokens
        row["requests"] += 1

    def get(self, api_key: Optional[str] = None) -> dict:
        if api_key:
            return self._usage.get(
                api_key,
                {"prompt_tokens": 0, "completion_tokens": 0, "requests": 0})
        return dict(self._usage)

    def get_total(self) -> dict:
        total = {"prompt_tokens": 0, "completion_tokens": 0, "requests": 0}
        for row in self._usage.values():
            for k in total:
                total[k] += row[k]
        return total


class ContextMetricsTracker:
    """Aggregate rolling-context compression stats (ref: tracking.py:48-85)."""

    _KEYS = ("original_tokens", "prompt_tokens", "summary_tokens",
             "tokens_saved", "summarized_messages", "dropped_messages")

    def __init__(self):
        self._totals = {k: 0 for k in self._KEYS}
        self._totals["requests"] = 0
        self._totals["compressed_requests"] = 0
        self._last: Optional[dict] = None

    def record(self, metrics: dict) -> None:
        self._totals["requests"] += 1
        if metrics.get("compressed"):
            self._totals["compressed_requests"] += 1
        for k in self._KEYS:
            self._totals[k] += int(metrics.get(k, 0))
        self._last = dict(metrics)

    def snapshot(self) -> dict:
        out = dict(self._totals)
        orig = out["original_tokens"]
        out["compression_ratio"] = (round(out["prompt_tokens"] / orig, 4)
                                    if orig > 0 else 1.0)
        out["last"] = dict(self._last) if self._last else None
        return out


class RequestCache:
    """TTL response cache keyed on the full greedy sampling fingerprint —
    non-deterministic (temperature > 0) requests are never cached
    (ref: tracking.py:88-135)."""

    def __init__(self, max_size: int = 1000, ttl_seconds: float = 300.0):
        self.max_size = max_size
        self.ttl = ttl_seconds
        self._cache: OrderedDict = OrderedDict()

    @staticmethod
    def _fingerprint(prompt: str, max_tokens: int, **kw) -> str:
        if kw.get("temperature", 0.0) > 0:
            return ""
        parts = [prompt, str(max_tokens)] + [
            f"{k}={kw[k]}" for k in sorted(kw)
        ]
        return hashlib.sha256("|".join(parts).encode()).hexdigest()

    def get(self, prompt: str, max_tokens: int, **kw) -> Optional[dict]:
        fp = self._fingerprint(prompt, max_tokens, **kw)
        if not fp or fp not in self._cache:
            return None
        result, ts = self._cache[fp]
        if time.monotonic() - ts > self.ttl:
            del self._cache[fp]
            return None
        self._cache.move_to_end(fp)
        return result

    def put(self, prompt: str, max_tokens: int, result: dict, **kw) -> None:
        fp = self._fingerprint(prompt, max_tokens, **kw)
        if not fp:
            return
        if len(self._cache) >= self.max_size:
            self._cache.popitem(last=False)
        self._cache[fp] = (result, time.monotonic())

    def purge(self) -> int:
        n = len(self._cache)
        self._cache.clear()
        return n

    @property
    def size(self) -> int:
        return len(self._cache)


class LatencyTracker:
    """p50/p95/p99 latency windows per endpoint (ref: tracking.py:140-175)."""

    def __init__(self, max_window: int = 1000):
        self.max_window = max_window
        self._all: deque = deque(maxlen=max_window)
        self._per_endpoint: Dict[str, deque] = {}

    def record(self, endpoint: str, latency_ms: float) -> None:
        self._all.append(latency_ms)
        self._per_endpoint.setdefault(
            endpoint, deque(maxlen=self.max_window)).append(latency_ms)

    def percentiles(self, endpoint: Optional[str] = None) -> Dict[str, float]:
        data = sorted(self._per_endpoint.get(endpoint, [])
                      if endpoint else self._all)
        if not data:
            return {"p50_ms": 0.0, "p95_ms": 0.0, "p99_ms": 0.0, "count": 0}
        n = len(data)
        return {
            "p50_ms": round(data[int(n * 0.50)], 2),
            "p95_ms": round(data[min(int(n * 0.95), n - 1)], 2),
            "p99_ms": round(data[min(int(n * 0.99), n - 1)], 2),
            "count": n,
            "avg_ms": round(sum(data) / n, 2),
        }

    def get_all_endpoints(self) -> Dict[str, Dict[str, float]]:
        out = {"overall": self.percentiles()}
        for ep in self._per_endpoint:
            out[ep] = self.percentiles(ep)
        return out


class RequestLogger:
    """Structured JSON request log ring (ref: tracking.py:178-235)."""

    def __init__(self, enabled: bool = True, max_log: int = 10000):
        self.enabled = enabled
        self._log: deque = deque(maxlen=max_log)
        self._logger = logging.getLogger("vllm_i64_tpu.requests")

    def log_request(self, endpoint: str, status: int, latency_ms: float,
                    prompt_tokens: int = 0, completion_tokens: int = 0,
                    api_key: Optional[str] = None, error: Optional[str] = None,
                    request_id: Optional[str] = None,
                    partition: Optional[int] = None,
                    context_metrics: Optional[dict] = None) -> None:
        if not self.enabled:
            return
        entry = {
            "ts": time.time(),
            "endpoint": endpoint,
            "status": status,
            "latency_ms": round(latency_ms, 2),
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "api_key": (api_key[:8] + "..."
                        if api_key and len(api_key) > 8 else api_key),
        }
        if partition is not None:
            entry["partition"] = partition
        if request_id:
            entry["request_id"] = request_id
        if error:
            entry["error"] = error
        if context_metrics is not None:
            entry["context"] = {
                k: context_metrics.get(k)
                for k in ("policy", "compressed", "original_tokens",
                          "prompt_tokens", "summary_tokens", "tokens_saved",
                          "summarized_messages", "dropped_messages")
            }
        self._log.append(entry)
        self._logger.info(json.dumps(entry))

    def get_recent(self, n: int = 50) -> List[dict]:
        return list(self._log)[-n:]


class PriorityManager:
    """API-key priority levels (ref: tracking.py:238-253). NOTE: the wire
    convention is higher = sooner; the scheduler's is lower = sooner, so the
    server negates on submission."""

    def __init__(self):
        self._priorities: Dict[str, int] = {}

    def set_priority(self, api_key: str, priority: int) -> None:
        self._priorities[api_key] = priority

    def get_priority(self, api_key: Optional[str], request_priority: int = 0) -> int:
        """Admin-assigned key priority DOMINATES the request body's.

        max() made negative (deprioritizing) assignments a no-op and let
        any client outrank admin assignments by sending a large body
        priority."""
        if api_key and api_key in self._priorities:
            return self._priorities[api_key]
        return request_priority

    def get_all(self) -> Dict[str, int]:
        return dict(self._priorities)
