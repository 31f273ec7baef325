"""Async serving adapter for disaggregated prefill/decode deployments.

Wires ``parallel/disaggregated.py`` to the HTTP server so
``vllm-i64-tpu serve --disaggregated`` works end-to-end (the reference
exposes this via ``--disaggregated`` + a torchrun launcher,
ref: vllm_i64/cli.py:61-78, parallel/disaggregated.py:1145-1185).

Design: admission runs the prompt through the PREFILL worker (prompts
batch with whatever else is queued — the coordinator's prefill thread
drains the shared queue into one bucketed dispatch), the KV blocks move
device-to-device, and the request enters the DECODE engine's normal
continuous-batching machinery as an already-prefilled RUNNING request.
Everything downstream (streams, futures, crash recovery, drain, metrics)
is the stock AsyncEngine loop over the decode engine — only admission and
first-token delivery differ.
"""

from __future__ import annotations

import asyncio
import logging
from typing import Dict, Optional

from ..core.sampling import SamplingParams
from .async_engine import AsyncEngine

logger = logging.getLogger("vllm_i64_tpu.async_disaggregated")


class AsyncDisaggregatedEngine(AsyncEngine):
    """AsyncEngine over the decode engine of a DisaggregatedCoordinator."""

    def __init__(self, coordinator, max_queue_depth: Optional[int] = None):
        super().__init__(coordinator.decode.engine,
                         max_queue_depth=max_queue_depth)
        self.coordinator = coordinator
        # first token is sampled ON THE PREFILL WORKER (ref: PrefillWorker
        # samples token 0, disaggregated.py:372-455); the decode engine's
        # step results never contain it, so it is delivered out-of-band
        self._pending_first: Dict[int, int] = {}

    async def start(self) -> None:
        self.coordinator.start()  # background prefill-batching thread
        await super().start()

    async def stop(self, drain_timeout: float = 30.0) -> None:
        await super().stop(drain_timeout)
        self.coordinator.stop()

    async def _admit(
        self,
        prompt_token_ids,
        sampling_params: Optional[SamplingParams],
        priority: int,
        timeout_s: Optional[float],
        cache_namespace: Optional[bytes],
        soft_embeds=None,
        soft_positions=None,
    ) -> int:
        if self._draining:
            raise RuntimeError(
                "engine is shutting down, not accepting requests")
        if self.active_requests >= self.max_queue_depth:
            raise RuntimeError(
                f"queue full ({self.active_requests}/{self.max_queue_depth})"
            )
        sp = sampling_params or SamplingParams()
        loop = asyncio.get_running_loop()

        def prefill_and_admit() -> int:
            pr = self.coordinator.prefill_blocking(prompt_token_ids, sp)
            import time as _t

            deadline = _t.monotonic() + 60.0
            while True:
                rid = self.coordinator.decode.receive_and_add_request(pr)
                if rid is not None:
                    return rid
                if _t.monotonic() > deadline:
                    raise RuntimeError(
                        "decode engine has no KV room for a prefilled "
                        "request (waited 60s)")
                _t.sleep(0.02)  # decode side frees blocks as requests end

        import time

        rid = await loop.run_in_executor(None, prefill_and_admit)
        self._pending_first[rid] = int(
            self.engine.scheduler.get_request(rid).output_token_ids[0])
        self._t0[rid] = time.perf_counter()
        self.active_requests += 1
        if self._new_request_event is not None:
            self._new_request_event.set()
        return rid

    async def _deliver(self, result) -> None:
        # prepend the prefill-sampled first token for rows whose stream
        # target registered after admission (generate_stream registers the
        # queue right after _admit returns, before the first decode step)
        if self._pending_first:
            merged = dict(result)
            for rid in list(self._pending_first):
                if rid in self._targets:
                    tok = self._pending_first.pop(rid)
                    merged[rid] = [tok] + list(merged.get(rid, []))
            result = merged
        await super()._deliver(result)

    def get_stats(self) -> dict:
        stats = super().get_stats() if hasattr(super(), "get_stats") else \
            self.engine.get_stats()
        stats["disaggregated"] = {
            "prefills_done": self.coordinator.prefill.prefills_done,
            "pending_prefills": self.coordinator._prefill_q.qsize(),
        }
        return stats
