"""In-process pub/sub feeding the /v1/agent/events SSE stream.

Capability analog of the reference's agent event bus (ref:
vllm_i64/api/events.py): typed events with session ids, bounded history,
fan-out to any number of SSE subscribers, non-blocking emit.
"""

from __future__ import annotations

import asyncio
import logging
import time
import uuid
from collections import deque
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Tuple

logger = logging.getLogger("vllm_i64_tpu.events")

EVENT_KINDS = ("sandbox", "rag_search", "rag_index", "completion", "error")


@dataclass
class AgentEvent:
    type: str
    session_id: str
    timestamp: float = field(default_factory=time.time)
    event_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    data: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return asdict(self)


class _Subscriber:
    __slots__ = ("sub_id", "queue")

    def __init__(self, maxsize: int = 500):
        self.sub_id = uuid.uuid4().hex[:8]
        self.queue: asyncio.Queue = asyncio.Queue(maxsize=maxsize)


class EventBus:
    """Bounded-history fan-out bus; slow subscribers drop, never block."""

    def __init__(self, history_limit: int = 200):
        self._history: deque = deque(maxlen=history_limit)
        self._subs: Dict[str, _Subscriber] = {}
        self.dropped = 0

    def emit(self, event: AgentEvent) -> None:
        self._history.append(event)
        for sub in list(self._subs.values()):
            try:
                sub.queue.put_nowait(event)
            except asyncio.QueueFull:
                self.dropped += 1
                logger.warning("subscriber %s full; event dropped",
                               sub.sub_id)

    def subscribe(self) -> Tuple[str, asyncio.Queue]:
        sub = _Subscriber()
        self._subs[sub.sub_id] = sub
        return sub.sub_id, sub.queue

    def unsubscribe(self, sub_id: str) -> None:
        self._subs.pop(sub_id, None)

    def _iter_history(self, session_id: Optional[str]) -> Iterator[AgentEvent]:
        for ev in self._history:
            if session_id is None or ev.session_id == session_id:
                yield ev

    def get_history(self, session_id: Optional[str] = None,
                    limit: int = 50) -> List[dict]:
        rows = [ev.to_dict() for ev in self._iter_history(session_id)]
        return rows[-limit:]

    @property
    def subscriber_count(self) -> int:
        return len(self._subs)
