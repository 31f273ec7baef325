"""In-process event bus -> SSE /v1/agent/events (ref: vllm_i64/api/events.py)."""

from __future__ import annotations

import asyncio
import logging
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, List, Optional, Tuple

logger = logging.getLogger("vllm_i64_tpu.events")


@dataclass
class AgentEvent:
    type: str  # "sandbox" | "rag_search" | "rag_index" | "completion" | "error"
    session_id: str
    timestamp: float = field(default_factory=time.time)
    event_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    data: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return asdict(self)


class EventBus:
    """Fan-out bus: every subscriber queue receives every event."""

    def __init__(self, history_limit: int = 200):
        self._subs: Dict[str, asyncio.Queue] = {}
        self._history: List[AgentEvent] = []
        self._history_limit = history_limit

    def emit(self, event: AgentEvent) -> None:
        self._history.append(event)
        if len(self._history) > self._history_limit:
            self._history = self._history[-self._history_limit:]
        for sub_id, queue in list(self._subs.items()):
            try:
                queue.put_nowait(event)
            except asyncio.QueueFull:
                logger.warning("subscriber %s queue full; dropping event", sub_id)

    def subscribe(self) -> Tuple[str, asyncio.Queue]:
        sub_id = uuid.uuid4().hex[:8]
        self._subs[sub_id] = asyncio.Queue(maxsize=500)
        return sub_id, self._subs[sub_id]

    def unsubscribe(self, sub_id: str) -> None:
        self._subs.pop(sub_id, None)

    def get_history(self, session_id: Optional[str] = None,
                    limit: int = 50) -> List[dict]:
        events = self._history
        if session_id:
            events = [e for e in events if e.session_id == session_id]
        return [e.to_dict() for e in events[-limit:]]

    @property
    def subscriber_count(self) -> int:
        return len(self._subs)
