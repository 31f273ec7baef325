"""RAG + sandbox execution endpoints (ref: vllm_i64/api/_rag.py, _agent.py).

Handlers are live whenever a Retriever / Sandbox instance is attached to the
server; otherwise they return a clear 400.
"""

from __future__ import annotations

import asyncio
import time
import uuid

from aiohttp import web

from .events import AgentEvent


def _error(message: str, type_: str = "invalid_request_error", status: int = 400):
    return web.json_response(
        {"error": {"message": message, "type": type_}}, status=status)


class ServicesMixin:

    # -- RAG ----------------------------------------------------------------

    async def handle_rag_index(self, request: web.Request) -> web.Response:
        if self.retriever is None:
            return _error("RAG not enabled")
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        text = body.get("text")
        if not text:
            return _error("Missing 'text'")
        source = body.get("source", "api")
        loop = asyncio.get_running_loop()
        n_chunks = await loop.run_in_executor(
            None, lambda: self.retriever.index_text(text, source=source))
        self.event_bus.emit(AgentEvent(
            type="rag_index", session_id=body.get("session_id", "api"),
            data={"source": source, "chunks": n_chunks}))
        return web.json_response({"ok": True, "chunks_indexed": n_chunks})

    async def handle_rag_search(self, request: web.Request) -> web.Response:
        if self.retriever is None:
            return _error("RAG not enabled")
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        query = body.get("query")
        if not query:
            return _error("Missing 'query'")
        k = int(body.get("k", 3))
        loop = asyncio.get_running_loop()
        hits = await loop.run_in_executor(
            None, lambda: self.retriever.search(query, k=k))
        self.event_bus.emit(AgentEvent(
            type="rag_search", session_id=body.get("session_id", "api"),
            data={"query": query, "hits": len(hits)}))
        return web.json_response({
            "results": [
                {"text": h.text, "score": round(float(h.score), 4),
                 "source": h.source}
                for h in hits
            ],
        })

    async def handle_rag_stats(self, request: web.Request) -> web.Response:
        if self.retriever is None:
            return web.json_response({"enabled": False})
        return web.json_response({"enabled": True, **self.retriever.get_stats()})

    # -- sandbox -------------------------------------------------------------

    async def handle_execute(self, request: web.Request) -> web.Response:
        if self.sandbox is None:
            return _error("Sandbox not enabled")
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        code = body.get("code")
        if not code:
            return _error("Missing 'code'")
        session_id = body.get("session_id", f"exec-{uuid.uuid4().hex[:8]}")
        t0 = time.monotonic()
        loop = asyncio.get_running_loop()
        result = await loop.run_in_executor(None, self.sandbox.execute, code)
        elapsed_ms = (time.monotonic() - t0) * 1000
        self.event_bus.emit(AgentEvent(
            type="sandbox", session_id=session_id,
            data={"ok": result.ok, "elapsed_ms": round(elapsed_ms, 1)}))
        return web.json_response({
            "ok": result.ok,
            "stdout": result.stdout,
            "stderr": result.stderr,
            "error": result.error,
            "elapsed_ms": round(elapsed_ms, 1),
        })
