"""Admin/observability endpoints: health, models, tokenize, embeddings,
usage, batch, metrics, logs, priority, cancel, WebSocket completions,
OpenAPI, LoRA, cache stats/purge, monitor, /v1/experts
(ref: vllm_i64/api/_admin.py)."""

from __future__ import annotations

import asyncio
import json
import time
from typing import Optional

import numpy as np
from aiohttp import WSMsgType, web

from .types import CompletionRequest


def _error(message: str, type_: str = "invalid_request_error", status: int = 400):
    return web.json_response(
        {"error": {"message": message, "type": type_}}, status=status)


class AdminMixin:

    async def handle_root(self, request: web.Request) -> web.Response:
        return web.json_response({
            "service": "vllm-i64-tpu",
            "model": self.model_name,
            "endpoints": sorted({r.resource.canonical
                                 for r in request.app.router.routes()
                                 if r.resource is not None}),
        })

    async def handle_health(self, request: web.Request) -> web.Response:
        healthy = self.async_engine is not None
        body = {
            "status": "ok" if healthy else "no_engine",
            "model": self.model_name,
            "uptime_s": round(time.monotonic() - self._started_at, 1),
        }
        if healthy:
            body["active_requests"] = self.async_engine.active_requests
        return web.json_response(body)

    async def handle_models(self, request: web.Request) -> web.Response:
        from ..models.registry import list_models

        entries = []
        for e in list_models():
            entries.append({
                "id": e.name, "object": "model", "owned_by": "vllm-i64-tpu",
                "parameters": e.parameters, "description": e.description,
            })
        if not any(e["id"] == self.model_name for e in entries):
            entries.insert(0, {"id": self.model_name, "object": "model",
                               "owned_by": "vllm-i64-tpu"})
        return web.json_response({"object": "list", "data": entries})

    async def handle_model_info(self, request: web.Request) -> web.Response:
        model_id = request.match_info["model_id"]
        cfg = self.engine.model_config if self.engine else None
        info = {"id": model_id, "object": "model", "owned_by": "vllm-i64-tpu"}
        if cfg is not None and model_id == self.model_name:
            info.update({
                "vocab_size": cfg.vocab_size,
                "hidden_size": cfg.hidden_size,
                "num_hidden_layers": cfg.num_hidden_layers,
                "num_experts": cfg.num_experts,
                "top_k": cfg.effective_top_k,
                "max_seq_len": self.engine.engine_config.max_seq_len,
                "quantization": self.engine.engine_config.quantization,
            })
        return web.json_response(info)

    async def handle_tokenize(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        text = body.get("text")
        if text is None:
            return _error("Missing 'text'")
        ids = self._encode(text)
        return web.json_response({"tokens": ids, "count": len(ids)})

    async def handle_embeddings(self, request: web.Request) -> web.Response:
        """POST /v1/embeddings — mean-pooled normalized hidden states
        (ref: _admin.py:120-143, i64_engine.py:456-479)."""
        if self.engine is None:
            return _error("No model loaded", "server_error", 503)
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        inputs = body.get("input")
        if inputs is None:
            return _error("Missing 'input'")
        if isinstance(inputs, str):
            inputs = [inputs]
        loop = asyncio.get_running_loop()
        data = []
        total_tokens = 0
        for i, text in enumerate(inputs):
            ids = self._encode(text)
            total_tokens += len(ids)
            vec = await loop.run_in_executor(None, self.engine.embed, ids)
            data.append({"object": "embedding", "index": i,
                         "embedding": [float(x) for x in vec]})
        return web.json_response({
            "object": "list", "data": data, "model": self.model_name,
            "usage": {"prompt_tokens": total_tokens,
                      "total_tokens": total_tokens},
        })

    async def handle_usage(self, request: web.Request) -> web.Response:
        api_key = self._request_api_key(request)
        return web.json_response({
            "total": self._usage_tracker.get_total(),
            "caller": self._usage_tracker.get(api_key or ""),
        })

    async def handle_batch(self, request: web.Request) -> web.Response:
        """POST /v1/batch — concurrent completions in one call
        (ref: _admin.py:198-248)."""
        if self.async_engine is None:
            return _error("No model loaded", "server_error", 503)
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        prompts = body.get("prompts")
        if not prompts or not isinstance(prompts, list):
            return _error("Missing 'prompts' (list)")
        if len(prompts) > 64:
            return _error("Too many prompts (max 64)")
        api_key = self._request_api_key(request)
        max_seq_len = self.engine.engine_config.max_seq_len

        async def one(prompt: str):
            req = CompletionRequest.from_body(body, prompt)
            err = req.validate(max_seq_len=max_seq_len)
            if err:
                return {"error": err}
            req._prompt_token_ids = self._encode(prompt)
            err = req.validate(max_seq_len=max_seq_len,
                               prompt_tokens=len(req._prompt_token_ids))
            if err:
                return {"error": err}
            resp = await self._async_complete(req, api_key, endpoint="/v1/batch")
            return resp.to_dict()

        results = await asyncio.gather(*[one(p) for p in prompts],
                                       return_exceptions=True)
        out = [({"error": str(r)} if isinstance(r, Exception) else r)
               for r in results]
        return web.json_response({"object": "batch", "results": out})

    async def handle_metrics(self, request: web.Request) -> web.Response:
        return web.json_response({
            "usage": self._usage_tracker.get_total(),
            "latency": self._latency_tracker.get_all_endpoints(),
            "context": self._context_tracker.snapshot(),
            "cache": {"response_cache_entries": self._request_cache.size},
            "engine": self.async_engine.get_stats() if self.async_engine else {},
        })

    async def handle_request_log(self, request: web.Request) -> web.Response:
        n = int(request.query.get("n", 50))
        return web.json_response({"logs": self._request_logger.get_recent(n)})

    async def handle_priority(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        api_key = body.get("api_key")
        priority = body.get("priority")
        if api_key is None or priority is None:
            return _error("Missing 'api_key' or 'priority'")
        self._priority_manager.set_priority(api_key, int(priority))
        return web.json_response({"ok": True,
                                  "priorities": self._priority_manager.get_all()})

    async def handle_cancel(self, request: web.Request) -> web.Response:
        rid = request.match_info["request_id"]
        try:
            rid = int(rid)
        except ValueError:
            return _error("request_id must be an integer")
        if self.engine is None:
            return web.json_response({"cancelled": False, "request_id": rid})
        # cancel contends on the engine lock, which step() holds across a
        # device dispatch (or a multi-second bucket compile) — run off-loop
        # so the whole HTTP server doesn't stall behind it
        loop = asyncio.get_running_loop()
        ok = await loop.run_in_executor(None, self.engine.cancel_request, rid)
        return web.json_response({"cancelled": bool(ok), "request_id": rid})

    async def handle_ws_completions(self, request: web.Request) -> web.WebSocketResponse:
        """GET /v1/ws/completions — WebSocket token streaming
        (ref: _admin.py:324-385). Protocol: client sends a completion JSON,
        server streams {"token": ...} then {"done": true, "finish_reason"}."""
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        api_key = self._request_api_key(request)
        async for msg in ws:
            if msg.type != WSMsgType.TEXT:
                break
            try:
                body = json.loads(msg.data)
            except json.JSONDecodeError:
                await ws.send_json({"error": "Invalid JSON"})
                continue
            prompt = body.get("prompt")
            if not prompt:
                await ws.send_json({"error": "Missing 'prompt'"})
                continue
            if self.async_engine is None:
                await ws.send_json({"error": "No model loaded"})
                continue
            req = CompletionRequest.from_body(body, prompt)
            req._prompt_token_ids = self._encode(prompt)
            err = req.validate(
                max_seq_len=self.engine.engine_config.max_seq_len,
                prompt_tokens=len(req._prompt_token_ids))
            if err:
                await ws.send_json({"error": err})
                continue
            output_ids = []
            prev = ""
            finish = "length"
            t0 = time.perf_counter()
            try:
                async for item in self.async_engine.generate_stream(
                    req._prompt_token_ids,
                    sampling_params=req.to_sampling_params(
                        tokenizer=self.tokenizer),
                    cache_namespace=self._cache_namespace(api_key, req.user),
                ):
                    if isinstance(item, tuple) and item[0] == "__done__":
                        finish = item[1]
                        break
                    output_ids.append(item)
                    full = self._decode(output_ids)
                    delta = full[len(prev):]
                    prev = full
                    if delta:
                        await ws.send_json({"token": delta})
            except Exception as exc:  # noqa: BLE001 — surface, keep socket
                await ws.send_json({"error": str(exc)})
                continue
            await ws.send_json({"done": True, "finish_reason": finish,
                                "text": prev})
            self._usage_tracker.record(
                api_key or "", len(req._prompt_token_ids), len(output_ids))
            self._latency_tracker.record(
                "/v1/ws/completions", (time.perf_counter() - t0) * 1000)
        return ws

    async def handle_openapi(self, request: web.Request) -> web.Response:
        paths = sorted({r.resource.canonical
                        for r in request.app.router.routes()
                        if r.resource is not None})
        return web.json_response({
            "openapi": "3.0.0",
            "info": {"title": "vllm-i64-tpu", "version": "0.1.0"},
            "paths": {p: {} for p in paths},
        })

    # -- LoRA (wired to the engine's adapter manager) --------------------------

    async def handle_lora_load(self, request: web.Request) -> web.Response:
        if self.engine is None or self.engine.runner is None:
            return _error("LoRA requires a loaded model",
                          "invalid_request_error", 400)
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        name, path = body.get("name"), body.get("path")
        if not name or not path:
            return _error("Missing 'name' or 'path'")
        try:
            adapter_id = self.engine.load_lora_adapter(name, path)
            if body.get("activate"):
                self.engine.set_active_lora(name)
        except Exception as exc:
            return _error(f"load failed: {exc}", "server_error", 500)
        return web.json_response({"ok": True, "name": name,
                                  "adapter_id": adapter_id})

    async def handle_lora_unload(self, request: web.Request) -> web.Response:
        if self.engine is None or self.engine.lora_manager is None:
            return _error("LoRA not enabled", "invalid_request_error", 400)
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        name = body.get("name")
        if not name:
            return _error("Missing 'name'")
        ok = self.engine.lora_manager.unload_adapter(name)
        return web.json_response({"ok": bool(ok), "name": name})

    async def handle_lora_list(self, request: web.Request) -> web.Response:
        if self.engine is None or self.engine.lora_manager is None:
            return web.json_response({"adapters": []})
        return web.json_response(
            {"adapters": self.engine.lora_manager.list_adapters()})

    # -- cache / monitor / experts ----------------------------------------------

    async def handle_cache_stats(self, request: web.Request) -> web.Response:
        stats = {"response_cache": {"entries": self._request_cache.size}}
        if self.engine is not None:
            stats["kv_cache"] = self.engine.scheduler.blocks.get_stats()
        return web.json_response(stats)

    async def handle_cache_purge(self, request: web.Request) -> web.Response:
        purged = self._request_cache.purge()
        return web.json_response({"ok": True, "purged_entries": purged})

    async def handle_monitor(self, request: web.Request) -> web.Response:
        """GET /v1/monitor — one-shot live snapshot (ref: _admin.py:429-462)."""
        snapshot = {
            "ts": time.time(),
            "model": self.model_name,
            "active_requests": (self.async_engine.active_requests
                                if self.async_engine else 0),
        }
        if self.engine is not None:
            stats = self.engine.get_stats()
            snapshot["scheduler"] = {
                k: stats.get(k) for k in
                ("pending", "running", "finished", "free_kv_blocks")
            }
            snapshot["perf"] = stats.get("perf")
            snapshot["step_mix"] = stats.get("step_mix")
            snapshot["kv_cache"] = self.engine.scheduler.blocks.get_stats()
        return web.json_response(snapshot)

    async def handle_expert_stats(self, request: web.Request) -> web.Response:
        """GET /v1/experts — live routing distribution computed from the
        REAL loaded route tables (ref: _admin.py:464-509)."""
        engine = self.engine
        cfg = engine.model_config if engine else None
        if cfg is None or cfg.num_experts <= 1:
            return web.json_response(
                {"error": "Not a MoE model (num_experts <= 1)"}, status=400)
        E, K = cfg.num_experts, cfg.effective_top_k

        table = None  # (L, K, V) int
        if engine.runner is not None:
            mlp = engine.runner.params.get("layers", {}).get("mlp", {})
            if "route_table" in mlp:
                table = np.asarray(mlp["route_table"])
        num_layers = int(table.shape[0]) if table is not None else 0

        counts = np.zeros(E, np.int64)
        total_tokens = 0
        latest_token = None
        for req in list(engine.scheduler.running):
            for tid in req.output_token_ids:
                t = int(tid) % cfg.vocab_size
                latest_token = t
                if table is not None:
                    for layer in range(num_layers):
                        experts = table[layer, :, t]
                        np.add.at(counts, experts % E, 1)
                else:
                    counts[t % E] += 1
                total_tokens += 1

        total_act = int(counts.sum())
        latest_routes = []
        if latest_token is not None and table is not None:
            latest_routes = [
                {"layer": layer,
                 "experts": [int(x) for x in table[layer, :, latest_token] % E]}
                for layer in range(num_layers)
            ]
        active = bool(engine.scheduler.running)
        dist = ([round(float(c) / max(total_act, 1), 4) for c in counts]
                if total_tokens else [0.0] * E)
        resp = {
            "num_experts": E,
            "num_layers": num_layers,
            "top_k": K,
            "active": active,
            "total_tokens": total_tokens,
            "total_activations": total_act,
            "distribution": dist,
            "counts": [int(c) for c in counts],
            "latest": ({"token_id": latest_token, "routes": latest_routes}
                       if latest_token is not None else None),
        }
        if total_tokens:
            resp["imbalance"] = round(max(dist) - min(dist), 4)
            self._last_expert_response = resp
        elif not active and self._last_expert_response is not None:
            return web.json_response(
                {**self._last_expert_response, "active": False})
        return web.json_response(resp)

    # -- agent events -------------------------------------------------------------

    async def handle_agent_events(self, request: web.Request) -> web.StreamResponse:
        """GET /v1/agent/events — SSE stream off the event bus."""
        response = web.StreamResponse()
        response.content_type = "text/event-stream"
        response.headers["Cache-Control"] = "no-cache"
        await response.prepare(request)
        sub_id, queue = self.event_bus.subscribe()
        session_filter = request.query.get("session_id")
        try:
            while True:
                try:
                    event = await asyncio.wait_for(queue.get(), timeout=15.0)
                except asyncio.TimeoutError:
                    await response.write(b": keepalive\n\n")
                    continue
                if event is None:
                    break
                if session_filter and event.session_id != session_filter:
                    continue
                payload = json.dumps(event.to_dict())
                await response.write(f"data: {payload}\n\n".encode())
        except (ConnectionResetError, ConnectionError):
            pass
        finally:
            self.event_bus.unsubscribe(sub_id)
        return response

    async def handle_agent_history(self, request: web.Request) -> web.Response:
        return web.json_response({
            "events": self.event_bus.get_history(
                session_id=request.query.get("session_id"),
                limit=int(request.query.get("limit", 50))),
        })

    async def _handle_options(self, request: web.Request) -> web.Response:
        return web.Response()
