"""/v1/completions + /v1/chat/completions handlers with SSE streaming
(ref: vllm_i64/api/_completions.py)."""

from __future__ import annotations

import asyncio
import hashlib
import json
import time
import uuid
from typing import AsyncGenerator, List, Optional

from aiohttp import web

from ..core.context_manager import ContextWindowError
from ..core.tool_parser import ToolCallParser
from .types import CompletionRequest, CompletionResponse, compute_partition


def _error(message: str, type_: str = "invalid_request_error", status: int = 400):
    return web.json_response(
        {"error": {"message": message, "type": type_}}, status=status)


class CompletionsMixin:
    """Requires: self.async_engine, self.engine, self.tokenizer,
    self.chat_template, self.model_name, trackers, self.context_manager."""

    # -- helpers ---------------------------------------------------------------

    @staticmethod
    def _request_api_key(request: web.Request) -> Optional[str]:
        auth = request.headers.get("Authorization", "")
        return auth[7:] if auth.startswith("Bearer ") else None

    @staticmethod
    def _cache_namespace(api_key: Optional[str], user_id: Optional[str] = None,
                         conversation_id: Optional[str] = None) -> Optional[bytes]:
        """16-byte tenant+conversation KV namespace
        (ref: _completions.py:30-48)."""
        scope = conversation_id or user_id
        if not api_key and not scope:
            return None
        return hashlib.sha256(f"{api_key or ''}\0{scope or ''}".encode()).digest()[:16]

    @staticmethod
    def _chat_conversation_id(request: web.Request, body: dict) -> str:
        """Stable per-conversation scope, or a fresh one for anonymous chats
        (ref: _completions.py:50-65)."""
        return (
            body.get("conversation_id")
            or body.get("user")
            or request.headers.get("X-Conversation-Id")
            or request.headers.get("X-Session-Id")
            or f"anonymous-chat-{uuid.uuid4().hex}"
        )

    def _next_request_id(self) -> str:
        return f"cmpl-{uuid.uuid4().hex[:24]}"

    def _encode(self, text: str) -> List[int]:
        return list(self.tokenizer.encode(text)) if self.tokenizer else [
            ord(c) % 256 for c in text]

    def _decode(self, ids: List[int]) -> str:
        return self.tokenizer.decode(ids) if self.tokenizer else "".join(
            chr(max(32, t % 127)) for t in ids)

    def _render_chat(self, messages) -> str:
        if self.chat_template is not None:
            return self.chat_template.apply(messages, add_generation_prompt=True)
        return "\n".join(f"{m['role']}: {m['content']}" for m in messages) + "\nassistant:"

    # -- VLM image intake (ref: _helpers.py:77-101, 196-211) ---------------------

    @staticmethod
    def _extract_content_text(content) -> str:
        """OpenAI multi-part content -> flat text; image parts become
        <image> markers (ref: _helpers.py:64-74)."""
        if isinstance(content, list):
            parts = []
            for item in content:
                if item.get("type") == "text":
                    parts.append(item.get("text", ""))
                elif item.get("type") == "image_url":
                    parts.append("<image>")
            return "\n".join(p for p in parts if p)
        return str(content) if content else ""

    @classmethod
    def _normalize_chat_messages(cls, messages) -> list:
        return [
            {**m, "content": cls._extract_content_text(m.get("content", ""))}
            for m in messages
        ]

    def _extract_images_from_messages(self, messages) -> list:
        """Decode base64 data-URL images from multi-part chat content.
        Returns a list of (H, W, 3) uint8 arrays."""
        import base64
        import io

        images = []
        for msg in messages:
            content = msg.get("content")
            if not isinstance(content, list):
                continue
            for item in content:
                if item.get("type") != "image_url":
                    continue
                url = item.get("image_url", {})
                url = url.get("url", "") if isinstance(url, dict) else str(url)
                if not url:
                    continue
                if not url.startswith("data:"):
                    self.logger.warning(
                        "non-base64 image URLs not supported: %s...", url[:60])
                    continue
                try:
                    from PIL import Image
                    import numpy as _np

                    _, b64 = url.split(",", 1)
                    img = Image.open(
                        io.BytesIO(base64.b64decode(b64))).convert("RGB")
                    images.append(_np.asarray(img))
                except Exception as exc:
                    self.logger.error("failed to decode image: %s", exc)
        return images

    def _build_response(self, result, prompt_ids: List[int]) -> CompletionResponse:
        text = self._decode(result.output_tokens)
        choice = {"index": 0, "text": text,
                  "finish_reason": result.finish_reason}
        if result.logprobs:
            choice["logprobs"] = {
                "token_logprobs": [lp.logprob for lp in result.logprobs],
                "tokens": [self._decode([lp.token_id]) for lp in result.logprobs],
                "top_logprobs": [
                    {self._decode([t]): v for t, v in (lp.top_logprobs or {}).items()}
                    for lp in result.logprobs
                ],
            }
        return CompletionResponse(
            id=self._next_request_id(),
            created=int(time.time()),
            model=self.model_name,
            choices=[choice],
            usage={
                "prompt_tokens": len(prompt_ids),
                "completion_tokens": len(result.output_tokens),
                "total_tokens": len(prompt_ids) + len(result.output_tokens),
            },
        )

    # -- generation cores -------------------------------------------------------

    async def _async_complete(self, req: CompletionRequest,
                              api_key: Optional[str],
                              endpoint: str = "/v1/completions") -> CompletionResponse:
        t0 = time.monotonic()
        prom = getattr(self, "_prometheus", None)
        prom_t0 = prom.on_request_start() if prom else None
        prompt_ids = req._prompt_token_ids
        ns = self._cache_namespace(api_key, req.user)
        priority = -self._priority_manager.get_priority(api_key, req.priority)
        soft_kw = {}
        if req._soft is not None:
            soft_kw = {"soft_embeds": req._soft[0],
                       "soft_positions": req._soft[1]}
        result = await self.async_engine.generate(
            prompt_ids,
            sampling_params=req.to_sampling_params(tokenizer=self.tokenizer),
            priority=priority,
            cache_namespace=ns,
            **soft_kw,
        )
        resp = self._build_response(result, prompt_ids)
        if req._context_metrics is not None:
            resp.context_metrics = req._context_metrics
        latency_ms = (time.monotonic() - t0) * 1000
        if prom:
            prom.on_request_end(prom_t0, len(prompt_ids),
                                len(result.output_tokens))
        self._usage_tracker.record(api_key or "", len(prompt_ids),
                                   len(result.output_tokens))
        self._latency_tracker.record(endpoint, latency_ms)
        self._request_logger.log_request(
            endpoint=endpoint, status=200, latency_ms=latency_ms,
            prompt_tokens=len(prompt_ids),
            completion_tokens=len(result.output_tokens),
            api_key=api_key, request_id=resp.id,
            partition=compute_partition(api_key, req.user),
            context_metrics=req._context_metrics,
        )
        return resp

    async def _sse_stream(self, req: CompletionRequest, api_key: Optional[str],
                          chat: bool) -> AsyncGenerator[str, None]:
        """Unified SSE generator: detokenize-delta chunks, final
        finish_reason chunk, [DONE] sentinel (ref: _completions.py:113-196)."""
        prompt_ids = req._prompt_token_ids
        stream_id = self._next_request_id()
        created = int(time.time())
        obj = "chat.completion.chunk" if chat else "text_completion"
        ns = self._cache_namespace(
            api_key, req.user if not chat else None,
            req.user if chat else None)

        def chunk(payload_choice: dict, extra: Optional[dict] = None) -> str:
            data = {"id": stream_id, "object": obj, "created": created,
                    "model": self.model_name, "choices": [payload_choice]}
            if extra:
                data.update(extra)
            return f"data: {json.dumps(data)}\n\n"

        if chat:
            extra = ({"context_metrics": req._context_metrics}
                     if req._context_metrics is not None else None)
            yield chunk({"index": 0,
                         "delta": {"role": "assistant", "content": ""},
                         "finish_reason": None}, extra)

        output_ids: List[int] = []
        prev_text = ""
        finish_reason = "length"
        t_start = time.perf_counter()
        prom = getattr(self, "_prometheus", None)
        prom_t0 = prom.on_request_start() if prom else None
        priority = -self._priority_manager.get_priority(api_key, req.priority)
        soft_kw = {}
        if req._soft is not None:
            soft_kw = {"soft_embeds": req._soft[0],
                       "soft_positions": req._soft[1]}
        async for item in self.async_engine.generate_stream(
            prompt_ids,
            sampling_params=req.to_sampling_params(tokenizer=self.tokenizer),
            priority=priority,
            cache_namespace=ns,
            coalesce=True,  # one SSE chunk per delivery batch, not per token
            **soft_kw,
        ):
            if isinstance(item, tuple) and item[0] == "__done__":
                finish_reason = item[1]
                break
            output_ids.extend(item if isinstance(item, list) else [item])
            full = self._decode(output_ids)
            delta = full[len(prev_text):]
            prev_text = full
            if not delta:
                continue
            if chat:
                yield chunk({"index": 0, "delta": {"content": delta},
                             "finish_reason": None})
            else:
                yield chunk({"index": 0, "text": delta, "finish_reason": None})

        if chat:
            yield chunk({"index": 0, "delta": {}, "finish_reason": finish_reason})
        else:
            yield chunk({"index": 0, "text": "", "finish_reason": finish_reason})
        yield "data: [DONE]\n\n"
        # streamed traffic must be visible to /v1/usage, /v1/metrics and
        # /v1/logs just like non-streamed responses
        endpoint = "/v1/chat/completions" if chat else "/v1/completions"
        latency_ms = (time.perf_counter() - t_start) * 1000
        if prom:
            prom.on_request_end(prom_t0, len(prompt_ids), len(output_ids))
        self._usage_tracker.record(api_key or "", len(prompt_ids),
                                   len(output_ids))
        self._latency_tracker.record(endpoint, latency_ms)
        self._request_logger.log_request(
            endpoint=endpoint, status=200, latency_ms=latency_ms,
            prompt_tokens=len(prompt_ids), completion_tokens=len(output_ids),
            api_key=api_key, request_id=stream_id)

    async def _write_sse(self, request: web.Request, gen) -> web.StreamResponse:
        response = web.StreamResponse()
        response.content_type = "text/event-stream"
        response.headers["Cache-Control"] = "no-cache"
        await response.prepare(request)
        try:
            async for chunk in gen:
                await response.write(chunk.encode())
        except (ConnectionResetError, ConnectionError):
            await gen.aclose()
        return response

    # -- HTTP handlers -------------------------------------------------------------

    async def handle_completions(self, request: web.Request) -> web.Response:
        """POST /v1/completions"""
        if self.async_engine is None:
            return _error("No model loaded", "server_error", 503)
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        prompt = body.get("prompt")
        # OpenAI-style prompt forms: a string, a 1-element list of strings,
        # or a list of token IDs (pre-tokenized — the natural form for an
        # integer-routed engine).
        if isinstance(prompt, list) and len(prompt) == 1 and isinstance(prompt[0], str):
            prompt = prompt[0]
        pre_tokenized = None
        if isinstance(prompt, list):
            if prompt and all(
                isinstance(t, int) and not isinstance(t, bool) for t in prompt
            ):
                pre_tokenized = [int(t) for t in prompt]
                prompt = self._decode(pre_tokenized)
            else:
                return _error(
                    "'prompt' must be a string or a non-empty list of token IDs")
        if not prompt and pre_tokenized is None:
            return _error("Missing 'prompt'")

        req = CompletionRequest.from_body(
            body, prompt, suppress_first_tokens=self._space_suppress_ids)
        if pre_tokenized is not None:
            req._prompt_token_ids = pre_tokenized
        max_seq_len = self.engine.engine_config.max_seq_len
        err = req.validate(max_seq_len=max_seq_len)
        if err:
            return _error(err)
        prompt_ids = pre_tokenized if pre_tokenized is not None else self._encode(req.prompt)
        err = req.validate(max_seq_len=max_seq_len, prompt_tokens=len(prompt_ids))
        if err:
            return _error(err)
        req._prompt_token_ids = prompt_ids
        api_key = self._request_api_key(request)

        try:
            if req.stream:
                return await self._write_sse(
                    request, self._sse_stream(req, api_key, chat=False))

            cache_kw = dict(
                temperature=req.temperature, top_k=req.top_k, top_p=req.top_p,
                min_p=req.min_p, typical_p=req.typical_p,
                repetition_penalty=req.repetition_penalty,
                frequency_penalty=req.frequency_penalty,
                presence_penalty=req.presence_penalty, seed=req.seed,
                # every field that changes the RESPONSE must be in the
                # fingerprint, or requests differing only here would share
                # a cache entry and receive each other's outputs
                stop=repr(req.stop), min_tokens=req.min_tokens,
                response_format=repr(req.response_format),
                logit_bias=repr(req.logit_bias), logprobs=req.logprobs,
                best_of=req.best_of,
                suppress_first=repr(req.suppress_first_tokens),
            )
            if pre_tokenized is not None:
                # decoded text may collide with a literal text prompt that
                # tokenizes differently — key the cache on the IDs themselves
                cache_kw["pretokenized"] = ",".join(map(str, pre_tokenized))
            cached = self._request_cache.get(req.prompt, req.max_tokens, **cache_kw)
            if cached is not None:
                return web.json_response(cached)
            resp = await self._async_complete(req, api_key)
            out = resp.to_dict()
            self._request_cache.put(req.prompt, req.max_tokens, out, **cache_kw)
            return web.json_response(out)
        except (ConnectionResetError, ConnectionError):
            return web.Response(status=499, text="Client disconnected")
        except Exception as exc:
            self.logger.error("completion error: %s", exc, exc_info=True)
            return _error("Internal server error", "server_error", 500)

    async def handle_chat_completions(self, request: web.Request) -> web.Response:
        """POST /v1/chat/completions"""
        if self.async_engine is None:
            return _error("No model loaded", "server_error", 503)
        try:
            body = await request.json()
        except Exception:
            return _error("Invalid JSON")
        messages = body.get("messages")
        if not messages:
            return _error("Missing 'messages'")

        # VLM: pull base64 images out of multi-part content, then flatten
        # the content to text (image parts -> <image> markers) for the
        # template/context path (ref: _completions.py:301-304)
        images = self._extract_images_from_messages(messages)
        soft_embeds = None
        if images:
            if getattr(self.engine, "vision_params", None) is None:
                return _error(
                    "this model has no vision tower; image input unsupported")
            import numpy as _np

            loop = asyncio.get_running_loop()
            encoded = await loop.run_in_executor(
                None,
                lambda: [self.engine.encode_images(img) for img in images])
            # (N_img, patches, H) rows flattened in message order
            soft_embeds = _np.concatenate(
                [e.reshape(-1, e.shape[-1]) for e in encoded], axis=0)

        context_messages = self._normalize_chat_messages(messages)

        # RAG context injection (ref: _completions.py:307-320)
        if body.get("rag") and getattr(self, "retriever", None) is not None:
            query = context_messages[-1].get("content", "")
            if isinstance(query, str) and query:
                ctx = self.retriever.get_context(query, k=body.get("rag_k", 3))
                if ctx:
                    context_messages = [
                        {"role": "system",
                         "content": f"Retrieved context for this request:\n{ctx}"},
                        *context_messages,
                    ]

        max_tokens = body.get("max_tokens", 256)
        max_seq_len = self.engine.engine_config.max_seq_len
        cm_mode = body.get("context_management", "auto")
        cm_enabled = cm_mode not in (False, None, "disabled", "off", "none")
        try:
            if cm_enabled and self.context_manager is not None:
                plan = self.context_manager.fit(
                    context_messages, max_output_tokens=max_tokens)
                prompt, prompt_ids = plan.prompt, plan.prompt_token_ids
                context_metrics = plan.to_metrics()
                context_metrics["policy"] = "rolling_summary"
            else:
                prompt = self._render_chat(context_messages)
                prompt_ids = self._encode(prompt)
                context_metrics = {
                    "compressed": False, "policy": "disabled",
                    "max_seq_len": max_seq_len,
                    "reserved_output_tokens": max_tokens,
                    "available_prompt_tokens": max_seq_len - max_tokens,
                    "original_messages": len(context_messages),
                    "retained_messages": len(context_messages),
                    "summarized_messages": 0, "dropped_messages": 0,
                    "original_tokens": len(prompt_ids),
                    "prompt_tokens": len(prompt_ids),
                    "summary_tokens": 0, "tokens_saved": 0,
                }
        except ContextWindowError as exc:
            return _error(str(exc))

        soft = None
        if soft_embeds is not None:
            # soft tokens ride at the head of the prompt on image-placeholder
            # ids (which also drive their deterministic MoE routing)
            img_id = self.engine.model_config.resolved_image_token_id
            n_soft = len(soft_embeds)
            prompt_ids = [img_id] * n_soft + list(prompt_ids)
            soft = (soft_embeds, list(range(n_soft)))

        req = CompletionRequest.from_body(
            body, prompt, suppress_first_tokens=self._space_suppress_ids,
            user=self._chat_conversation_id(request, body))
        req.stop = self._chat_stop_sequences(body.get("stop"))
        req._prompt_token_ids = prompt_ids
        req._context_metrics = context_metrics
        req._soft = soft

        err = req.validate(max_seq_len=max_seq_len, prompt_tokens=len(prompt_ids))
        if err:
            return _error(err)
        self._context_tracker.record(context_metrics)
        api_key = self._request_api_key(request)

        try:
            if req.stream:
                return await self._write_sse(
                    request, self._sse_stream(req, api_key, chat=True))

            resp = await self._async_complete(
                req, api_key, endpoint="/v1/chat/completions")
            out = resp.to_dict()
            if out["choices"]:
                text = out["choices"][0]["text"]
                finish = out["choices"][0].get("finish_reason", "length")
                message = {"role": "assistant", "content": text}
                tools = body.get("tools")
                if tools:
                    calls = ToolCallParser(tools).parse(text)
                    if calls:
                        message["tool_calls"] = [c.to_openai() for c in calls]
                        finish = "tool_calls"
                choice = {"message": message, "index": 0, "finish_reason": finish}
                if "logprobs" in out["choices"][0]:
                    choice["logprobs"] = out["choices"][0]["logprobs"]
                out["choices"][0] = choice
            out["object"] = "chat.completion"
            return web.json_response(out)
        except (ConnectionResetError, ConnectionError):
            return web.Response(status=499, text="Client disconnected")
        except Exception as exc:
            self.logger.error("chat completion error: %s", exc, exc_info=True)
            return _error("Internal server error", "server_error", 500)

    def _chat_stop_sequences(self, stop) -> Optional[list]:
        """Chat default stops: the template's role markers end a turn.

        A bare string is ONE stop sequence (OpenAI string form), never
        iterated character-by-character."""
        if isinstance(stop, str):
            stop = [stop]
        stops = list(stop) if stop else []
        return stops or None
