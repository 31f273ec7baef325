"""HTTP client for a running vllm-i64-tpu server (OpenAI wire format)
(ref: vllm_i64/agentics/client.py). stdlib urllib only — no extra deps."""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Dict, List, Optional


class ChatMessage:
    def __init__(self, role: str = "assistant", content: str = "",
                 tool_calls: Optional[List[Dict]] = None,
                 finish_reason: str = ""):
        self.role = role
        self.content = content
        self.tool_calls = tool_calls or []
        self.finish_reason = finish_reason

    @property
    def has_tool_calls(self) -> bool:
        return bool(self.tool_calls)

    def __repr__(self):
        return (f"ChatMessage(role={self.role!r}, "
                f"tool_calls={len(self.tool_calls)}, "
                f"content={self.content[:60]!r})")


class Client:
    def __init__(self, base_url: str = "http://localhost:8000",
                 api_key: Optional[str] = None, timeout: int = 300):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    def _post(self, endpoint: str, body: dict) -> dict:
        data = json.dumps(body).encode()
        req = urllib.request.Request(
            f"{self.base_url}{endpoint}", data=data,
            headers={"Content-Type": "application/json",
                     **({"Authorization": f"Bearer {self.api_key}"}
                        if self.api_key else {})},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as exc:
            detail = exc.read().decode("utf-8", errors="replace")[:500]
            raise ConnectionError(f"HTTP {exc.code}: {detail}") from exc
        except urllib.error.URLError as exc:
            raise ConnectionError(str(exc.reason)) from exc

    def chat(self, messages: List[Dict], temperature: float = 0.6,
             max_tokens: int = 1024, tools: Optional[List[Dict]] = None,
             **kw) -> ChatMessage:
        body = {"messages": messages, "temperature": temperature,
                "max_tokens": max_tokens, **kw}
        if tools:
            body["tools"] = tools
        out = self._post("/v1/chat/completions", body)
        choice = out["choices"][0]
        msg = choice["message"]
        return ChatMessage(
            role=msg.get("role", "assistant"),
            content=msg.get("content", "") or "",
            tool_calls=msg.get("tool_calls"),
            finish_reason=choice.get("finish_reason", ""),
        )

    def chat_text(self, prompt: str, **kw) -> str:
        return self.chat([{"role": "user", "content": prompt}], **kw).content

    def complete(self, prompt: str, **kw) -> str:
        out = self._post("/v1/completions", {"prompt": prompt, **kw})
        return out["choices"][0]["text"]

    def execute_code(self, code: str) -> dict:
        return self._post("/v1/execute", {"code": code})

    def health(self) -> bool:
        try:
            req = urllib.request.Request(f"{self.base_url}/health")
            with urllib.request.urlopen(req, timeout=5) as resp:
                return json.loads(resp.read()).get("status") == "ok"
        except Exception:
            return False
