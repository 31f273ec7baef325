"""ReAct agent with OpenAI tool_calls + parallel tool execution
(ref: vllm_i64/agentics/agent.py)."""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Any, Dict, List, Optional

from .client import ChatMessage, Client
from .tools import Tool, execute_tools_parallel, get_tools, tools_to_openai

logger = logging.getLogger("vllm_i64_tpu.agentics")

SYSTEM_PROMPT = """\
You are an autonomous AI agent. Solve the task step by step.

You have tools. Call one or more tools when you need information or want to
act; independent tools may be called in parallel. When the task is complete,
answer in plain text with no tool calls.

Rules:
- Think before acting.
- Batch independent tool calls for efficiency.
- If a tool fails, try another approach.
- End with a clear final answer."""


class Agent:
    def __init__(
        self,
        client: Optional[Client] = None,
        base_url: str = "http://localhost:8000",
        api_key: Optional[str] = None,
        allow_shell: bool = False,
        max_steps: int = 20,
        temperature: float = 0.6,
        max_tokens: int = 1024,
        verbose: bool = True,
        tools: Optional[Dict[str, Tool]] = None,
        workdir: Optional[str] = ".",
    ):
        self.client = client or Client(base_url=base_url, api_key=api_key)
        self.tools = tools or get_tools(allow_shell=allow_shell,
                                        client=self.client, workdir=workdir)
        self.openai_tools = tools_to_openai(self.tools)
        self.max_steps = max_steps
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.verbose = verbose
        self.history: List[Dict[str, Any]] = []

    def _say(self, text: str) -> None:
        if self.verbose:
            print(text)

    def _call_llm(self) -> ChatMessage:
        return self.client.chat(
            messages=self.history,
            temperature=self.temperature,
            max_tokens=self.max_tokens,
            tools=self.openai_tools,
        )

    def run(self, task: str) -> str:
        return asyncio.run(self.arun(task))

    async def arun(self, task: str) -> str:
        self._say(f"[agent] task: {task}")
        self.history = [
            {"role": "system", "content": SYSTEM_PROMPT},
            {"role": "user", "content": task},
        ]
        for step in range(1, self.max_steps + 1):
            try:
                loop = asyncio.get_running_loop()
                response = await loop.run_in_executor(None, self._call_llm)
            except (ConnectionError, OSError, TimeoutError) as exc:
                self._say(f"[agent] error: {exc}")
                return f"Error: {exc}"

            if not response.has_tool_calls:
                self._say(f"[agent] done in {step} steps")
                return response.content

            self.history.append({
                "role": "assistant",
                "content": response.content,
                "tool_calls": response.tool_calls,
            })
            results = await execute_tools_parallel(
                self.tools, response.tool_calls)
            for tc, result in zip(response.tool_calls, results):
                name = tc.get("function", {}).get("name", "?")
                self._say(f"[tool] {name} -> {result[:120]}")
                self.history.append({
                    "role": "tool",
                    "tool_call_id": tc.get("id", ""),
                    "name": name,
                    "content": result,
                })
        return "Max steps reached without a final answer."

    def chat(self, message: str) -> str:
        """Single turn without tools."""
        return self.client.chat_text(
            message, temperature=self.temperature,
            max_tokens=self.max_tokens)
