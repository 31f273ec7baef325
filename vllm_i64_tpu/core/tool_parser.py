"""OpenAI-compatible tool/function call extraction from generated text.

Strategies (ref: vllm_i64/core/tool_parser.py:36-97):
  1. ``<tool_call>{...}</tool_call>`` tags
  2. bare JSON objects with "name" + "arguments" fields
Calls are validated against the request's declared tool names.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass
from typing import Dict, List, Optional

_TAG_RE = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)
_JSON_RE = re.compile(
    r'\{[^{}]*"name"\s*:\s*"[^"]*"[^{}]*"arguments"\s*:\s*\{[^}]*\}[^{}]*\}',
    re.DOTALL,
)


@dataclass
class ToolCall:
    id: str
    type: str = "function"
    function_name: str = ""
    function_arguments: str = ""  # JSON string

    def to_openai(self) -> dict:
        return {
            "id": self.id,
            "type": self.type,
            "function": {
                "name": self.function_name,
                "arguments": self.function_arguments,
            },
        }


class ToolCallParser:
    def __init__(self, tools: List[Dict]):
        self.names = {
            t["function"]["name"]
            for t in tools
            if t.get("type") == "function" and "function" in t
        }

    def parse(self, text: str) -> Optional[List[ToolCall]]:
        calls = [c for m in _TAG_RE.finditer(text)
                 if (c := self._from_json(m.group(1)))]
        if calls:
            return calls
        calls = [c for m in _JSON_RE.finditer(text)
                 if (c := self._from_json(m.group(0)))]
        return calls or None

    def _from_json(self, text: str) -> Optional[ToolCall]:
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            return None
        name = data.get("name", "")
        if name not in self.names:
            return None
        args = data.get("arguments", {})
        if isinstance(args, dict):
            args = json.dumps(args)
        return ToolCall(
            id=f"call_{uuid.uuid4().hex[:8]}",
            function_name=name,
            function_arguments=args,
        )
