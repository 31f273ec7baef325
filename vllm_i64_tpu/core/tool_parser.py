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
def _scan_json_objects(text: str) -> List[str]:
    """Balanced-brace scan for candidate JSON objects mentioning "name".

    A character-class regex cannot match nested argument objects
    ({"arguments": {"filter": {...}}}) and required a fixed key order;
    raw_decode from each '{' handles arbitrary nesting and ordering."""
    import json as _json

    out: List[str] = []
    dec = _json.JSONDecoder()
    i = 0
    while True:
        i = text.find("{", i)
        if i < 0:
            break
        try:
            obj, end = dec.raw_decode(text[i:])
        except _json.JSONDecodeError:
            i += 1
            continue
        if isinstance(obj, dict) and "name" in obj and "arguments" in obj:
            out.append(text[i:i + end])
            i += end
        else:
            i += 1
    return out


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
        # tools come raw from the request body — malformed entries (missing
        # "name", non-dict "function", bare strings) must not 500 a request
        # whose generation already succeeded
        self.names = set()
        for t in tools:
            if not isinstance(t, dict) or t.get("type") != "function":
                continue
            fn = t.get("function")
            if isinstance(fn, dict) and isinstance(fn.get("name"), str):
                self.names.add(fn["name"])

    def parse(self, text: str) -> Optional[List[ToolCall]]:
        calls = [c for m in _TAG_RE.finditer(text)
                 if (c := self._from_json(m.group(1)))]
        if calls:
            return calls
        calls = [c for cand in _scan_json_objects(text)
                 if (c := self._from_json(cand))]
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
