"""Agent tool registry: fs read/write/list/search/grep, gated shell,
server-side code execution (ref: vllm_i64/agentics/tools.py)."""

from __future__ import annotations

import asyncio
import json
import re
import subprocess
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional

MAX_RESULT_CHARS = 8000


def _resolve_in_root(raw: str, root: Optional[Path]) -> Path:
    """Confine a tool path to the workspace root.

    Without confinement the fs tools gave arbitrary filesystem write even
    with allow_shell=False — writing ~/.ssh/authorized_keys is
    shell-equivalent. Paths resolve relative to root; absolute paths and
    .. escapes outside it are rejected."""
    p = Path(raw).expanduser()
    if root is None:
        return p
    base = root.resolve()
    resolved = (base / p).resolve() if not p.is_absolute() else p.resolve()
    if resolved != base and base not in resolved.parents:
        raise PermissionError(f"path escapes the workspace root: {raw}")
    return resolved


@dataclass
class Tool:
    name: str
    description: str
    parameters: Dict  # JSON schema of arguments
    fn: Callable[[dict], str] = field(repr=False, default=None)


def _clip(text: str) -> str:
    if len(text) > MAX_RESULT_CHARS:
        return text[:MAX_RESULT_CHARS] + f"\n...[truncated {len(text)} chars]"
    return text


def _read_file(args: dict, root: Optional[Path] = None) -> str:
    try:
        path = _resolve_in_root(args["path"], root)
    except PermissionError as exc:
        return f"error: {exc}"
    if not path.is_file():
        return f"error: {path} is not a file"
    return _clip(path.read_text(encoding="utf-8", errors="replace"))


def _write_file(args: dict, root: Optional[Path] = None) -> str:
    try:
        path = _resolve_in_root(args["path"], root)
    except PermissionError as exc:
        return f"error: {exc}"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(args.get("content", ""), encoding="utf-8")
    return f"wrote {len(args.get('content', ''))} chars to {path}"


def _list_dir(args: dict, root: Optional[Path] = None) -> str:
    try:
        path = _resolve_in_root(args.get("path", "."), root)
    except PermissionError as exc:
        return f"error: {exc}"
    if not path.is_dir():
        return f"error: {path} is not a directory"
    rows = []
    for p in sorted(path.iterdir())[:200]:
        kind = "d" if p.is_dir() else "f"
        rows.append(f"{kind} {p.name}")
    return "\n".join(rows) or "(empty)"


def _search_files(args: dict, root: Optional[Path] = None) -> str:
    try:
        base = _resolve_in_root(args.get("path", "."), root)
    except PermissionError as exc:
        return f"error: {exc}"
    pattern = args["pattern"]
    hits = [str(p) for p in base.rglob(pattern)][:100]
    return "\n".join(hits) or "(no matches)"


def _grep(args: dict, root: Optional[Path] = None) -> str:
    try:
        base = _resolve_in_root(args.get("path", "."), root)
    except PermissionError as exc:
        return f"error: {exc}"
    rx = re.compile(args["pattern"])
    out: List[str] = []
    files = [base] if base.is_file() else list(base.rglob("*"))
    for p in files:
        if not p.is_file() or p.stat().st_size > 1 << 20:
            continue
        try:
            for ln, line in enumerate(
                    p.read_text(encoding="utf-8", errors="replace").splitlines(), 1):
                if rx.search(line):
                    out.append(f"{p}:{ln}: {line.strip()}")
                    if len(out) >= 100:
                        return _clip("\n".join(out))
        except OSError:
            continue
    return _clip("\n".join(out)) or "(no matches)"


def _shell(args: dict) -> str:
    try:
        proc = subprocess.run(
            args["command"], shell=True, capture_output=True, timeout=30)
        return _clip((proc.stdout + proc.stderr).decode("utf-8",
                                                        errors="replace"))
    except subprocess.TimeoutExpired:
        return "error: command timed out"


def _make_execute_code(client) -> Callable[[dict], str]:
    def execute_code(args: dict) -> str:
        out = client.execute_code(args["code"])
        return json.dumps(out)
    return execute_code


def _schema(**props) -> Dict:
    return {"type": "object",
            "properties": {k: {"type": "string", "description": v}
                           for k, v in props.items()},
            "required": list(props)}


def get_tools(allow_shell: bool = False, client=None,
              workdir: Optional[str] = ".") -> Dict[str, Tool]:
    """Build the tool registry. ``workdir`` confines every fs tool (None
    disables confinement — only for trusted callers)."""
    import functools

    root = Path(workdir) if workdir is not None else None

    def fs(fn):
        return functools.partial(fn, root=root)

    tools = {
        "read_file": Tool("read_file", "Read a text file",
                          _schema(path="file path"), fs(_read_file)),
        "write_file": Tool("write_file", "Write content to a file",
                           _schema(path="file path", content="file content"),
                           fs(_write_file)),
        "list_dir": Tool("list_dir", "List a directory",
                         _schema(path="directory path"), fs(_list_dir)),
        "search_files": Tool("search_files", "Find files by glob pattern",
                             _schema(path="root dir", pattern="glob"),
                             fs(_search_files)),
        "grep": Tool("grep", "Regex search file contents",
                     _schema(path="file or dir", pattern="regex"), fs(_grep)),
    }
    if allow_shell:
        tools["shell"] = Tool("shell", "Run a shell command (30s timeout)",
                              _schema(command="shell command"), _shell)
    if client is not None:
        tools["execute_code"] = Tool(
            "execute_code", "Run Python in the server sandbox",
            _schema(code="python source"), _make_execute_code(client))
    return tools


def tools_to_openai(tools: Dict[str, Tool]) -> List[Dict]:
    return [{"type": "function",
             "function": {"name": t.name, "description": t.description,
                          "parameters": t.parameters}}
            for t in tools.values()]


def execute_tool_call(tools: Dict[str, Tool], tool_call: Dict) -> str:
    fn = tool_call.get("function", {})
    name = fn.get("name", "")
    if name not in tools:
        return f"error: unknown tool '{name}'"
    try:
        args = json.loads(fn.get("arguments") or "{}")
    except json.JSONDecodeError as exc:
        return f"error: bad arguments JSON: {exc}"
    try:
        return tools[name].fn(args)
    except Exception as exc:
        return f"error: {exc}"


async def execute_tools_parallel(tools: Dict[str, Tool],
                                 tool_calls: List[Dict]) -> List[str]:
    loop = asyncio.get_running_loop()
    return await asyncio.gather(*[
        loop.run_in_executor(None, execute_tool_call, tools, tc)
        for tc in tool_calls
    ])
