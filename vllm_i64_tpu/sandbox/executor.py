"""Sandboxed Python execution: fork -> limit -> exec -> collect -> kill.

Defensive layers mirror the reference sandbox (ref: vllm_i64/sandbox/
executor.py): (1) AST scan rejects imports of dangerous modules and
exec/eval/compile/__import__ calls; (2) a runtime preamble swaps in a
filtered __import__ and a builtins whitelist; (3) setrlimit caps CPU,
address space, and file size on Linux; (4) subprocess wall-clock timeout;
(5) optional setuid to an unprivileged user.
"""

from __future__ import annotations

import ast
import logging
import os
import subprocess
import sys
import tempfile
from dataclasses import dataclass
from typing import Optional, Set

logger = logging.getLogger("vllm_i64_tpu.sandbox")

BLOCKED_MODULES: Set[str] = frozenset({
    "os", "subprocess", "socket", "ctypes", "shutil", "signal",
    "multiprocessing", "threading", "importlib", "runpy", "code", "codeop",
    "pty", "pipes", "fcntl", "termios", "resource", "gc", "sys",
    "http", "urllib", "requests", "httpx", "aiohttp", "ftplib", "smtplib",
    "poplib", "imaplib", "telnetlib", "xmlrpc", "socketserver",
    "pickle", "shelve", "marshal", "tempfile", "mmap", "sysconfig", "_thread",
    "pathlib", "glob", "io", "builtins", "inspect",
})

_BLOCKED_ATTRS = frozenset({
    "__closure__", "__globals__", "__subclasses__", "__bases__", "__mro__",
    "__code__", "__builtins__", "__import__", "__getattribute__",
    "__reduce__", "__reduce_ex__", "__loader__", "__spec__", "gi_frame",
    "f_globals", "f_builtins", "cr_frame",
})

_ALLOWED_BUILTIN_NAMES = [
    "abs", "all", "any", "bin", "bool", "bytearray", "bytes", "callable",
    "chr", "complex", "dict", "dir", "divmod", "enumerate", "filter",
    "float", "format", "frozenset", "getattr", "hasattr", "hash", "hex",
    "id", "int", "isinstance", "issubclass", "iter", "len", "list", "map",
    "max", "min", "next", "object", "oct", "ord", "pow", "print", "range",
    "repr", "reversed", "round", "set", "slice", "sorted", "str", "sum",
    "super", "tuple", "type", "vars", "zip",
]


def validate_code(code: str) -> Optional[str]:
    """AST gate: returns a rejection message or None when acceptable."""
    try:
        tree = ast.parse(code)
    except SyntaxError:
        return None  # let the interpreter report it
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                top = alias.name.split(".")[0]
                if top in BLOCKED_MODULES:
                    return f"Blocked import: '{alias.name}'"
        elif isinstance(node, ast.ImportFrom):
            if node.module and node.module.split(".")[0] in BLOCKED_MODULES:
                return f"Blocked import: 'from {node.module} ...'"
        elif isinstance(node, ast.Call):
            fn = node.func
            if isinstance(fn, ast.Name) and fn.id in (
                    "__import__", "exec", "eval", "compile", "open"):
                return f"Blocked call: {fn.id}()"
            if isinstance(fn, ast.Attribute) and fn.attr == "__import__":
                return "Blocked call: __import__()"
        elif isinstance(node, ast.Attribute):
            # introspection escape hatches: function closures/globals reach
            # the real __import__; __subclasses__ walks to os._wrap_close
            if node.attr in _BLOCKED_ATTRS:
                return f"Blocked attribute: {node.attr}"
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            if node.value in _BLOCKED_ATTRS:
                return f"Blocked name in string literal: {node.value!r}"
    return None


_PREAMBLE = """\
import builtins as _b
_blocked = {blocked!r}
def _mk(orig, blocked):
    def _safe_import(name, *a, **k):
        if name.split('.')[0] in blocked:
            raise ImportError(f"module '{{name}}' is blocked in the sandbox")
        return orig(name, *a, **k)
    return _safe_import
_b.__import__ = _mk(_b.__import__, _blocked)
for _name in ("exec", "eval", "compile", "open", "input", "breakpoint"):
    if hasattr(_b, _name):
        def _make_stub(n):
            def _stub(*a, **k):
                raise RuntimeError(f"{{n}}() is blocked in the sandbox")
            return _stub
        setattr(_b, _name, _make_stub(_name))
# leave NO module-level handle to the original import or the factory —
# user code shares this module's globals
del _b, _name, _blocked, _mk, _make_stub
"""


@dataclass
class ExecResult:
    ok: bool
    stdout: str = ""
    stderr: str = ""
    error: Optional[str] = None
    returncode: int = 0


class Sandbox:
    def __init__(self, timeout_s: int = 5, max_memory_mb: int = 256,
                 max_output_bytes: int = 65536, user: Optional[str] = None):
        self.timeout_s = timeout_s
        self.max_memory_mb = max_memory_mb
        self.max_output_bytes = max_output_bytes
        self.user = user

    def _limits(self):
        """Child pre-exec: setrlimit + optional privilege drop (Linux)."""
        uid = gid = None
        if self.user:
            import pwd

            entry = pwd.getpwnam(self.user)
            uid, gid = entry.pw_uid, entry.pw_gid
        mem = self.max_memory_mb * 1024 * 1024

        def apply():
            import resource as r

            r.setrlimit(r.RLIMIT_CPU, (self.timeout_s, self.timeout_s + 1))
            r.setrlimit(r.RLIMIT_AS, (mem, mem))
            r.setrlimit(r.RLIMIT_FSIZE, (1 << 20, 1 << 20))
            r.setrlimit(r.RLIMIT_NPROC, (16, 16))
            if gid is not None:
                os.setgid(gid)
            if uid is not None:
                os.setuid(uid)
        return apply

    def execute(self, code: str, language: str = "python") -> ExecResult:
        if language != "python":
            return ExecResult(ok=False, error=f"unsupported language: {language}")
        reason = validate_code(code)
        if reason:
            return ExecResult(ok=False, error=reason)

        program = _PREAMBLE.format(blocked=set(BLOCKED_MODULES)) + "\n" + code
        with tempfile.NamedTemporaryFile(
                "w", suffix=".py", delete=False) as f:
            f.write(program)
            path = f.name
        out_f = tempfile.NamedTemporaryFile("wb", delete=False)
        err_f = tempfile.NamedTemporaryFile("wb", delete=False)
        try:
            # stdout/stderr go to FILES: RLIMIT_FSIZE bounds them in the
            # child, so a print-flood cannot balloon the SERVER's memory
            # the way an unbounded pipe buffered by subprocess.run did
            proc = subprocess.run(
                [sys.executable, "-I", path],
                stdout=out_f, stderr=err_f,
                timeout=self.timeout_s,
                preexec_fn=self._limits() if os.name == "posix" else None,
                env={"PATH": "", "PYTHONDONTWRITEBYTECODE": "1"},
                cwd=tempfile.gettempdir(),
            )
            out_f.close()
            err_f.close()
            with open(out_f.name, "rb") as f:
                stdout = f.read(self.max_output_bytes).decode(
                    "utf-8", errors="replace")
            with open(err_f.name, "rb") as f:
                stderr = f.read(self.max_output_bytes).decode(
                    "utf-8", errors="replace")
            return ExecResult(ok=proc.returncode == 0, stdout=stdout,
                              stderr=stderr, returncode=proc.returncode,
                              error=None if proc.returncode == 0 else "nonzero exit")
        except subprocess.TimeoutExpired:
            return ExecResult(ok=False, error=f"timeout after {self.timeout_s}s")
        except Exception as exc:
            return ExecResult(ok=False, error=str(exc))
        finally:
            for p in (path, out_f.name, err_f.name):
                try:
                    os.unlink(p)
                except OSError:
                    pass
