"""Sandboxed code execution (ref: vllm_i64/sandbox/)."""

from .executor import ExecResult, Sandbox, validate_code

__all__ = ["Sandbox", "ExecResult", "validate_code"]
