"""RAG, sandbox, agentics, CLI tests
(ref: vllm_i64/rag/, sandbox/, agentics/, cli.py)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from vllm_i64_tpu.rag import HashingEmbedder, Retriever, VectorIndex, chunk_text
from vllm_i64_tpu.sandbox import Sandbox, validate_code

# ---------------------------------------------------------------------------
# RAG
# ---------------------------------------------------------------------------


def test_chunk_text_overlap():
    text = " ".join(f"w{i}" for i in range(500))
    chunks = chunk_text(text, chunk_size=200, overlap=50)
    assert len(chunks) >= 3
    # consecutive chunks share `overlap` words
    first_words = chunks[0].split()
    second_words = chunks[1].split()
    assert first_words[150:200] == second_words[:50]


def test_vector_index_cosine_and_persistence(tmp_path):
    idx = VectorIndex(dim=4)
    idx.add(["a", "b"], np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32),
            source="t")
    hits = idx.search(np.array([0.9, 0.1, 0, 0], np.float32), k=2)
    assert idx.chunks[hits[0][0]] == "a"
    idx.save(str(tmp_path / "ix"))
    idx2 = VectorIndex.load(str(tmp_path / "ix"))
    assert idx2.chunks == ["a", "b"]
    np.testing.assert_allclose(idx2.vectors, idx.vectors)


def test_retriever_end_to_end(tmp_path):
    r = Retriever(embedder=HashingEmbedder(dim=64))
    n = r.index_text("the quick brown fox jumps over the lazy dog " * 30,
                     chunk_size=20, overlap=5, source="doc1")
    assert n >= 1
    r.index_text("paris is the capital of france " * 30,
                 chunk_size=20, overlap=5, source="doc2")
    hits = r.search("capital of france", k=2)
    assert hits and "france" in hits[0].text
    assert hits[0].source == "doc2"
    ctx = r.get_context("brown fox", k=1)
    assert "fox" in ctx
    r.save(str(tmp_path / "rag"))
    r2 = Retriever.load_or_create(str(tmp_path / "rag"))
    assert r2.get_stats()["chunks"] == r.get_stats()["chunks"]


def test_engine_embedder_with_model(tiny_config):
    import jax

    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.rag import EngineEmbedder

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=4,
                        max_kv_blocks=32, dtype="float32",
                        kv_cache_dtype="float32")
    eng = Engine(params, tiny_config, ecfg)
    emb = EngineEmbedder(eng)
    vecs = emb.encode(["hello", "hello", "different text"])
    assert vecs.shape == (3, tiny_config.hidden_size)
    np.testing.assert_allclose(vecs[0], vecs[1])  # deterministic
    assert not np.allclose(vecs[0], vecs[2])
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)


# ---------------------------------------------------------------------------
# sandbox
# ---------------------------------------------------------------------------


def test_validate_blocks_dangerous_imports():
    assert validate_code("import os") is not None
    assert validate_code("from subprocess import run") is not None
    assert validate_code("__import__('os')") is not None
    assert validate_code("eval('1+1')") is not None
    assert validate_code("open('/etc/passwd')") is not None
    assert validate_code("import math\nprint(math.pi)") is None


def test_sandbox_executes_safe_code():
    sb = Sandbox(timeout_s=10)
    result = sb.execute("import math\nprint(int(math.sqrt(144)))")
    assert result.ok, (result.error, result.stderr)
    assert result.stdout.strip() == "12"


def test_sandbox_blocks_at_runtime():
    sb = Sandbox(timeout_s=10)
    # AST check rejects it before execution
    r = sb.execute("import socket\nprint('x')")
    assert not r.ok and "Blocked" in r.error
    # indirect import attempt survives AST but dies at runtime
    r = sb.execute("m = getattr(__builtins__, '__im' + 'port__')('socket')")
    assert not r.ok


def test_sandbox_timeout():
    sb = Sandbox(timeout_s=2)
    r = sb.execute("while True:\n    pass")
    assert not r.ok
    assert "timeout" in (r.error or "") or r.returncode != 0


# ---------------------------------------------------------------------------
# agentics
# ---------------------------------------------------------------------------


def test_tools_fs_roundtrip(tmp_path):
    from vllm_i64_tpu.agentics.tools import execute_tool_call, get_tools

    # fs tools are confined to the workdir root (default '.')
    tools = get_tools(workdir=str(tmp_path))
    wr = execute_tool_call(tools, {"function": {
        "name": "write_file",
        "arguments": json.dumps({"path": str(tmp_path / "x.txt"),
                                 "content": "needle here"})}})
    assert "wrote" in wr
    rd = execute_tool_call(tools, {"function": {
        "name": "read_file",
        "arguments": json.dumps({"path": str(tmp_path / "x.txt")})}})
    assert rd == "needle here"
    gr = execute_tool_call(tools, {"function": {
        "name": "grep",
        "arguments": json.dumps({"path": str(tmp_path), "pattern": "needle"})}})
    assert "x.txt" in gr
    bad = execute_tool_call(tools, {"function": {"name": "nope",
                                                 "arguments": "{}"}})
    assert "unknown tool" in bad
    assert "shell" not in tools  # gated by default


async def test_agent_loop_with_fake_client(tmp_path):
    """Drive the ReAct loop with a scripted client: one tool call then a
    final answer."""
    from vllm_i64_tpu.agentics import Agent
    from vllm_i64_tpu.agentics.client import ChatMessage

    (tmp_path / "data.txt").write_text("the answer is 42")

    class FakeClient:
        def __init__(self):
            self.calls = 0

        def chat(self, messages, **kw):
            self.calls += 1
            if self.calls == 1:
                return ChatMessage(tool_calls=[{
                    "id": "call_1", "type": "function",
                    "function": {"name": "read_file",
                                 "arguments": json.dumps(
                                     {"path": str(tmp_path / "data.txt")})},
                }])
            assert any(m["role"] == "tool" and "42" in m["content"]
                       for m in messages)
            return ChatMessage(content="The answer is 42.")

    agent = Agent(client=FakeClient(), verbose=False,
                  workdir=str(tmp_path))
    out = await agent.arun("find the answer")
    assert out == "The answer is 42."


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "vllm_i64_tpu.cli", *args],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"})


def test_cli_list():
    out = run_cli("list")
    assert out.returncode == 0
    assert "tr-hash-moe-500m" in out.stdout
    assert "dense-306" in out.stdout


def test_cli_estimate():
    out = run_cli("estimate", "tr-hash-moe-500m", "--dtype", "int8")
    assert out.returncode == 0, out.stderr
    assert "TOTAL" in out.stdout
    assert "v5e" in out.stdout


def test_cli_check_unknown_model():
    out = run_cli("check", "not-a-model")
    assert out.returncode != 0


def test_cli_no_command_shows_help():
    out = run_cli()
    assert out.returncode == 1
