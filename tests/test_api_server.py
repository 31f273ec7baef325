"""API server tests: in-process aiohttp client against a real Server wrapping
a model-less engine (ref: tests/test_api_server.py:16-48 — the central
fixture trick: model=None emits random logits, real scheduler/batching)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_i64_tpu.api import Server
from vllm_i64_tpu.config import EngineConfig
from vllm_i64_tpu.core.tokenizer import ByteTokenizer
from vllm_i64_tpu.engine import Engine

pytestmark = pytest.mark.asyncio


def make_server(**kw):
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=128, kv_block_size=4,
                        max_kv_blocks=128, max_prefill_tokens=64)
    eng = Engine(None, None, ecfg, tokenizer=ByteTokenizer())
    return Server(eng, tokenizer=ByteTokenizer(), model_name="test-model", **kw)


async def make_client(server) -> TestClient:
    app = server.build_app()
    client = TestClient(TestServer(app))
    await client.start_server()
    return client


async def test_health_and_root():
    client = await make_client(make_server())
    try:
        r = await client.get("/health")
        assert r.status == 200
        body = await r.json()
        assert body["status"] == "ok" and body["model"] == "test-model"
        r = await client.get("/")
        assert r.status == 200
        assert "/v1/completions" in (await r.json())["endpoints"]
    finally:
        await client.close()


async def test_completions_non_stream():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/completions", json={
            "prompt": "hello world", "max_tokens": 5, "temperature": 0.0})
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "text_completion"
        assert body["choices"][0]["finish_reason"] in ("stop", "length")
        assert body["usage"]["prompt_tokens"] == len("hello world")
        assert body["usage"]["completion_tokens"] <= 5
    finally:
        await client.close()


async def test_completions_validation_errors():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/completions", json={"max_tokens": 5})
        assert r.status == 400
        r = await client.post("/v1/completions", json={
            "prompt": "x", "max_tokens": 0})
        assert r.status == 400
        r = await client.post("/v1/completions", json={
            "prompt": "x" * 200, "max_tokens": 100})  # 200 + 100 > 128
        assert r.status == 400
        r = await client.post("/v1/completions", data=b"not json")
        assert r.status == 400
    finally:
        await client.close()


async def test_completions_streaming_sse():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/completions", json={
            "prompt": "abc", "max_tokens": 4, "temperature": 0.0,
            "stream": True})
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = (await r.read()).decode()
        events = [ln[6:] for ln in raw.splitlines() if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        final = json.loads(events[-2])
        assert final["choices"][0]["finish_reason"] in ("stop", "length")
    finally:
        await client.close()


async def test_chat_completions():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 5, "temperature": 0.0})
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "chat.completion"
        msg = body["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert "context_metrics" in body
    finally:
        await client.close()


async def test_chat_stream_first_chunk_has_context_metrics():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 3, "temperature": 0.0, "stream": True})
        raw = (await r.read()).decode()
        first = json.loads([ln[6:] for ln in raw.splitlines()
                            if ln.startswith("data: ")][0])
        assert first["object"] == "chat.completion.chunk"
        assert first["choices"][0]["delta"]["role"] == "assistant"
        assert "context_metrics" in first
    finally:
        await client.close()


async def test_auth_middleware():
    client = await make_client(make_server(api_key="secret-key"))
    try:
        r = await client.post("/v1/completions", json={
            "prompt": "x", "max_tokens": 2})
        assert r.status == 401
        r = await client.post(
            "/v1/completions", json={"prompt": "x", "max_tokens": 2,
                                     "temperature": 0.0},
            headers={"Authorization": "Bearer wrong"})
        assert r.status == 401
        r = await client.post(
            "/v1/completions", json={"prompt": "x", "max_tokens": 2,
                                     "temperature": 0.0},
            headers={"Authorization": "Bearer secret-key"})
        assert r.status == 200
        # /health is exempt from auth
        r = await client.get("/health")
        assert r.status == 200
    finally:
        await client.close()


async def test_rate_limit_middleware():
    client = await make_client(make_server(rate_limit=2))
    try:
        codes = []
        for _ in range(4):
            r = await client.post("/v1/tokenize", json={"text": "x"})
            codes.append(r.status)
        assert 429 in codes
        # GETs are not rate-charged
        r = await client.get("/health")
        assert r.status == 200
    finally:
        await client.close()


async def test_tokenize_and_embeddings():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/tokenize", json={"text": "abc"})
        assert (await r.json())["count"] == 3
        r = await client.post("/v1/embeddings", json={"input": ["a", "b"]})
        body = await r.json()
        assert len(body["data"]) == 2
        assert len(body["data"][0]["embedding"]) > 0
    finally:
        await client.close()


async def test_batch_endpoint():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/batch", json={
            "prompts": ["aa", "bb", "cc"], "max_tokens": 3,
            "temperature": 0.0})
        body = await r.json()
        assert len(body["results"]) == 3
        assert all("choices" in x or "error" in x for x in body["results"])
    finally:
        await client.close()


async def test_usage_metrics_logs_monitor():
    client = await make_client(make_server())
    try:
        await client.post("/v1/completions", json={
            "prompt": "hello", "max_tokens": 3, "temperature": 0.0})
        r = await client.get("/v1/usage")
        assert (await r.json())["total"]["requests"] >= 1
        r = await client.get("/v1/metrics")
        body = await r.json()
        assert body["usage"]["requests"] >= 1
        assert "latency" in body and "context" in body
        r = await client.get("/v1/logs")
        assert len((await r.json())["logs"]) >= 1
        r = await client.get("/v1/monitor")
        body = await r.json()
        assert "scheduler" in body and "kv_cache" in body
    finally:
        await client.close()


async def test_response_cache_hit():
    client = await make_client(make_server())
    try:
        r1 = await client.post("/v1/completions", json={
            "prompt": "cache me", "max_tokens": 4, "temperature": 0.0})
        b1 = await r1.json()
        r2 = await client.post("/v1/completions", json={
            "prompt": "cache me", "max_tokens": 4, "temperature": 0.0})
        b2 = await r2.json()
        assert b1["id"] == b2["id"]  # identical cached response
        r = await client.post("/v1/cache/purge")
        assert (await r.json())["purged_entries"] >= 1
    finally:
        await client.close()


async def test_models_and_docs():
    client = await make_client(make_server())
    try:
        r = await client.get("/v1/models")
        body = await r.json()
        ids = [m["id"] for m in body["data"]]
        assert "test-model" in ids and "tr-hash-moe-500m" in ids
        r = await client.get("/v1/models/test-model")
        assert (await r.json())["id"] == "test-model"
        r = await client.get("/docs")
        assert "/v1/completions" in (await r.json())["paths"]
    finally:
        await client.close()


async def test_priority_and_cancel():
    client = await make_client(make_server())
    try:
        r = await client.post("/v1/priority", json={
            "api_key": "k1", "priority": 5})
        assert (await r.json())["priorities"]["k1"] == 5
        r = await client.post("/v1/cancel/99999")
        assert (await r.json())["cancelled"] is False
    finally:
        await client.close()


async def test_ws_completions():
    client = await make_client(make_server())
    try:
        ws = await client.ws_connect("/v1/ws/completions")
        await ws.send_json({"prompt": "abc", "max_tokens": 3,
                            "temperature": 0.0})
        tokens, done = [], None
        async for msg in ws:
            data = json.loads(msg.data)
            if data.get("done"):
                done = data
                break
            if "token" in data:
                tokens.append(data["token"])
        assert done is not None and done["finish_reason"] in ("stop", "length")
        await ws.close()
    finally:
        await client.close()


async def test_expert_stats_modelless():
    client = await make_client(make_server())
    try:
        r = await client.get("/v1/experts")
        body = await r.json()
        # model-less engine still reports the configured expert count
        assert body["num_experts"] == 4
        assert len(body["distribution"]) == 4
    finally:
        await client.close()


async def test_agent_history_and_rag_disabled():
    client = await make_client(make_server())
    try:
        r = await client.get("/v1/agent/history")
        assert (await r.json())["events"] == []
        r = await client.post("/v1/rag/search", json={"query": "x"})
        assert r.status == 400
        r = await client.get("/v1/rag/stats")
        assert (await r.json())["enabled"] is False
        r = await client.post("/v1/execute", json={"code": "print(1)"})
        assert r.status == 400
    finally:
        await client.close()


async def test_load_shed_middleware():
    server = make_server(max_pending=0)
    # max_pending=0 disables; use 1 and saturate
    server.max_pending = 1
    client = await make_client(server)
    try:
        server.async_engine.active_requests = 5  # simulate saturation
        r = await client.post("/v1/tokenize", json={"text": "x"})
        assert r.status == 503
    finally:
        server.async_engine.active_requests = 0
        await client.close()


async def test_completions_prompt_forms():
    """OpenAI prompt forms: [str] unwraps, token-ID lists are pre-tokenized
    input (no tokenizer round-trip), malformed lists get clean 400s."""
    client = await make_client(make_server())
    try:
        async def post(p, **kw):
            return await client.post("/v1/completions", json={
                "prompt": p, "max_tokens": 4, "temperature": 0.0, **kw})

        r = await post(["hello world"])  # 1-element string list unwraps
        assert r.status == 200

        r = await post([72, 105, 33])  # token IDs
        assert r.status == 200
        body = await r.json()
        assert body["usage"]["prompt_tokens"] == 3
        assert body["choices"][0]["finish_reason"] in ("stop", "length")

        for bad in ([5, "x"], [], [True, False], [[1, 2], [3]]):
            r = await post(bad)
            assert r.status == 400, bad

        # streaming with token-ID prompt
        r = await post([72, 105, 33], stream=True)
        assert r.status == 200
        assert "[DONE]" in (await r.text())
    finally:
        await client.close()


async def test_chat_completions_with_image():
    """VLM path: base64 data-URL image -> vision tower -> soft tokens."""
    import base64
    import io

    import jax
    import numpy as np
    from PIL import Image

    from vllm_i64_tpu.config import ModelConfig
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.models.vision import VisionConfig, init_vision_params

    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=2, max_position_embeddings=256,
                      use_token_routed_mlp=False, num_experts=1,
                      shared_expert=False, image_token_id=1)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=256, kv_block_size=4,
                        max_kv_blocks=256, max_prefill_tokens=128)
    eng = Engine(params, cfg, ecfg, tokenizer=ByteTokenizer())
    vcfg = VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                        num_layers=2, num_heads=2, llm_hidden_size=128)
    eng.enable_vision(init_vision_params(vcfg, jax.random.PRNGKey(1)), vcfg)
    server = Server(eng, tokenizer=ByteTokenizer(), model_name="vlm-test")
    client = await make_client(server)
    try:
        img = Image.fromarray(np.random.default_rng(0).integers(
            0, 256, (24, 24, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        body = {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "describe"},
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}},
            ]}],
            "max_tokens": 4, "temperature": 0.0,
        }
        r = await client.post("/v1/chat/completions", json=body)
        assert r.status == 200, await r.text()
        out = await r.json()
        assert out["choices"][0]["message"]["content"] is not None
        # 16 patches of soft tokens ride at the head of the prompt
        assert out["usage"]["prompt_tokens"] > 16
    finally:
        await client.close()


async def test_chat_image_rejected_without_vision():
    import base64
    import io

    import numpy as np
    from PIL import Image

    client = await make_client(make_server())
    try:
        img = Image.fromarray(np.zeros((8, 8, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        body = {
            "messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}},
            ]}],
            "max_tokens": 4,
        }
        r = await client.post("/v1/chat/completions", json=body)
        assert r.status == 400
        assert "vision" in (await r.json())["error"]["message"]
    finally:
        await client.close()


async def test_ws_invalid_request_reports_error_frame():
    """Invalid WS requests must produce an {"error": ...} frame and keep
    the socket alive, not kill the connection."""
    client = await make_client(make_server())
    try:
        ws = await client.ws_connect("/v1/ws/completions")
        await ws.send_json({"prompt": "abc", "max_tokens": 0})
        msg = await ws.receive_json()
        assert "error" in msg and "max_tokens" in msg["error"]
        # socket still works for a valid request afterwards
        await ws.send_json({"prompt": "abc", "max_tokens": 2,
                            "temperature": 0.0})
        saw_done = False
        async for m in ws:
            data = json.loads(m.data)
            if data.get("done"):
                saw_done = True
                break
        assert saw_done
        await ws.close()
    finally:
        await client.close()


async def test_streaming_records_usage_and_logs():
    """Streamed completions must be visible to /v1/usage and /v1/logs."""
    client = await make_client(make_server())
    try:
        resp = await client.post("/v1/completions", json={
            "prompt": "abcd", "max_tokens": 3, "temperature": 0.0,
            "stream": True})
        assert resp.status == 200
        body = await resp.text()
        assert "data: [DONE]" in body
        usage = await (await client.get("/v1/usage")).json()
        assert usage["total"]["completion_tokens"] >= 3
        logs = await (await client.get("/v1/logs")).json()
        assert any(e.get("endpoint") == "/v1/completions"
                   for e in logs.get("entries", logs.get("logs", [])))
    finally:
        await client.close()
