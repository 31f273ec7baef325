"""Content-level API tests (VERDICT r1 item 9):

- /v1/experts must report a MEASURED routing distribution from the real
  loaded route tables (not table-derived statics; ref: _admin.py:464-509)
- middleware exhaustion edges: token-bucket eviction/refill, load-shed
  reachability carve-outs, auth edge cases
- launcher env parsing
"""

import asyncio

import jax
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_i64_tpu.api.middleware import TokenBucketRateLimiter
from vllm_i64_tpu.api.server import Server
from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.core.tokenizer import ByteTokenizer
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm


def tiny_engine():
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, num_experts=4, top_k=2,
        shared_expert=True,
    )
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=64, kv_block_size=4, max_kv_blocks=64,
        max_prefill_tokens=32, dtype="float32", kv_cache_dtype="float32",
        decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
        prefill_token_buckets=(8, 16, 32), multistep_decode=1,
        decode_chaining=False, enable_request_merging=False,
    )
    return Engine(params, cfg, ecfg), cfg


async def make_client(server: Server) -> TestClient:
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    return client


# ---------------------------------------------------------------------------
# /v1/experts content
# ---------------------------------------------------------------------------


@pytest.mark.asyncio
async def test_experts_reports_measured_distribution():
    """The distribution must equal a hand computation from the engine's
    ACTUAL route table over the running requests' output tokens."""
    eng, cfg = tiny_engine()
    rid = eng.add_request(
        list(range(3, 11)), SamplingParams(temperature=0.0, max_tokens=40))
    for _ in range(6):
        eng.step()
    req = eng.scheduler.get_request(rid)
    assert req is not None and not req.is_finished  # still running

    srv = Server(eng, tokenizer=ByteTokenizer(), model_name="t")
    client = await make_client(srv)
    try:
        r = await client.get("/v1/experts")
        assert r.status == 200
        body = await r.json()
    finally:
        await client.close()

    # hand-compute expected counts from the real table over the tokens the
    # handler saw (the server's background loop keeps decoding, but outputs
    # are append-only — the first total_tokens elements are stable)
    out_tokens = list(req.output_token_ids)[: body["total_tokens"]]
    assert out_tokens
    table = np.asarray(eng.runner.params["layers"]["mlp"]["route_table"])
    E = cfg.num_experts
    want = np.zeros(E, np.int64)
    for t in out_tokens:
        for layer in range(table.shape[0]):
            np.add.at(want, table[layer, :, t % cfg.vocab_size] % E, 1)

    assert body["counts"] == [int(c) for c in want]
    assert body["total_tokens"] == len(out_tokens)
    total = int(want.sum())
    np.testing.assert_allclose(
        body["distribution"], [c / total for c in want], atol=1e-3)
    assert body["active"] is True
    # the latest token's reported routes match the table exactly
    latest = body["latest"]
    assert latest["token_id"] == out_tokens[-1] % cfg.vocab_size
    for row in latest["routes"]:
        expect = [int(x) for x in
                  table[row["layer"], :, latest["token_id"]] % E]
        assert row["experts"] == expect


@pytest.mark.asyncio
async def test_experts_distribution_changes_with_tokens():
    """Not a static: an idle engine reports zero counts; more generated
    tokens increase total_tokens."""
    eng, _ = tiny_engine()
    srv = Server(eng, tokenizer=ByteTokenizer(), model_name="t")
    client = await make_client(srv)
    try:
        r = await client.get("/v1/experts")
        idle = await r.json()
        assert idle["total_tokens"] == 0
        assert idle["active"] is False
        assert all(c == 0 for c in idle["counts"])

        eng.add_request(list(range(3, 11)),
                        SamplingParams(temperature=0.0, max_tokens=40))
        for _ in range(3):
            eng.step()
        first = await (await client.get("/v1/experts")).json()
        for _ in range(3):
            eng.step()
        second = await (await client.get("/v1/experts")).json()
        assert second["total_tokens"] > first["total_tokens"] > 0
    finally:
        await client.close()


@pytest.mark.asyncio
async def test_experts_rejects_non_moe():
    eng, cfg = tiny_engine()
    eng.model_config = cfg.replace(num_experts=1)
    srv = Server(eng, tokenizer=ByteTokenizer(), model_name="t")
    client = await make_client(srv)
    try:
        r = await client.get("/v1/experts")
        assert r.status == 400
    finally:
        await client.close()


# ---------------------------------------------------------------------------
# Middleware exhaustion
# ---------------------------------------------------------------------------


class TestRateLimiterExhaustion:
    def test_bucket_exhaustion_and_denial(self):
        lim = TokenBucketRateLimiter(requests_per_minute=3)

        async def run():
            allowed = [await lim.allow("1.2.3.4") for _ in range(5)]
            return allowed

        allowed = asyncio.run(run())
        assert allowed[:3] == [True, True, True]
        assert allowed[3] is False and allowed[4] is False

    def test_refill_restores_tokens(self):
        lim = TokenBucketRateLimiter(requests_per_minute=60)  # 1/s

        async def run():
            for _ in range(60):
                await lim.allow("ip")
            assert not await lim.allow("ip")
            # simulate 2.5 s of elapsed time on the stored bucket
            lim._buckets["ip"][1] -= 2.5
            a = await lim.allow("ip")
            b = await lim.allow("ip")
            c = await lim.allow("ip")
            return a, b, c

        a, b, c = asyncio.run(run())
        assert a and b and not c  # 2.5 tokens refilled -> 2 allowed

    def test_max_buckets_evicts_oldest(self):
        lim = TokenBucketRateLimiter(requests_per_minute=10, max_buckets=2)

        async def run():
            await lim.allow("a")
            lim._buckets["a"][1] -= 5  # make "a" the oldest
            await lim.allow("b")
            await lim.allow("c")  # must evict "a"
            return set(lim._buckets)

        ips = asyncio.run(run())
        assert ips == {"b", "c"}

    def test_independent_ips(self):
        lim = TokenBucketRateLimiter(requests_per_minute=1)

        async def run():
            assert await lim.allow("x")
            assert not await lim.allow("x")
            return await lim.allow("y")

        assert asyncio.run(run())

    def test_stale_bucket_cleanup(self):
        lim = TokenBucketRateLimiter(requests_per_minute=60,
                                     cleanup_interval=0.0)

        async def run():
            await lim.allow("old")
            lim._buckets["old"][1] -= 10_000
            await lim.allow("new")  # triggers cleanup
            return set(lim._buckets)

        assert asyncio.run(run()) == {"new"}


@pytest.mark.asyncio
async def test_load_shed_exempts_cancel_and_gets():
    eng, _ = tiny_engine()
    srv = Server(eng, tokenizer=ByteTokenizer(), model_name="t",
                 max_pending=1)

    # saturate: the shed reads async_engine.active_requests — pin it high
    # through a proxy so the background loop can't drain the pressure away
    class Saturated:
        def __init__(self, inner):
            object.__setattr__(self, "_inner", inner)

        def __getattr__(self, k):
            if k == "active_requests":
                return 10**6
            return getattr(self._inner, k)

    srv.async_engine = Saturated(srv.async_engine)
    client = await make_client(srv)
    try:
        r = await client.post("/v1/completions",
                              json={"model": "t", "prompt": "hi",
                                    "max_tokens": 2})
        assert r.status == 503
        assert r.headers.get("Retry-After") == "5"
        # cancel must stay reachable to SHED load
        r = await client.post("/v1/cancel/12345")
        assert r.status != 503
        # monitoring stays readable
        r = await client.get("/v1/metrics")
        assert r.status == 200
        r = await client.get("/v1/monitor")
        assert r.status == 200
    finally:
        await client.close()


@pytest.mark.asyncio
async def test_auth_edge_cases():
    eng, _ = tiny_engine()
    srv = Server(eng, tokenizer=ByteTokenizer(), model_name="t",
                 api_key="sekrit")
    client = await make_client(srv)
    try:
        # missing, malformed, wrong-length, and correct
        assert (await client.get("/v1/models")).status == 401
        assert (await client.get(
            "/v1/models", headers={"Authorization": "sekrit"})).status == 401
        assert (await client.get(
            "/v1/models",
            headers={"Authorization": "Bearer sek"})).status == 401
        assert (await client.get(
            "/v1/models",
            headers={"Authorization": "Bearer sekritsekrit"})).status == 401
        assert (await client.get(
            "/v1/models",
            headers={"Authorization": "Bearer sekrit"})).status == 200
        # non-/v1 endpoints stay open
        assert (await client.get("/health")).status == 200
    finally:
        await client.close()


# ---------------------------------------------------------------------------
# Launcher env parsing
# ---------------------------------------------------------------------------


class TestLauncherEnv:
    def test_int_env_parsing(self, monkeypatch):
        from vllm_i64_tpu.parallel.launcher import _int_env

        monkeypatch.setenv("X_TEST_INT", "8")
        assert _int_env("X_TEST_INT") == 8
        monkeypatch.setenv("X_TEST_INT", "")
        assert _int_env("X_TEST_INT") is None
        monkeypatch.delenv("X_TEST_INT")
        assert _int_env("X_TEST_INT") is None

    def test_init_distributed_noop_without_env(self, monkeypatch):
        from vllm_i64_tpu.parallel.launcher import init_distributed

        for var in ("VLLM_I64_TPU_COORDINATOR", "VLLM_I64_TPU_NUM_HOSTS",
                    "VLLM_I64_TPU_HOST_ID"):
            monkeypatch.delenv(var, raising=False)
        assert init_distributed() == 0

    def test_is_serving_host_single_process(self):
        from vllm_i64_tpu.parallel.launcher import is_serving_host

        assert is_serving_host() is True


@pytest.mark.asyncio
async def test_monitor_exposes_step_mix():
    """/v1/monitor carries the step-mix counters (chained/window/single +
    fallback reasons) — the observability that localized the round-3
    serving collapse."""
    from vllm_i64_tpu.api import Server
    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.engine import Engine

    eng = Engine(None, None, EngineConfig(max_batch_size=2, max_seq_len=64,
                                          kv_block_size=8, max_kv_blocks=16))
    server = Server(eng, model_name="t")
    app = server.build_app()
    from aiohttp.test_utils import TestClient, TestServer

    async with TestClient(TestServer(app)) as client:
        await server.async_engine.start()
        try:
            r = await client.get("/v1/monitor")
            assert r.status == 200
            data = await r.json()
            assert "step_mix" in data
            for key in ("chained", "window", "single", "fb_host",
                        "fb_capacity", "window_tokens"):
                assert key in data["step_mix"]
        finally:
            await server.async_engine.stop(drain_timeout=2)
