"""Cross-host router failure modes (VERDICT r2 #9: worker death mid-stream).

The reference has no worker-death handling at all (its torchrun broadcast
loop deadlocks the collective); here a dead worker's in-flight requests
fail fast with finish_reason="worker_died" and routing degrades to the
remaining live hosts.
"""

import socket
import threading
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
    WorkerClient,
    WorkerDied,
)


def _tiny_engine():
    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=128, num_experts=4, top_k=2,
        shared_expert=True,
    )
    ecfg = EngineConfig(
        max_batch_size=4, max_seq_len=64, kv_block_size=16,
        max_kv_blocks=32, max_prefill_tokens=64,
        decode_batch_buckets=(1, 2, 4), prefill_batch_buckets=(1, 2),
        prefill_token_buckets=(16, 32), multistep_decode=1,
    )
    params = cdm.init_params(cfg, jax.random.PRNGKey(0))
    return Engine(params, cfg, ecfg)


@pytest.fixture()
def worker():
    w = HostWorker(_tiny_engine(), port=0)
    t = threading.Thread(target=w.serve_forever, daemon=True)
    t.start()
    yield w
    w._stop.set()


def _slow_params():
    return SamplingParams(temperature=0.0, max_tokens=24, min_tokens=24)


def test_worker_death_fails_inflight_requests(worker):
    local = _tiny_engine()
    router = CrossHostRouter(
        local_engine=local, worker_addrs=[f"127.0.0.1:{worker.port}"])
    # force one request onto the remote worker (local is busier)
    router._local_outstanding = 5
    sid = router.add_request(list(range(5, 15)), _slow_params())
    rr = router._sid_to_req[sid]
    assert rr.target == 0  # routed remotely
    router.step()
    # kill the worker mid-stream (shutdown forces IO errors immediately;
    # socket.close() alone is deferred while makefile handles are open)
    worker._stop.set()
    router.workers[0].conn.sock.shutdown(socket.SHUT_RDWR)
    deadline = time.monotonic() + 10
    while not rr.finished and time.monotonic() < deadline:
        router.step()
        time.sleep(0.02)
    assert rr.finished
    assert rr.finish_reason == "worker_died"
    assert router.workers[0].dead
    stats = router.get_stats()
    assert stats["workers"][0]["dead"] is True


def test_routing_continues_on_local_after_worker_death(worker):
    local = _tiny_engine()
    router = CrossHostRouter(
        local_engine=local, worker_addrs=[f"127.0.0.1:{worker.port}"])
    router.workers[0].dead = True  # already-discovered death
    res = router.generate(list(range(3, 13)),
                          SamplingParams(temperature=0.0, max_tokens=4),
                          timeout_s=60)
    assert len(res.tokens) == 4
    assert res.finish_reason in ("stop", "length")


def test_admission_fails_over_when_worker_dies_at_add(worker):
    local = _tiny_engine()
    router = CrossHostRouter(
        local_engine=local, worker_addrs=[f"127.0.0.1:{worker.port}"])
    worker._stop.set()
    router.workers[0].conn.sock.shutdown(socket.SHUT_RDWR)  # torn connection
    router._local_outstanding = 5  # bias toward the (dead) remote
    sid = router.add_request(list(range(4, 14)),
                             SamplingParams(temperature=0.0, max_tokens=3))
    rr = router._sid_to_req[sid]
    assert rr.target == -1  # failed over to the local engine
    deadline = time.monotonic() + 60
    while not rr.finished and time.monotonic() < deadline:
        router.step()
    assert rr.finished and rr.finish_reason in ("stop", "length")


def test_all_targets_dead_raises():
    class _DeadClient:
        dead = True
        outstanding = 0
        addr = "x"

    router = CrossHostRouter.__new__(CrossHostRouter)
    router.local_engine = None
    router.workers = [_DeadClient()]
    router._local_outstanding = 0
    router._sid_to_req = {}
    router._sid_to_local_rid = {}
    router._next_sid = 0
    router._lock = threading.Lock()
    with pytest.raises(RuntimeError, match="no live serving targets"):
        router.add_request([1, 2, 3], SamplingParams(max_tokens=2))


def test_worker_client_marks_dead_on_connection_error(worker):
    client = WorkerClient(f"127.0.0.1:{worker.port}")
    client.conn.sock.shutdown(socket.SHUT_RDWR)
    with pytest.raises(WorkerDied):
        client.poll()
    assert client.dead


def test_dead_worker_skipped_by_router_step(worker):
    local = _tiny_engine()
    router = CrossHostRouter(
        local_engine=local, worker_addrs=[f"127.0.0.1:{worker.port}"])
    router.workers[0].dead = True
    # step() must not touch the dead worker's socket (would raise)
    router.workers[0].conn.close()
    router.step()  # no exception
