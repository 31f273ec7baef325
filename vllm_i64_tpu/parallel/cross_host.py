"""Cross-host continuous batching: per-host engines + a host-0 request router.

The reference's multi-host story is a torchrun broadcast loop where rank 0
drives every other rank's forward in lockstep (ref: vllm_i64/parallel/
worker.py:127-182). The TPU-native generalization here is *data-parallel
serving*: every host runs its OWN engine (continuous batching over its local
chips' mesh), and host 0 routes requests to the least-loaded host — the
cross-host scaling mode of BASELINE.json config 5.

Control plane: newline-delimited JSON over TCP (requests are host-level
control traffic, not tensor traffic — tensors never cross hosts in this
mode). Worker addresses are exchanged through the jax.distributed runtime
itself (multihost_utils.process_allgather), so the same binary started on
every host self-assembles: host 0 becomes the router + HTTP server, other
hosts become engine workers.

Proven by a real 2-process CPU jax.distributed test
(tests/test_cross_host.py) — which the reference never had for its own
multi-host path.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import socket
import threading
import time
from typing import Dict, List, Optional

logger = logging.getLogger("vllm_i64_tpu.cross_host")

_JSON_PRIMITIVES = (bool, int, float, str, type(None))


def params_to_wire(sp) -> dict:
    """SamplingParams -> JSON-safe dict (primitive fields + simple lists)."""
    out = {}
    for f in dataclasses.fields(sp):
        v = getattr(sp, f.name)
        if isinstance(v, _JSON_PRIMITIVES):
            out[f.name] = v
        elif isinstance(v, (list, tuple)) and all(
            isinstance(x, _JSON_PRIMITIVES) for x in v
        ):
            out[f.name] = list(v)
        elif isinstance(v, dict) and all(
            isinstance(x, _JSON_PRIMITIVES) for x in v.values()
        ):
            out[f.name] = v
    return out


def params_from_wire(d: dict):
    from ..core.sampling import SamplingParams

    known = {f.name for f in dataclasses.fields(SamplingParams)}
    return SamplingParams(**{k: v for k, v in d.items() if k in known})


class _LineConn:
    """Blocking newline-JSON connection."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._rfile = sock.makefile("r", encoding="utf-8")
        self._lock = threading.Lock()

    def request(self, obj: dict) -> dict:
        with self._lock:
            self.sock.sendall((json.dumps(obj) + "\n").encode())
            line = self._rfile.readline()
        if not line:
            raise ConnectionError("worker connection closed")
        return json.loads(line)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class HostWorker:
    """A non-zero host: runs its engine loop and answers router commands.

    Protocol (one JSON object per line, request/response):
      {"op": "add", "sid": int, "prompt": [ids], "params": {...}} -> {"ok": 1}
      {"op": "poll"} -> {"events": [{"sid", "tokens", "finished",
                                     "finish_reason"}...]}
      {"op": "stats"} -> {"stats": {...}}
      {"op": "stop"} -> {"ok": 1}       (drains and exits serve_forever)
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(4)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._sid_to_rid: Dict[int, int] = {}
        self._emitted: Dict[int, List[int]] = {}
        self._finished: Dict[int, str] = {}
        self._step_thread = threading.Thread(
            target=self._engine_loop, daemon=True)
        self._step_thread.start()

    # -- engine side ---------------------------------------------------------

    def _engine_loop(self) -> None:
        while not self._stop.is_set():
            if not self.engine.scheduler.has_work:
                time.sleep(0.002)
                continue
            result = self.engine.step()
            with self._lock:
                for rid, toks in result.items():
                    sid = self._rid_to_sid.get(rid)
                    if sid is None:
                        continue
                    self._emitted.setdefault(sid, []).extend(toks)
                for sid, rid in list(self._sid_to_rid.items()):
                    req = self.engine.scheduler.get_request(rid)
                    if req is not None and req.is_finished:
                        self._finished[sid] = req.finish_reason or "stop"
                        del self._sid_to_rid[sid]

    @property
    def _rid_to_sid(self) -> Dict[int, int]:
        return {rid: sid for sid, rid in self._sid_to_rid.items()}

    # -- protocol side -------------------------------------------------------

    def serve_forever(self) -> None:
        """Accept router connections until a stop command arrives."""
        self._srv.settimeout(0.5)
        conns: List[threading.Thread] = []
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except socket.timeout:
                continue
            t = threading.Thread(target=self._serve_conn, args=(sock,),
                                 daemon=True)
            t.start()
            conns.append(t)
        self._srv.close()

    def _serve_conn(self, sock: socket.socket) -> None:
        rfile = sock.makefile("r", encoding="utf-8")
        try:
            for line in rfile:
                op = None
                try:
                    msg = json.loads(line)
                    op = msg.get("op")
                    resp = self._handle(msg)
                except Exception as exc:  # protocol robustness
                    resp = {"error": repr(exc)[:200]}
                sock.sendall((json.dumps(resp) + "\n").encode())
                if op == "stop":
                    break
        finally:
            sock.close()

    def _handle(self, msg: dict) -> dict:
        op = msg.get("op")
        if op == "add":
            sp = params_from_wire(msg.get("params", {}))
            # admission and mapping registration must be atomic vs the
            # engine loop: it holds the same lock while attributing step
            # results, so a first token can never land before the rid is
            # known (it would be dropped permanently otherwise)
            ns = bytes.fromhex(msg["ns"]) if msg.get("ns") else None
            with self._lock:
                rid = self.engine.add_request(
                    list(msg["prompt"]), sp,
                    priority=int(msg.get("priority", 0)),
                    cache_namespace=ns)
                self._sid_to_rid[int(msg["sid"])] = rid
            return {"ok": 1}
        if op == "cancel":
            with self._lock:
                rid = self._sid_to_rid.pop(int(msg["sid"]), None)
            if rid is not None:
                self.engine.cancel_request(rid)
            return {"ok": 1}
        if op == "poll":
            with self._lock:
                events = []
                for sid in list(self._emitted.keys() | self._finished.keys()):
                    events.append({
                        "sid": sid,
                        "tokens": self._emitted.pop(sid, []),
                        "finished": sid in self._finished,
                        "finish_reason": self._finished.pop(sid, None),
                    })
            return {"events": events}
        if op == "stats":
            st = self.engine.get_stats()
            return {"stats": {k: v for k, v in st.items()
                              if isinstance(v, (int, float))}}
        if op == "stop":
            self._stop.set()
            return {"ok": 1}
        return {"error": f"unknown op {op!r}"}


class WorkerClient:
    """Router-side handle to one remote HostWorker.

    A connection failure marks the client ``dead``; the router fails that
    worker's in-flight requests and stops routing to it (ref analog: the
    reference has NO worker-death handling — its torchrun worker loop
    deadlocks the collective; here serving degrades to the live hosts)."""

    def __init__(self, addr: str):
        host, port = addr.rsplit(":", 1)
        sock = socket.create_connection((host, int(port)), timeout=30)
        self.addr = addr
        self.conn = _LineConn(sock)
        self.outstanding = 0
        self.dead = False

    def add(self, sid: int, prompt: List[int], params,
            priority: int = 0,
            cache_namespace: Optional[bytes] = None) -> None:
        try:
            r = self.conn.request({
                "op": "add", "sid": sid, "prompt": list(map(int, prompt)),
                "params": params_to_wire(params), "priority": int(priority),
                "ns": cache_namespace.hex() if cache_namespace else None,
            })
        except (ConnectionError, OSError, EOFError) as exc:
            self.dead = True
            raise WorkerDied(self.addr) from exc
        if "error" in r:
            raise RuntimeError(f"worker {self.addr}: {r['error']}")
        self.outstanding += 1

    def poll(self) -> List[dict]:
        try:
            r = self.conn.request({"op": "poll"})
        except (ConnectionError, OSError, EOFError) as exc:
            self.dead = True
            raise WorkerDied(self.addr) from exc
        events = r.get("events", [])
        done = sum(1 for e in events if e.get("finished"))
        # clamp: a cancel that raced a finish may have already decremented
        self.outstanding = max(0, self.outstanding - done)
        return events

    def stats(self) -> dict:
        return self.conn.request({"op": "stats"}).get("stats", {})

    def cancel(self, sid: int) -> None:
        try:
            self.conn.request({"op": "cancel", "sid": sid})
        except (ConnectionError, OSError):
            return
        self.outstanding = max(0, self.outstanding - 1)

    def stop(self) -> None:
        try:
            self.conn.request({"op": "stop"})
        except (ConnectionError, OSError):
            pass
        self.conn.close()


class WorkerDied(ConnectionError):
    """A remote host worker's connection failed mid-conversation."""


@dataclasses.dataclass
class _RoutedRequest:
    sid: int
    target: int  # -1 = local engine, else worker index
    tokens: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    finish_reason: Optional[str] = None


class CrossHostRouter:
    """Host-0 request router over the local engine + remote host workers.

    Routing policy: least outstanding requests (the reference coordinator
    is a fixed 2-role split; this generalizes to N hosts)."""

    def __init__(self, local_engine=None, worker_addrs: Optional[List[str]] = None):
        self.local_engine = local_engine
        self.workers = [WorkerClient(a) for a in (worker_addrs or [])]
        if local_engine is None and not self.workers:
            raise ValueError("router needs a local engine or remote workers")
        self._local_outstanding = 0
        self._sid_to_req: Dict[int, _RoutedRequest] = {}
        self._sid_to_local_rid: Dict[int, int] = {}
        self._next_sid = 0
        self._lock = threading.Lock()

    # -- routing -------------------------------------------------------------

    def _pick_target(self) -> int:
        loads = []
        if self.local_engine is not None:
            loads.append((self._local_outstanding, -1))
        loads.extend((w.outstanding, i) for i, w in enumerate(self.workers)
                     if not w.dead)
        if not loads:
            raise RuntimeError("no live serving targets (all workers dead, "
                               "no local engine)")
        return min(loads)[1]

    def add_request(self, prompt_token_ids, sampling_params,
                    priority: int = 0,
                    cache_namespace: Optional[bytes] = None) -> int:
        with self._lock:
            sid = self._next_sid
            self._next_sid += 1
            rr = None
            while True:
                target = self._pick_target()
                rr = _RoutedRequest(sid=sid, target=target)
                self._sid_to_req[sid] = rr
                if target == -1:
                    rid = self.local_engine.add_request(
                        list(prompt_token_ids), sampling_params,
                        priority=priority, cache_namespace=cache_namespace)
                    self._sid_to_local_rid[sid] = rid
                    self._local_outstanding += 1
                    break
                try:
                    self.workers[target].add(
                        sid, prompt_token_ids, sampling_params,
                        priority=priority, cache_namespace=cache_namespace)
                    break
                except WorkerDied:
                    # admission discovered the death first: fail over to
                    # the next least-loaded live target, then sweep the
                    # dead worker's other in-flight requests
                    self._fail_worker_locked(target)
                    continue
        return sid

    def _fail_worker_locked(self, idx: int) -> None:
        """Fail every in-flight request routed to a dead worker (callers
        hold self._lock). They finish with reason "worker_died" rather than
        hanging until client timeout."""
        w = self.workers[idx]
        w.dead = True
        for rr in self._sid_to_req.values():
            if rr.target == idx and not rr.finished:
                rr.finished = True
                rr.finish_reason = "worker_died"
        w.outstanding = 0
        logger.error("worker %s died — its in-flight requests failed with "
                     "finish_reason=worker_died; routing continues on the "
                     "remaining hosts", w.addr)

    # -- progress ------------------------------------------------------------

    def step(self) -> None:
        """One pump: local engine step (if it has work) + remote polls."""
        if self.local_engine is not None and self.local_engine.scheduler.has_work:
            result = self.local_engine.step()
            with self._lock:
                rid_to_sid = {r: s for s, r in self._sid_to_local_rid.items()}
                for rid, toks in result.items():
                    sid = rid_to_sid.get(rid)
                    if sid is not None:
                        self._sid_to_req[sid].tokens.extend(toks)
                for sid, rid in list(self._sid_to_local_rid.items()):
                    req = self.local_engine.scheduler.get_request(rid)
                    if req is not None and req.is_finished:
                        rr = self._sid_to_req[sid]
                        rr.finished = True
                        rr.finish_reason = req.finish_reason or "stop"
                        del self._sid_to_local_rid[sid]
                        self._local_outstanding -= 1
        for i, w in enumerate(self.workers):
            if w.dead:
                continue
            try:
                events = w.poll()
            except WorkerDied:
                with self._lock:
                    self._fail_worker_locked(i)
                continue
            for ev in events:
                rr = self._sid_to_req.get(int(ev["sid"]))
                if rr is None:
                    continue
                rr.tokens.extend(ev.get("tokens", []))
                if ev.get("finished"):
                    rr.finished = True
                    rr.finish_reason = ev.get("finish_reason")

    def generate(self, prompt_token_ids, sampling_params,
                 timeout_s: float = 120.0):
        sid = self.add_request(prompt_token_ids, sampling_params)
        deadline = time.monotonic() + timeout_s
        rr = self._sid_to_req[sid]
        while not rr.finished:
            if time.monotonic() > deadline:
                self.cancel(sid)
                raise TimeoutError(f"request {sid} did not finish")
            self.step()
            time.sleep(0.001)
        return self._sid_to_req.pop(sid)

    def cancel(self, sid: int) -> None:
        """Cancel a routed request wherever it runs and drop its state
        (otherwise a timed-out request leaks router accounting forever)."""
        with self._lock:
            rr = self._sid_to_req.pop(sid, None)
            if rr is None:
                return
            if rr.target == -1:
                rid = self._sid_to_local_rid.pop(sid, None)
                if rid is not None:
                    self.local_engine.cancel_request(rid)
                    self._local_outstanding -= 1
            else:
                self.workers[rr.target].cancel(sid)

    def get_stats(self) -> dict:
        out = {
            "hosts": 1 + len(self.workers),
            "local_outstanding": self._local_outstanding,
            "workers": [
                {"addr": w.addr, "outstanding": w.outstanding,
                 "dead": w.dead}
                for w in self.workers
            ],
        }
        if self.local_engine is not None:
            out["local"] = self.local_engine.get_stats()
        return out

    def shutdown(self) -> None:
        for w in self.workers:
            w.stop()


# ---------------------------------------------------------------------------
# Self-assembly through the jax.distributed runtime
# ---------------------------------------------------------------------------


def exchange_worker_addrs(worker_port: int, host_ip: str = "127.0.0.1"):
    """All-gather every host's worker address through the jax runtime.

    Returns the ordered list of "ip:port" for processes 1..N-1 (host 0
    routes and serves HTTP; it contributes a placeholder). Uses a device
    collective under the hood, so it exercises the same runtime the step
    programs run on."""
    import numpy as np
    from jax.experimental import multihost_utils

    ip_parts = [int(x) for x in host_ip.split(".")]
    mine = np.asarray(ip_parts + [worker_port], dtype=np.int32)
    gathered = multihost_utils.process_allgather(mine)  # (n_hosts, 5)
    addrs = []
    for row in np.asarray(gathered)[1:]:
        addrs.append(f"{row[0]}.{row[1]}.{row[2]}.{row[3]}:{row[4]}")
    return addrs


def launch_cross_host(engine_factory, host_ip: Optional[str] = None,
                      with_local_engine: bool = True):
    """Role split after jax.distributed is initialized
    (ref: worker.py:97-121 rank-0 serves, ranks>0 compute).

    Host 0: returns a CrossHostRouter wired to every other host's worker
    (plus its own local engine when with_local_engine).
    Hosts >0: this call BLOCKS serving the engine worker until the router
    sends a stop command, then returns None."""
    import os

    import jax

    if host_ip is None:
        # real pods must advertise a reachable address, not loopback
        host_ip = os.environ.get("VLLM_I64_TPU_HOST_IP", "127.0.0.1")
    if jax.process_count() == 1:
        return CrossHostRouter(local_engine=engine_factory())

    if jax.process_index() == 0:
        addrs = exchange_worker_addrs(0, host_ip)  # placeholder port
        local = engine_factory() if with_local_engine else None
        return CrossHostRouter(local_engine=local, worker_addrs=addrs)

    worker = HostWorker(engine_factory(), host=host_ip)
    exchange_worker_addrs(worker.port, host_ip)
    worker.serve_forever()
    return None


# ---------------------------------------------------------------------------
# Async facade: host-0 HTTP serves THROUGH the router
# ---------------------------------------------------------------------------


class AsyncRouterEngine:
    """AsyncEngine-compatible facade over a CrossHostRouter, so the HTTP
    server on host 0 streams completions from whichever host runs them
    (the "rank-0 serves" role of ref worker.py:97-121, generalized to
    data-parallel hosts). Implements the server-facing subset of
    engine.async_engine.AsyncEngine: start/stop, generate,
    generate_stream (ints then ("__done__", reason)), cancel_request,
    active_requests."""

    DONE = "__done__"

    def __init__(self, router: CrossHostRouter, max_queue_depth: int = 512):
        import asyncio

        self.router = router
        self.max_queue_depth = max_queue_depth
        self.active_requests = 0
        self._targets: Dict[int, object] = {}  # sid -> Future | Queue
        self._delivered: Dict[int, int] = {}
        self._t0: Dict[int, float] = {}
        self._running = False
        self._draining = False
        self._task = None
        self._asyncio = asyncio

    async def start(self) -> None:
        self._running = True
        self._task = self._asyncio.get_running_loop().create_task(
            self._pump_loop())

    async def stop(self, drain_timeout: float = 30.0) -> None:
        self._draining = True
        deadline = time.monotonic() + drain_timeout
        while self.active_requests > 0 and time.monotonic() < deadline:
            await self._asyncio.sleep(0.02)
        self._running = False
        if self._task is not None:
            await self._asyncio.gather(self._task, return_exceptions=True)
        self.router.shutdown()

    async def cancel_request(self, sid: int) -> None:
        loop = self._asyncio.get_running_loop()
        await loop.run_in_executor(None, self.router.cancel, sid)
        target = self._targets.pop(sid, None)
        if target is not None:
            self._finish_target(target, None, "cancelled")
            self.active_requests -= 1

    def _admit_sync(self, prompt_token_ids, sampling_params, priority,
                    cache_namespace) -> int:
        from ..core.sampling import SamplingParams

        return self.router.add_request(
            prompt_token_ids, sampling_params or SamplingParams(),
            priority=priority, cache_namespace=cache_namespace)

    async def _admit(self, prompt_token_ids, sampling_params, priority,
                     cache_namespace) -> int:
        if self._draining:
            raise RuntimeError("engine is shutting down, not accepting requests")
        if self.active_requests >= self.max_queue_depth:
            raise RuntimeError(
                f"queue full ({self.active_requests}/{self.max_queue_depth})")
        loop = self._asyncio.get_running_loop()
        sid = await loop.run_in_executor(
            None, self._admit_sync, prompt_token_ids, sampling_params,
            priority, cache_namespace)
        self._delivered[sid] = 0
        self._t0[sid] = time.monotonic()
        self.active_requests += 1
        return sid

    async def generate(self, prompt_token_ids, sampling_params=None,
                       priority: int = 0, timeout_s=None,
                       cache_namespace=None, soft_embeds=None,
                       soft_positions=None):
        if soft_embeds is not None:
            raise ValueError("VLM soft tokens are not routable cross-host")
        loop = self._asyncio.get_running_loop()
        sid = await self._admit(prompt_token_ids, sampling_params, priority,
                                cache_namespace)
        future = loop.create_future()
        self._targets[sid] = future
        return await future

    async def generate_stream(self, prompt_token_ids, sampling_params=None,
                              priority: int = 0, timeout_s=None,
                              cache_namespace=None, soft_embeds=None,
                              soft_positions=None, coalesce: bool = False):
        if soft_embeds is not None:
            raise ValueError("VLM soft tokens are not routable cross-host")
        sid = await self._admit(prompt_token_ids, sampling_params, priority,
                                cache_namespace)
        queue = self._asyncio.Queue()
        self._targets[sid] = queue
        try:
            while True:
                item = await queue.get()
                if item is None:
                    break
                if coalesce and not isinstance(item, tuple):
                    batch = [item]
                    trailer = None
                    while True:
                        try:
                            nxt = queue.get_nowait()
                        except self._asyncio.QueueEmpty:
                            break
                        if nxt is None or isinstance(nxt, tuple):
                            trailer = nxt
                            break
                        batch.append(nxt)
                    yield batch
                    if trailer is None:
                        continue
                    if isinstance(trailer, tuple):
                        yield trailer
                    break
                yield item
                if isinstance(item, tuple) and item[0] == self.DONE:
                    break
        finally:
            if sid in self._targets:  # client disconnected mid-stream
                self._targets.pop(sid, None)
                self._asyncio.get_running_loop().run_in_executor(
                    None, self.router.cancel, sid)
                self.active_requests -= 1
            self._delivered.pop(sid, None)
            self._t0.pop(sid, None)

    # -- pump ----------------------------------------------------------------

    def _finish_target(self, target, rr, reason: str) -> None:
        from ..engine.engine import GenerationResult

        if isinstance(target, self._asyncio.Queue):
            target.put_nowait((self.DONE, reason))
            target.put_nowait(None)
            return
        if not target.done():
            tokens = list(rr.tokens) if rr is not None else []
            target.set_result(GenerationResult(
                request_id=rr.sid if rr is not None else -1,
                prompt_tokens=0,
                output_tokens=tokens,
                num_steps=len(tokens),
                elapsed_ms=0.0,
                finish_reason=reason,
                logprobs=None,
                text=None,
            ))

    async def _pump_loop(self) -> None:
        loop = self._asyncio.get_running_loop()
        while self._running:
            if not self._targets:
                await self._asyncio.sleep(0.005)
                continue
            await loop.run_in_executor(None, self.router.step)
            for sid in list(self._targets.keys()):
                rr = self.router._sid_to_req.get(sid)
                if rr is None:
                    continue
                target = self._targets[sid]
                if isinstance(target, self._asyncio.Queue):
                    done = self._delivered.get(sid, 0)
                    for tok in rr.tokens[done:]:
                        target.put_nowait(int(tok))
                    self._delivered[sid] = len(rr.tokens)
                if rr.finished:
                    self._targets.pop(sid, None)
                    self.router._sid_to_req.pop(sid, None)
                    # generate() has no finally-cleanup like the stream
                    # path — drop the bookkeeping here or it leaks per
                    # request on a long-lived server
                    self._delivered.pop(sid, None)
                    self._t0.pop(sid, None)
                    self._finish_target(target, rr,
                                        rr.finish_reason or "stop")
                    self.active_requests -= 1
            await self._asyncio.sleep(0.001)
