"""Disaggregated prefill/decode serving.

Reference architecture (ref: vllm_i64/parallel/disaggregated.py): one
compute-bound prefill worker runs the full prompt and samples the first
token; the KV blocks transfer to a memory-bound decode worker that owns its
own scheduler and continues with continuous batching.

TPU-native differences:
- workers are two ModelRunners over disjoint device sets (or two hosts of a
  pod); there is no NCCL send/recv — KV moves as on-device block arrays via
  ``jax.device_put`` (intra-host) / the future DCN resharding path
  (cross-host), packaged by KVTransfer (ref KVTransfer's per-layer
  per-block dist.send loop, :105-320, becomes ONE batched array move).
- the prefill worker is stateless between requests: it rents a scratch
  block table, runs ONE bucketed prefill program, swaps the blocks out, and
  frees them — no scheduler on the prefill side (the reference's
  PrefillWorker keeps one for queueing only).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from ..config import EngineConfig, ModelConfig
from ..core.sampling import SamplingParams
from ..engine.engine import Engine, GenerationResult
from ..engine.runner import ModelRunner

logger = logging.getLogger("vllm_i64_tpu.disaggregated")


@dataclass
class PrefillResult:
    prompt_token_ids: np.ndarray
    first_token: int
    kv_k: "object"  # DEVICE array (L, nblocks, bs, Hkv, d) — prefill devices
    kv_v: "object"
    num_blocks: int
    prompt_len: int
    sampling_params: SamplingParams
    submitted_id: int = -1


class KVTransfer:
    """Move a request's KV blocks between runners DEVICE-TO-DEVICE.

    The reference ships each (layer, block) tensor with a dist.send/recv
    loop and int-metadata framing (ref: disaggregated.py:105-320). Here the
    whole request's KV is ONE gather on the prefill devices and ONE scatter
    on the decode devices; ``jax.device_put`` inside import_blocks_device
    reshards the arrays across device groups (ICI/DCN on hardware) with no
    host staging anywhere on the path."""

    @staticmethod
    def export_blocks(runner: ModelRunner, block_ids: List[int]):
        return runner.export_blocks_device(block_ids)

    @staticmethod
    def import_blocks(runner: ModelRunner, pr: "PrefillResult",
                      target_block_ids: List[int]) -> None:
        runner.import_blocks_device(pr.kv_k, pr.kv_v, target_block_ids)


class PrefillWorker:
    """Full-prompt forward + first-token sample on the prefill devices
    (ref: disaggregated.py:327-455).

    Unlike the reference's strictly-sequential B=1 prefill on one scratch
    range, this worker (a) owns SEVERAL disjoint scratch block ranges so
    multiple prefills can be in flight on the device queue at once, and
    (b) batches queued prompts into one bucketed prefill dispatch
    (run_prefill_batch) — one host sync per batch, not per prompt."""

    def __init__(self, params, model_cfg: ModelConfig,
                 engine_cfg: EngineConfig, mesh=None):
        self.cfg = model_cfg
        self.ecfg = engine_cfg
        self.runner = ModelRunner(params, model_cfg, engine_cfg, mesh=mesh)
        slot = engine_cfg.max_blocks_per_seq
        n_slots = max(1, (self.runner.num_blocks - 1) // slot)
        self._slots: List[List[int]] = [
            list(range(1 + i * slot, 1 + (i + 1) * slot))
            for i in range(n_slots)
        ]
        self._free_slots = queue.Queue()
        for i in range(n_slots):
            self._free_slots.put(i)
        self.prefills_done = 0

    @property
    def max_inflight(self) -> int:
        return len(self._slots)

    def run_prefill(self, prompt_token_ids,
                    sampling_params: Optional[SamplingParams] = None
                    ) -> PrefillResult:
        return self.run_prefill_batch(
            [prompt_token_ids], [sampling_params or SamplingParams()])[0]

    def run_prefill_batch(
        self, prompts: List, params_list: List[SamplingParams]
    ) -> List[PrefillResult]:
        """Prefill up to max_inflight prompts in ONE bucketed dispatch.

        Each prompt rents its own scratch block range; KV export gathers are
        enqueued right behind the forward so the device pipeline runs
        prefill -> export -> (caller's transfer) without host round-trips.
        """
        from ..core.sampling import SamplerFeatures, make_param_arrays
        from ..core.scheduler import Request

        assert prompts, "empty prefill batch"
        b = len(prompts)
        cap = min(self.max_inflight, max(self.ecfg.prefill_batch_buckets))
        if b > cap:
            # split into dispatch-sized chunks (compiled batch buckets and
            # scratch slots both bound one dispatch)
            out: List[PrefillResult] = []
            for i in range(0, b, cap):
                out.extend(self.run_prefill_batch(
                    prompts[i : i + cap], params_list[i : i + cap]))
            return out
        arrs = [np.asarray(p, np.int64) for p in prompts]
        bs = self.ecfg.kv_block_size
        t_max = max(len(a) for a in arrs)
        if t_max > self.ecfg.max_seq_len:
            # a truncated block table would let later positions overwrite
            # earlier blocks and ship corrupt KV downstream — fail loudly
            # (the engine's normal admission path validates prompt length)
            raise ValueError(
                f"prompt of {t_max} tokens exceeds the prefill worker's "
                f"max_seq_len ({self.ecfg.max_seq_len})")

        slot_ids = [self._free_slots.get() for _ in range(b)]
        try:
            mb = max(-(-len(a) // bs) for a in arrs)
            token_ids = np.zeros((b, t_max), np.int64)
            positions = np.zeros((b, t_max), np.int32)
            valid = np.zeros((b, t_max), bool)
            block_tables = np.zeros((b, mb), np.int32)
            ctx_lens = np.zeros((b,), np.int32)
            last_idx = np.zeros((b,), np.int32)
            per_req_blocks: List[List[int]] = []
            reqs = []
            for i, a in enumerate(arrs):
                t = len(a)
                nb = -(-t // bs)
                blocks = self._slots[slot_ids[i]][:nb]
                per_req_blocks.append(blocks)
                token_ids[i, :t] = a
                positions[i, :t] = np.arange(t)
                valid[i, :t] = True
                block_tables[i, :nb] = blocks
                ctx_lens[i] = t
                last_idx[i] = t - 1
                reqs.append(Request(
                    request_id=i, prompt_token_ids=a,
                    max_new_tokens=params_list[i].max_tokens,
                    eos_token_id=self.cfg.eos_token_id))
            features = SamplerFeatures.for_params(params_list)
            sample_args = make_param_arrays(params_list, reqs)
            tokens_dev, _ = self.runner.execute(
                token_ids=token_ids,
                positions=positions,
                block_tables=block_tables,
                ctx_lens=ctx_lens,
                last_idx=last_idx,
                valid=valid,
                slot_ids=np.arange(b, dtype=np.int32),
                sample_mask=np.ones(b, bool),
                sample_args=sample_args,
                features=features,
                kind="prefill",
                defer=True,  # no host sync until every export is enqueued
            )
            exports = [
                KVTransfer.export_blocks(self.runner, blocks)
                for blocks in per_req_blocks
            ]
            tokens = np.asarray(tokens_dev)[:b]  # ONE sync for the batch
            results = []
            for i, a in enumerate(arrs):
                k, v = exports[i]
                results.append(PrefillResult(
                    prompt_token_ids=a,
                    first_token=int(tokens[i]),
                    kv_k=k,
                    kv_v=v,
                    num_blocks=len(per_req_blocks[i]),
                    prompt_len=len(a),
                    sampling_params=params_list[i],
                ))
            self.prefills_done += b
            return results
        finally:
            for s in slot_ids:
                self._free_slots.put(s)


class DecodeWorker:
    """Continuous-batching decode engine that admits prefilled requests
    (ref: disaggregated.py:487-708)."""

    def __init__(self, params, model_cfg: ModelConfig,
                 engine_cfg: EngineConfig, mesh=None):
        self.engine = Engine(params, model_cfg, engine_cfg, mesh=mesh)

    def receive_and_add_request(self, pr: PrefillResult) -> Optional[int]:
        # admission mutates scheduler state AND the runner's KV buffers
        # (import_blocks_device donates kv_k/kv_v) — under the async serving
        # adapter it runs from admission threads concurrently with step();
        # an unlocked import deletes the array a step is consuming
        with self.engine._lock:
            return self._receive_and_add_locked(pr)

    def _receive_and_add_locked(self, pr: PrefillResult) -> Optional[int]:
        sched = self.engine.scheduler
        rid = sched.add_prefilled_request(
            pr.prompt_token_ids,
            first_token=pr.first_token,
            max_new_tokens=pr.sampling_params.max_tokens,
            eos_token_id=self.engine.model_config.eos_token_id,
        )
        if rid is None:
            return None
        req = sched.get_request(rid)
        KVTransfer.import_blocks(
            self.engine.runner, pr, req.kv_block_ids[: pr.num_blocks])
        # full per-request engine setup — stop sequences / JSON constraints
        # / min_tokens live in _procs_by_rid and timeouts in _deadlines;
        # writing only _params_by_rid silently dropped them for
        # disaggregated requests
        eng = self.engine
        sp = pr.sampling_params
        eng._params_by_rid[rid] = sp
        procs = eng._build_processors(sp, eng.model_config.eos_token_id)
        if procs:
            eng._procs_by_rid[rid] = procs
        timeout = eng.engine_config.request_timeout_s or None
        if timeout:
            import time as _time

            eng._deadlines[rid] = _time.monotonic() + timeout
        return rid

    def decode_step(self) -> Dict[int, List[int]]:
        return self.engine.step()


@dataclass
class _Pending:
    submit_id: int
    prompt: np.ndarray
    params: SamplingParams
    callback: Optional[Callable] = None
    t0: float = field(default_factory=time.perf_counter)


class DisaggregatedCoordinator:
    """Prefill thread + decode loop glue (ref: disaggregated.py:735-989)."""

    def __init__(self, prefill: PrefillWorker, decode: DecodeWorker):
        self.prefill = prefill
        self.decode = decode
        self._prefill_q: "queue.Queue[_Pending]" = queue.Queue()
        self._ready_q: "queue.Queue[tuple]" = queue.Queue()
        self._submit_to_rid: Dict[int, int] = {}
        self._pending_meta: Dict[int, _Pending] = {}
        self._results: Dict[int, GenerationResult] = {}
        self._next_submit = 0
        self._submit_lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self._prefill_errors: Dict[int, Exception] = {}
        # per-sid synchronous waiters (prefill_blocking): ready prefills for
        # these sids resolve an event instead of entering the step() queue
        self._waiters: Dict[int, threading.Event] = {}
        self._waiter_results: Dict[int, PrefillResult] = {}

    # -- submission ----------------------------------------------------------

    def add_request(self, prompt_token_ids,
                    sampling_params: Optional[SamplingParams] = None,
                    callback: Optional[Callable] = None) -> int:
        with self._submit_lock:
            sid = self._next_submit
            self._next_submit += 1
        p = _Pending(sid, np.asarray(prompt_token_ids, np.int64),
                     sampling_params or SamplingParams(), callback)
        self._pending_meta[sid] = p
        self._prefill_q.put(p)
        return sid

    def prefill_blocking(self, prompt_token_ids,
                         sampling_params: Optional[SamplingParams] = None,
                         timeout_s: float = 600.0) -> PrefillResult:
        """Submit a prompt and BLOCK until its prefill completes.

        The serving adapter's admission path (engine/async_disaggregated.py):
        prompts still batch with whatever else is queued (the background
        prefill thread drains the shared queue into one dispatch), but the
        result resolves a per-request event instead of entering the
        coordinator's own decode admission queue — the caller admits it into
        the decode engine itself."""
        with self._submit_lock:
            sid = self._next_submit
            self._next_submit += 1
        ev = threading.Event()
        self._waiters[sid] = ev
        p = _Pending(sid, np.asarray(prompt_token_ids, np.int64),
                     sampling_params or SamplingParams(), None)
        self._prefill_q.put(p)
        try:
            if not ev.wait(timeout_s):
                raise TimeoutError(
                    f"prefill did not complete within {timeout_s}s")
            if sid in self._prefill_errors:
                raise RuntimeError("prefill failed") \
                    from self._prefill_errors.pop(sid)
            return self._waiter_results.pop(sid)
        finally:
            self._waiters.pop(sid, None)

    # -- loops ----------------------------------------------------------------

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._prefill_loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._prefill_q.put(None)  # wake
            self._thread.join(timeout=10)

    def _drain_batch(self, first=None) -> List[_Pending]:
        """Pull up to one dispatch's worth of queued prefills."""
        items = [] if first is None else [first]
        cap = min(self.prefill.max_inflight,
                  max(self.prefill.ecfg.prefill_batch_buckets))
        while len(items) < cap:
            try:
                nxt = self._prefill_q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                continue
            items.append(nxt)
        return items

    def _resolve_ready(self, sid: int, pr: "PrefillResult") -> None:
        ev = self._waiters.get(sid)
        if ev is not None:  # blocking waiter (serving adapter admission)
            self._waiter_results[sid] = pr
            ev.set()
        else:
            self._ready_q.put((sid, pr))

    def _run_batch(self, items: List[_Pending]) -> None:
        try:
            prs = self.prefill.run_prefill_batch(
                [it.prompt for it in items], [it.params for it in items])
            for it, pr in zip(items, prs):
                pr.submitted_id = it.submit_id
                self._resolve_ready(it.submit_id, pr)
        except Exception as exc:  # pragma: no cover
            logger.error("prefill failed: %s", exc, exc_info=True)
            # surface to the waiters — a silently dropped request would
            # spin generate() to max_steps and die on an unrelated KeyError.
            # Retry one-by-one so a single poison prompt doesn't take the
            # whole batch down with it.
            if len(items) == 1:
                sid = items[0].submit_id
                self._prefill_errors[sid] = exc
                ev = self._waiters.get(sid)
                if ev is not None:
                    ev.set()
                return
            for it in items:
                self._run_batch([it])

    def _prefill_loop(self) -> None:
        while self._running:
            item = self._prefill_q.get()
            if item is None:
                break
            # batch every prompt waiting right now into one dispatch
            self._run_batch(self._drain_batch(item))

    def process_prefills_sync(self) -> int:
        """Synchronous prefill drain (tests / no-thread mode).

        A no-op while the background prefill thread runs: both paths call
        run_prefill_batch on the SAME PrefillWorker and would contend for
        its scratch slots."""
        if self._running:
            return 0
        n = 0
        while not self._prefill_q.empty():
            items = self._drain_batch()
            if not items:
                break
            self._run_batch(items)
            n += len(items)
        return n

    def step(self) -> Dict[int, List[int]]:
        """Admit ready prefills, run one decode step, resolve finishes."""
        while not self._ready_q.empty():
            sid, pr = self._ready_q.get_nowait()
            rid = self.decode.receive_and_add_request(pr)
            if rid is None:
                self._ready_q.put((sid, pr))  # no KV room — retry later
                break
            self._submit_to_rid[sid] = rid

        result = self.decode.decode_step()

        eng = self.decode.engine
        for sid, rid in list(self._submit_to_rid.items()):
            req = eng.scheduler.get_request(rid)
            if req is not None and req.is_finished:
                meta = self._pending_meta.pop(sid)
                gen = eng._result_for(
                    req, req.num_generated,
                    (time.perf_counter() - meta.t0) * 1000)
                gen = GenerationResult(**{**gen.__dict__,
                                          "request_id": sid})
                self._results[sid] = gen
                if meta.callback:
                    meta.callback(gen)
                del self._submit_to_rid[sid]
        return result

    def generate(self, prompt_token_ids,
                 sampling_params: Optional[SamplingParams] = None,
                 max_steps: int = 10000) -> GenerationResult:
        sid = self.add_request(prompt_token_ids, sampling_params)
        steps = 0
        while sid not in self._results and steps < max_steps:
            if sid in self._prefill_errors:
                self._pending_meta.pop(sid, None)
                raise RuntimeError(
                    "prefill failed for this request"
                ) from self._prefill_errors.pop(sid)
            self.process_prefills_sync()
            self.step()
            steps += 1
        if sid not in self._results:
            raise TimeoutError(
                f"request {sid} did not finish within {max_steps} steps")
        return self._results.pop(sid)

    def get_stats(self) -> dict:
        return {
            "prefills_done": self.prefill.prefills_done,
            "pending_prefills": self._prefill_q.qsize(),
            "ready_for_decode": self._ready_q.qsize(),
            "decode": self.decode.engine.get_stats(),
        }


def setup_disaggregated(params, model_cfg: ModelConfig,
                        engine_cfg: EngineConfig,
                        prefill_mesh=None, decode_mesh=None
                        ) -> DisaggregatedCoordinator:
    """Build the two workers + coordinator (ref: disaggregated.py:996-1142).

    Separate meshes place the workers on DISJOINT device sets — the
    prefill group computes prompts while the decode group batches decodes,
    and KV crosses the group boundary device-to-device (KVTransfer). Each
    group gets its own sharded copy of the weights."""
    def place(mesh):
        if mesh is None:
            return params
        from .mesh import shard_params

        return shard_params(params, model_cfg, mesh)

    prefill = PrefillWorker(place(prefill_mesh), model_cfg, engine_cfg,
                            mesh=prefill_mesh)
    decode = DecodeWorker(place(decode_mesh), model_cfg, engine_cfg,
                          mesh=decode_mesh)
    return DisaggregatedCoordinator(prefill, decode)
