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
    kv_blocks: dict  # {logical_block_idx: (k (L,bs,Hkv,d), v ...)} host copies
    prompt_len: int
    sampling_params: SamplingParams
    submitted_id: int = -1


class KVTransfer:
    """Move a request's KV blocks between runners.

    The host copy is the CPU-test transport; on hardware the same arrays
    move device-to-device (``jax.device_put`` onto the decode mesh rides
    ICI/DCN without staging through host RAM)."""

    @staticmethod
    def export_blocks(runner: ModelRunner, block_ids: List[int]) -> dict:
        return runner.swap_out_blocks(block_ids)

    @staticmethod
    def import_blocks(runner: ModelRunner, saved: dict,
                      target_block_ids: List[int]) -> None:
        runner.swap_in_blocks(saved, target_block_ids)


class PrefillWorker:
    """Full-prompt forward + first-token sample on the prefill devices
    (ref: disaggregated.py:327-455)."""

    def __init__(self, params, model_cfg: ModelConfig,
                 engine_cfg: EngineConfig, mesh=None):
        self.cfg = model_cfg
        self.ecfg = engine_cfg
        self.runner = ModelRunner(params, model_cfg, engine_cfg, mesh=mesh)
        self._scratch_blocks = list(range(1, engine_cfg.max_blocks_per_seq + 1))
        self.prefills_done = 0

    def run_prefill(self, prompt_token_ids,
                    sampling_params: Optional[SamplingParams] = None
                    ) -> PrefillResult:
        from ..core.sampling import SamplerFeatures, make_param_arrays
        from ..core.scheduler import Request

        sp = sampling_params or SamplingParams()
        prompt = np.asarray(prompt_token_ids, np.int64)
        t = len(prompt)
        bs = self.ecfg.kv_block_size
        nblocks = -(-t // bs)
        if nblocks > len(self._scratch_blocks) or t > self.ecfg.max_seq_len:
            # a truncated block table would let later positions overwrite
            # earlier blocks and ship corrupt KV downstream — fail loudly
            # (the engine's normal admission path validates prompt length)
            raise ValueError(
                f"prompt of {t} tokens exceeds the prefill worker's "
                f"max_seq_len ({self.ecfg.max_seq_len})")
        block_ids = self._scratch_blocks[:nblocks]

        req = Request(request_id=0, prompt_token_ids=prompt,
                      max_new_tokens=sp.max_tokens,
                      eos_token_id=self.cfg.eos_token_id)
        features = SamplerFeatures.for_params([sp])
        sample_args = make_param_arrays([sp], [req])
        tokens, _ = self.runner.execute(
            token_ids=prompt[None, :],
            positions=np.arange(t, dtype=np.int32)[None, :],
            block_tables=np.asarray(block_ids, np.int32)[None, :],
            ctx_lens=np.array([t], np.int32),
            last_idx=np.array([t - 1], np.int32),
            valid=np.ones((1, t), bool),
            slot_ids=np.zeros(1, np.int32),
            sample_mask=np.ones(1, bool),
            sample_args=sample_args,
            features=features,
            kind="prefill",
        )
        saved = KVTransfer.export_blocks(self.runner, block_ids)
        self.prefills_done += 1
        return PrefillResult(
            prompt_token_ids=prompt,
            first_token=int(tokens[0]),
            kv_blocks=saved,
            prompt_len=t,
            sampling_params=sp,
        )


class DecodeWorker:
    """Continuous-batching decode engine that admits prefilled requests
    (ref: disaggregated.py:487-708)."""

    def __init__(self, params, model_cfg: ModelConfig,
                 engine_cfg: EngineConfig, mesh=None):
        self.engine = Engine(params, model_cfg, engine_cfg, mesh=mesh)

    def receive_and_add_request(self, pr: PrefillResult) -> Optional[int]:
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
        n_prefill_blocks = len(pr.kv_blocks)
        KVTransfer.import_blocks(
            self.engine.runner, pr.kv_blocks,
            req.kv_block_ids[:n_prefill_blocks])
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
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self._prefill_errors: Dict[int, Exception] = {}

    # -- submission ----------------------------------------------------------

    def add_request(self, prompt_token_ids,
                    sampling_params: Optional[SamplingParams] = None,
                    callback: Optional[Callable] = None) -> int:
        sid = self._next_submit
        self._next_submit += 1
        p = _Pending(sid, np.asarray(prompt_token_ids, np.int64),
                     sampling_params or SamplingParams(), callback)
        self._pending_meta[sid] = p
        self._prefill_q.put(p)
        return sid

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

    def _prefill_loop(self) -> None:
        while self._running:
            item = self._prefill_q.get()
            if item is None:
                break
            try:
                pr = self.prefill.run_prefill(item.prompt, item.params)
                pr.submitted_id = item.submit_id
                self._ready_q.put((item.submit_id, pr))
            except Exception as exc:  # pragma: no cover
                logger.error("prefill failed: %s", exc, exc_info=True)
                # surface to the waiter — a silently dropped request would
                # spin generate() to max_steps and die on an unrelated
                # KeyError
                self._prefill_errors[item.submit_id] = exc

    def process_prefills_sync(self) -> int:
        """Synchronous prefill drain (tests / no-thread mode).

        A no-op while the background prefill thread runs: both paths call
        run_prefill on the SAME PrefillWorker, whose scratch blocks are
        shared — concurrent prefills would interleave KV writes and ship
        corrupted context to the decode worker."""
        if self._running:
            return 0
        n = 0
        while not self._prefill_q.empty():
            item = self._prefill_q.get_nowait()
            if item is None:
                continue
            pr = self.prefill.run_prefill(item.prompt, item.params)
            pr.submitted_id = item.submit_id
            self._ready_q.put((item.submit_id, pr))
            n += 1
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
    Separate meshes place the workers on disjoint device sets."""
    prefill = PrefillWorker(params, model_cfg, engine_cfg, mesh=prefill_mesh)
    decode = DecodeWorker(params, model_cfg, engine_cfg, mesh=decode_mesh)
    return DisaggregatedCoordinator(prefill, decode)
