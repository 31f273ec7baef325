"""Synchronous inference engine: continuous batching over the ModelRunner.

Step loop semantics mirror the reference engine
(ref: engine/i64_engine.py:695-1033): cleanup -> timeout sweep -> schedule ->
forward -> last-token logits -> per-request sampling -> scheduler update,
with per-step perf accounting exposed via get_stats()["perf"].

TPU-first differences:
- sampling happens ON DEVICE inside the step program for the common path;
  only "complex" rows (logprobs / logit_bias / constraints / beams) pull
  their logits row to the host (ref analog: complex-request partition at
  i64_engine.py:878-905).
- the batch is split into one decode program + one prefill program per step
  (bucketed static shapes), instead of eager ragged execution.
- model=None runs a host-side random-logits engine for scheduler/API tests
  (the reference's central fixture trick, i64_engine.py:835-836).
"""

from __future__ import annotations

import hashlib
import logging
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..core.logits_processor import (
    NEG_INF,
    OutputConstraints,
    StopSequenceProcessor,
    apply_logits_processors,
)
from ..core.sampling import (
    BeamSearcher,
    SamplerFeatures,
    SamplingParams,
    TokenLogprob,
    compute_logprobs_host,
    make_param_arrays,
    sample_host,
)
from ..core.scheduler import (
    Request,
    RequestState,
    ScheduledBatch,
    ScheduledSeq,
    Scheduler,
)
from .runner import ModelRunner

logger = logging.getLogger("vllm_i64_tpu.engine")


@dataclass
class GenerationResult:
    request_id: int
    prompt_tokens: List[int]
    output_tokens: List[int]
    num_steps: int
    elapsed_ms: float
    finish_reason: str = "length"
    logprobs: Optional[List[TokenLogprob]] = None
    text: Optional[str] = None


def _split(seq, cap: int):
    """Slice a list into chunks of at most cap."""
    if not seq:
        return
    for i in range(0, len(seq), max(cap, 1)):
        yield seq[i:i + cap]


@dataclass
class _PendingGroup:
    """A dispatched-but-unresolved step group (device arrays in flight)."""

    seqs: list
    params_list: list
    need_host: list
    tokens: object  # device array (padded)
    logits: object  # device array (padded) or None


class AdaptiveBatchSizer:
    """Throughput-window batch-size tuner (ref: i64_engine.py:46-72):
    keep a rolling window of step throughputs; grow max_batch_size by 1 when
    recent throughput beats the window average, shrink when it falls."""

    def __init__(self, initial: int, min_size: int = 1, max_size: int = 128,
                 window: int = 20):
        self.current = initial
        self.min_size = min_size
        self.max_size = max_size
        self.window = window
        self._throughputs: deque = deque(maxlen=window)

    def record(self, tokens: int, elapsed_ms: float) -> None:
        if elapsed_ms > 0:
            self._throughputs.append(tokens / (elapsed_ms / 1000.0))

    def adjust(self, allow_shrink: bool = True) -> int:
        """±1 on the max batch size from the throughput trend (ref:
        i64_engine.py:46-72). `allow_shrink=False` while requests are
        waiting for admission: shrinking then cannot evict anyone — it only
        pins a waiting request out of the batch (observed: one request
        starved for its neighbors' entire generation, and the engine's
        responsiveness fallback ran at window=1 the whole time)."""
        if len(self._throughputs) < self.window:
            return self.current
        avg = sum(self._throughputs) / len(self._throughputs)
        recent = sum(list(self._throughputs)[-5:]) / 5
        if recent > avg * 1.05:
            self.current = min(self.current + 1, self.max_size)
        elif allow_shrink and recent < avg * 0.9:
            self.current = max(self.current - 1, self.min_size)
        return self.current


class Engine:
    """Synchronous engine with continuous batching."""

    def __init__(
        self,
        params=None,
        model_config: Optional[ModelConfig] = None,
        engine_config: Optional[EngineConfig] = None,
        tokenizer=None,
        mesh=None,
        speculative=None,
    ):
        self.model_config = model_config or ModelConfig()
        # draft-model speculative decoding for small decode-only batches
        # (ref: i64_engine.py:809-818, _speculative_step :660-693)
        self.speculative = speculative
        self.spec_max_batch = 8
        self.engine_config = engine_config or EngineConfig()
        self.tokenizer = tokenizer

        ec = self.engine_config

        self.runner: Optional[ModelRunner] = None
        if params is not None:
            if ec.fuse_qkv and mesh is None:
                from ..core.quantize_model import fuse_qkv_params

                params = fuse_qkv_params(params)
            if ec.fuse_shared_expert and mesh is None:
                from ..core.quantize_model import fuse_shared_expert_params

                params = fuse_shared_expert_params(params, self.model_config)
            if ec.quantization in ("int8", "int4", "fp8"):
                # engine-side quantization runs AFTER the float fusions so
                # fused weights (qkv, shared-expert-folded MoE) quantize as
                # single tensors — for int4 this also 128-aligns every dim
                # so the whole model rides the fused Pallas kernels. No-op
                # for pre-quantized params (e.g. direct AWQ/GPTQ loads or a
                # caller that already ran quantize_params).
                from ..core.quantize_model import (
                    has_quantized_leaves,
                    quantize_params,
                )

                if not has_quantized_leaves(params):
                    params = quantize_params(
                        params, self.model_config, ec.quantization)
            from ..core.quantize_model import repack_int4_serving

            params = repack_int4_serving(params)
            if ec.w8a8 and mesh is None:
                # gate+up share one int8 GEMM under W8A8 (both halves use
                # the same quantized activations); without W8A8 the split
                # would re-slice the weights per layer per step instead
                from ..core.quantize_model import fuse_gate_up_params

                params = fuse_gate_up_params(params)
            if mesh is None:
                from ..core.quantize_model import materialize_lm_head

                params = materialize_lm_head(params, self.model_config)
            self.runner = ModelRunner(params, self.model_config, ec, mesh=mesh)

        # the scheduler's pool must match the runner's allocated cache —
        # the runner may upgrade the auto block count from measured free
        # HBM (engine/runner._auto_kv_blocks)
        # a single prefill chunk (one row) can never exceed the widest
        # compiled token bucket; the per-STEP total budget stays at
        # max_prefill_tokens so one dispatch can carry many whole prompts
        chunk_cap = min(ec.max_prefill_tokens,
                        max(ec.prefill_token_buckets))
        self.scheduler = Scheduler(
            max_batch_size=ec.max_batch_size,
            max_seq_len=ec.max_seq_len,
            kv_block_size=ec.kv_block_size,
            max_kv_blocks=(self.runner.num_blocks if self.runner is not None
                           else ec.resolve_kv_blocks()),
            max_prefill_tokens=ec.max_prefill_tokens,
            max_chunk_tokens=chunk_cap,
            enable_preemption=ec.enable_preemption,
            enable_prefix_caching=ec.enable_prefix_caching,
        )
        if ec.enable_kv_swap and self.runner is not None:
            # preemption saves KV to host instead of discarding it
            # (ref: kv_cache.py:711-813; see core/kv_swap.py)
            from ..core.kv_swap import RunnerKVSwap

            self.scheduler.kv_swap = RunnerKVSwap(
                self.runner, ec.kv_swap_max_mb * 1024 * 1024
            )

        # hot-swap LoRA adapters (enabled via enable_lora(); ref:
        # i64_engine.py:402-454)
        self.lora_manager = None

        # optional vision tower for VLM requests (ref: layers/vision.py,
        # pixel_values threading at i64_engine.py:572-574, 1129-1151)
        self.vision_params = None
        self.vision_config = None

        # engine-state lock: the async wrapper admits/cancels from worker
        # threads while step() runs in another — scheduler heaps, the block
        # pool, and slot maps are not thread-safe on their own
        self._lock = threading.RLock()
        # mid-prompt prefill chunk groups dispatched without a host sync
        # (see _finish_group) — kept alive until a bounded-depth retire
        self._inflight_groups: list = []
        self._lock_waiters = 0  # admission fairness (see step())

        # per-request state
        self._params_by_rid: Dict[int, SamplingParams] = {}
        # VLM soft tokens: rid -> ((P, H) f32 rows, (P,) prompt positions)
        self._soft_by_rid: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._procs_by_rid: Dict[int, list] = {}  # logits-processor chains
        self._logprobs_by_rid: Dict[int, List[TokenLogprob]] = {}
        self._slot_by_rid: Dict[int, int] = {}
        self._free_slots = list(range(ec.max_batch_size - 1, -1, -1))
        self._deadlines: Dict[int, float] = {}
        self._host_rng = np.random.default_rng(0)

        # request merging: md5-keyed dedup of identical greedy prompts —
        # secondaries piggyback on the primary's tokens with zero compute/KV
        # (ref: i64_engine.py:499-521, 969-1005)
        self._merge_enabled = ec.enable_request_merging
        # prompt_hash -> (primary_rid, prompt_tuple, [secondary_rids])
        self._merge_primaries: Dict[bytes, Tuple[int, tuple, List[int]]] = {}
        # pipelined multistep decode: the window in flight on device while
        # the host processes the previous one ({"win": PendingWindow,
        # "reqs": [Request...]} or None)
        self._decode_chain = None
        self._merged_secondaries: Dict[int, dict] = {}
        self.merged_finished: Dict[int, GenerationResult] = {}

        # adaptive batch sizing (ref: i64_engine.py:46-72, 1024-1031).
        # Shrink floor = the largest compiled decode bucket <= the
        # configured max: under bucketed static shapes a smaller LOGICAL
        # batch pads to the same program, so shrinking below a bucket
        # boundary cannot reduce step cost — it only pins waiting requests
        # out of the batch. Observed on v5e serving (HTTP bench): noisy
        # remote step timings drove min_size=1 into a death spiral
        # (shrink -> fewer rows -> lower throughput -> shrink), collapsing
        # a 64-way continuous batch to ~1 token/step.
        _dec_floor = max(
            (b for b in ec.decode_batch_buckets if b <= ec.max_batch_size),
            default=ec.max_batch_size,
        )
        self.batch_sizer = AdaptiveBatchSizer(
            ec.max_batch_size, min_size=_dec_floor,
            max_size=ec.max_batch_size,
        )

        # perf counters (ref: i64_engine.py:160-165)
        self.total_steps = 0
        self.total_tokens_generated = 0
        self._perf = {"schedule_ms": 0.0, "forward_ms": 0.0, "sample_ms": 0.0, "total_ms": 0.0}
        # step-mix observability: how the serving workload actually lands
        # on the dispatch paths (chained windows vs mixed windows vs
        # single-step) and how full the decode batches run — the numbers
        # that explain a throughput gap between bench and serve workloads
        self._step_mix = {"chained": 0, "window": 0, "single": 0,
                          "decode_rows": 0, "prefill_rows": 0,
                          "window_k_sum": 0, "window_tokens": 0,
                          "window_fallback_rows": 0,
                          "fb_host": 0, "fb_capacity": 0,
                          "ep_overflow_pairs": 0}

        # EP a2a overflow guard (VERDICT r3 #6): routing is a pure function
        # of (token_ids, table), so capacity overflow is PREDICTED exactly
        # on the host and policed per ModelConfig.ep_overflow_policy —
        # dropping is never silent. See ops/ep_dispatch module docstring.
        self._ep_tables = None
        self._ep_size = 1
        if (self.model_config.moe_backend == "ep_a2a"
                and self.runner is not None):
            self._init_ep_overflow_guard()

    # -- EP overflow guard ----------------------------------------------------

    def _init_ep_overflow_guard(self) -> None:
        from ..ops.ep_dispatch import audit_route_table

        mesh = getattr(self.runner, "mesh", None)
        try:
            self._ep_size = int(mesh.shape.get("ep", 1)) if mesh else 1
        except Exception:
            self._ep_size = 1
        mp = self.runner.params.get("layers", {}).get("mlp", {})
        rt = mp.get("route_table")
        if rt is None or self._ep_size <= 1:
            return  # ep=1: capacity >= all pairs, dropping impossible
        self._ep_tables = np.asarray(rt)  # (L, K, V)
        worst = 0.0
        for li in range(self._ep_tables.shape[0]):
            a = audit_route_table(
                self._ep_tables[li],
                num_experts=self.model_config.num_experts,
                ep_size=self._ep_size)
            worst = max(worst, a["safe_capacity_factor"])
        cf = self.model_config.ep_capacity_factor
        if self.model_config.ep_overflow_policy == "never_drop" and worst > cf:
            # raise capacity BEFORE any step program traces — overflow
            # becomes impossible for any token batch (table-audit bound).
            # The runner compiles lazily, so swapping its config here (it
            # was constructed moments ago in __init__) retraces nothing.
            self.model_config = self.model_config.replace(
                ep_capacity_factor=float(worst))
            self.runner.cfg = self.model_config
            logger.info(
                "ep_a2a never_drop: capacity factor %.2f -> %.2f "
                "(route-table audit over %d layers)",
                cf, worst, self._ep_tables.shape[0])

    def _ep_count_dispatch(self, token_ids: np.ndarray,
                           padded_tokens: int) -> int:
        from ..ops.ep_dispatch import count_ep_overflow

        total = 0
        cf = self.model_config.ep_capacity_factor
        for li in range(self._ep_tables.shape[0]):
            total += count_ep_overflow(
                token_ids, self._ep_tables[li],
                num_experts=self.model_config.num_experts,
                ep_size=self._ep_size, capacity_factor=cf,
                padded_tokens=padded_tokens)
        return total

    def _ep_apply_overflow(self, dropped: int, where: str) -> None:
        if dropped <= 0:
            return
        self._step_mix["ep_overflow_pairs"] += dropped
        msg = (f"ep_a2a capacity overflow: {dropped} (route, token) pairs "
               f"over capacity in {where} (factor "
               f"{self.model_config.ep_capacity_factor}, ep={self._ep_size})")
        if self.model_config.ep_overflow_policy == "error":
            raise RuntimeError(msg)
        logger.warning("%s — their expert contributions degrade", msg)

    def _ep_check_scheduled(self, decode, prefill) -> None:
        """Pre-dispatch check of this step's scheduled tokens (exact: the
        deterministic routes of these ids against each layer's table).
        Policy 'error' fails the step BEFORE anything executes."""
        from .runner import _bucket

        dropped = 0
        if decode:
            ids = np.concatenate([s.token_ids for s in decode])
            padded = _bucket(len(decode), self.engine_config.decode_batch_buckets)
            dropped += self._ep_count_dispatch(ids, padded)
        if prefill:
            ids = np.concatenate([s.token_ids for s in prefill])
            b = _bucket(len(prefill), self.engine_config.prefill_batch_buckets)
            t = _bucket(max(len(s.token_ids) for s in prefill),
                        self.engine_config.prefill_token_buckets)
            dropped += self._ep_count_dispatch(ids, b * t)
        self._ep_apply_overflow(dropped, "scheduled batch")

    def _ep_check_emitted(self, result) -> None:
        """Post-hoc check of multistep-window iterations: tokens sampled
        in-window routed through the MLPs on device before the host could
        see them — reconstruct each iteration's dispatch from the emitted
        sequences (detection one window late; exact counts)."""
        from .runner import _bucket

        rows = [toks for toks in result.values() if len(toks) > 1]
        if not rows:
            return
        iters = max(len(t) for t in rows)
        padded = _bucket(len(rows), self.engine_config.decode_batch_buckets)
        dropped = 0
        last = 1 if self._decode_chain is not None else 0
        for j in range(iters - 1 + last):
            ids = np.asarray([t[min(j, len(t) - 1)] for t in rows], np.int64)
            dropped += self._ep_count_dispatch(ids, padded)
        self._ep_apply_overflow(dropped, "multistep window")

    # -- request management ---------------------------------------------------

    def add_request(
        self,
        prompt_token_ids,
        sampling_params: Optional[SamplingParams] = None,
        priority: int = 0,
        timeout_s: Optional[float] = None,
        cache_namespace: Optional[bytes] = None,
        soft_embeds: Optional[np.ndarray] = None,
        soft_positions: Optional[np.ndarray] = None,
    ) -> int:
        self._lock_waiters += 1
        try:
            with self._lock:
                return self._add_request_locked(
                    prompt_token_ids, sampling_params, priority, timeout_s,
                    cache_namespace, soft_embeds, soft_positions)
        finally:
            self._lock_waiters -= 1

    def _add_request_locked(
        self,
        prompt_token_ids,
        sampling_params: Optional[SamplingParams] = None,
        priority: int = 0,
        timeout_s: Optional[float] = None,
        cache_namespace: Optional[bytes] = None,
        soft_embeds: Optional[np.ndarray] = None,
        soft_positions: Optional[np.ndarray] = None,
    ) -> int:
        params = sampling_params or SamplingParams()
        prompt = np.asarray(prompt_token_ids, dtype=np.int64)
        if prompt.size == 0:
            raise ValueError("empty prompt")
        max_total = self.engine_config.max_seq_len
        if prompt.size + params.max_tokens > max_total:
            raise ValueError(
                f"prompt ({prompt.size}) + max_tokens ({params.max_tokens}) "
                f"exceeds max_seq_len ({max_total})"
            )
        eos = self.model_config.eos_token_id

        # VLM soft tokens: (P, H) vision-projector rows occupying the given
        # prompt positions (which must hold the image-placeholder token id)
        if soft_embeds is not None:
            soft_embeds = np.asarray(soft_embeds, np.float32)
            if soft_embeds.ndim == 3:  # (N_img, patches, H) -> flat rows
                soft_embeds = soft_embeds.reshape(-1, soft_embeds.shape[-1])
            if soft_positions is None:
                soft_positions = np.arange(len(soft_embeds))
            soft_positions = np.asarray(soft_positions, np.int64)
            if soft_embeds.shape[0] != soft_positions.shape[0]:
                raise ValueError("soft_embeds rows != soft_positions")
            if soft_embeds.shape[1] != self.model_config.hidden_size:
                raise ValueError(
                    f"soft_embeds width {soft_embeds.shape[1]} != hidden_size "
                    f"{self.model_config.hidden_size}")
            if soft_positions.size and (
                soft_positions.min() < 0 or soft_positions.max() >= prompt.size
            ):
                raise ValueError("soft_positions outside the prompt")
            # identical placeholder ids must not prefix-cache-hit across
            # different images — salt the namespace with the image content
            img_salt = hashlib.sha256(soft_embeds.tobytes()).digest()[:16]
            cache_namespace = hashlib.sha256(
                (cache_namespace or b"") + img_salt).digest()[:16]

        # merge path: identical greedy prompt already running -> piggyback.
        # Only behavior-free requests are mergeable — per-request stops,
        # min_tokens, or any host-path feature would be silently ignored on
        # a secondary.
        mergeable = (
            self._merge_enabled
            and soft_embeds is None  # same placeholder ids, different images
            and params.is_greedy
            and not params.needs_host_sampling
            and not params.stop
            and not params.stop_token_ids
            and not params.min_tokens
        )
        if mergeable:
            phash = hashlib.md5(prompt.tobytes()).digest()
            group = self._merge_primaries.get(phash)
            if group is not None:
                primary_rid, primary_prompt, sec_list = group
                preq = self.scheduler.get_request(primary_rid)
                if (
                    tuple(int(t) for t in prompt) == primary_prompt
                    and preq is not None
                    and preq.state != RequestState.FINISHED
                ):
                    sec_rid = self.scheduler._next_id
                    self.scheduler._next_id += 1
                    # backfill tokens the primary already produced — a
                    # late-joining secondary must still get a full completion
                    backfill = list(
                        preq.output_token_ids[: params.max_tokens])
                    # NOTE: no _params_by_rid entry for secondaries — they
                    # never sample (only behavior-free params merge) and the
                    # entry would outlive the merged result (leak)
                    self._merged_secondaries[sec_rid] = {
                        "prompt": [int(t) for t in prompt],
                        "output": backfill,
                        "max_new_tokens": params.max_tokens,
                        "t0": time.perf_counter(),
                    }
                    if len(backfill) >= params.max_tokens or (
                        backfill and backfill[-1] == eos
                    ):
                        # the primary's existing tokens already satisfy this
                        # request — resolve immediately, never join the group
                        self.merged_finished[sec_rid] = GenerationResult(
                            request_id=sec_rid,
                            prompt_tokens=[int(t) for t in prompt],
                            output_tokens=backfill,
                            num_steps=0,
                            elapsed_ms=0.0,
                            finish_reason=("stop" if backfill
                                           and backfill[-1] == eos
                                           else "length"),
                        )
                        del self._merged_secondaries[sec_rid]
                        return sec_rid
                    sec_list.append(sec_rid)
                    return sec_rid

        rid = self.scheduler.add_request(
            prompt,
            max_new_tokens=params.max_tokens,
            priority=priority,
            eos_token_id=eos,
            cache_namespace=cache_namespace,
        )
        if mergeable:
            phash = hashlib.md5(prompt.tobytes()).digest()
            if phash not in self._merge_primaries:
                self._merge_primaries[phash] = (
                    rid, tuple(int(t) for t in prompt), []
                )
        self._params_by_rid[rid] = params
        if soft_embeds is not None:
            # kept until purge: preemption restore re-prefills and needs the
            # rows again
            self._soft_by_rid[rid] = (soft_embeds, soft_positions)
        procs = self._build_processors(params, eos)
        if procs:
            self._procs_by_rid[rid] = procs
        timeout = timeout_s if timeout_s is not None else (
            self.engine_config.request_timeout_s or None
        )
        if timeout:
            self._deadlines[rid] = time.monotonic() + timeout
        return rid

    def _build_processors(self, params: SamplingParams, eos: int) -> list:
        """Assemble the request's logits-processor chain from SamplingParams
        (ref: OutputConstraints.build_processors, logits_processor.py:266-288,
        engine wiring at i64_engine.py:530-545)."""
        constraints = params.output_constraints
        if constraints is None and (
            params.json_mode or params.stop or params.stop_token_ids
        ):
            constraints = OutputConstraints(json_mode=params.json_mode)
        if constraints is None:
            return []

        stop_seqs = list(constraints.stop_sequences or [])
        # OpenAI `stop` strings -> token sequences via the tokenizer
        if params.stop and self.tokenizer is not None:
            for s in params.stop:
                ids = list(self.tokenizer.encode(s))
                if ids:
                    stop_seqs.append(ids)
        # extra single-token stops beyond EOS
        for tid in params.stop_token_ids or []:
            stop_seqs.append([int(tid)])
        if stop_seqs:
            constraints = OutputConstraints(
                json_mode=constraints.json_mode,
                regex_pattern=constraints.regex_pattern,
                choices=constraints.choices,
                stop_sequences=stop_seqs,
                suppress_first_tokens=constraints.suppress_first_tokens,
            )
        procs = constraints.build_processors(
            tokenizer=self.tokenizer, eos_token_id=eos)
        # SINGLE-id step-0 suppression runs inside the device sampler
        # (make_param_arrays reads it off params.output_constraints), so its
        # host processor is redundant — and keeping it would put every HTTP
        # completion's first token on the return_logits host path (the
        # server attaches bare-space suppression to ALL completions). Rows
        # that are host-path anyway (logprobs/bias/beams) keep the
        # processor: the host sampler doesn't read suppress_step0.
        if (constraints.suppress_first_tokens
                and len(constraints.suppress_first_tokens) == 1
                and not constraints.json_mode
                and not constraints.regex_pattern
                and not constraints.choices
                and params.logprobs is None
                and params.logit_bias is None
                and params.num_beams <= 1):
            from ..core.logits_processor import SuppressTokensProcessor

            procs = [p for p in procs
                     if not isinstance(p, SuppressTokensProcessor)]
        return procs

    def _needs_host(self, params: SamplingParams, rid: int) -> bool:
        """Host-path rows: logprobs / bias / beams, or LIVE constraint
        processors. Constraints are judged by their operational form — the
        processor chain — not by ``params.output_constraints``: a spent
        step-0 processor (suppress-first-tokens) is pruned from the chain
        after token 0, and the request returns to the fused on-device path
        (the params object still carries the constraints descriptor).
        Pure stop-sequence chains stay on the device path (stops are
        checked post-sample)."""
        if (params.logprobs is not None
                or params.logit_bias is not None
                or params.num_beams > 1):
            return True
        procs = self._procs_by_rid.get(rid)
        return bool(procs) and any(
            not isinstance(p, StopSequenceProcessor) for p in procs
        )

    def _prune_spent_processors(self) -> None:
        """Drop step-0-only processors once a request has generated a token.

        The HTTP server attaches suppress-first-tokens (bare-space masking)
        to EVERY completion; the processor is inert after token 0, but its
        presence made `_needs_host` true for the request's WHOLE lifetime —
        single-token host-sampled steps instead of fused multistep windows.
        Measured on v5e serving: this one condition collapsed HTTP
        throughput to ~1 token/request/step (~30 tok/s vs the engine's
        5k+). Pruning returns the row to the on-device path after its
        first token."""
        from ..core.logits_processor import SuppressTokensProcessor

        for rid, procs in list(self._procs_by_rid.items()):
            req = self.scheduler.get_request(rid)
            if req is None or req.num_generated == 0:
                continue
            kept = [p for p in procs
                    if not isinstance(p, SuppressTokensProcessor)]
            if len(kept) == len(procs):
                continue
            if kept:
                self._procs_by_rid[rid] = kept
            else:
                del self._procs_by_rid[rid]

    def cancel_request(self, rid: int) -> bool:
        with self._lock:
            ok = self.scheduler.cancel(rid)
            if ok:
                # full purge: cancel callers (HTTP /v1/cancel, async futures)
                # never pick up a result, so leaving per-request state for a
                # later _result_for leaks it forever (found by tools/tpu_soak
                # — 1 _params_by_rid entry per cancel). wait_for on a
                # cancelled rid raises KeyError, which callers expect.
                self._purge_request(rid)
            return ok

    def _release_slot(self, rid: int) -> None:
        slot = self._slot_by_rid.pop(rid, None)
        if slot is not None:
            self._free_slots.append(slot)
            if self.runner is not None:
                self.runner.clear_slot(slot)

    def _release_request(self, rid: int) -> None:
        self._release_slot(rid)
        self._deadlines.pop(rid, None)

    def _purge_request(self, rid: int) -> None:
        """Drop all per-request bookkeeping once the result is consumed —
        long-lived servers must not accumulate Request/params objects or
        rescan an ever-growing finished list (O(n) per step otherwise)."""
        self._release_request(rid)
        self._params_by_rid.pop(rid, None)
        self._procs_by_rid.pop(rid, None)
        self._logprobs_by_rid.pop(rid, None)
        self._soft_by_rid.pop(rid, None)
        if self.speculative is not None:
            self.speculative.release(rid)
        req = self.scheduler._requests.pop(rid, None)
        if req is not None:
            try:
                self.scheduler.finished.remove(req)
            except ValueError:
                pass
            # a request can be purged while still in `running` (finished
            # mid-step, e.g. kv_oom inside _grow_blocks, consumed before the
            # next sweep) — detach fully or the sweep re-appends it to
            # `finished` AFTER this purge and it leaks forever
            if req in self.scheduler.running:
                self.scheduler.running.remove(req)
                self.scheduler.blocks.free(req.kv_block_ids)
                req.kv_block_ids = []
        # drop a merge-group entry whose primary is gone and drained
        for phash, (prid, _, secs) in list(self._merge_primaries.items()):
            if prid == rid and not secs:
                del self._merge_primaries[phash]

    def _assign_slot(self, req: Request) -> int:
        rid = req.request_id
        if rid in self._slot_by_rid:
            return self._slot_by_rid[rid]
        slot = self._free_slots.pop()
        self._slot_by_rid[rid] = slot
        params = self._params_by_rid.get(rid)
        if self.runner is not None:
            if params is not None and params.needs_token_history:
                self.runner.load_slot_history(slot, req.prompt_token_ids)
            else:
                self.runner.clear_slot(slot)
        return slot

    # -- program warmup ---------------------------------------------------------

    def warmup(
        self,
        sampling_examples=None,
        include_host_sampling: bool = True,
        log=None,
    ) -> int:
        """Precompile the step programs serving traffic will dispatch.

        Programs compile lazily per bucket combination, and WHICH
        combination a step hits depends on request arrival timing — so
        without warmup, a multi-second remote compile can land mid-traffic
        and stall every in-flight request (observed: one fresh prefill
        grouping shape set wire TTFT p50 to 6.6s at concurrency 64).

        ``sampling_examples``: SamplingParams whose SamplerFeatures sets to
        warm — each distinct feature set is its own program family. The
        default covers plain greedy, greedy+min_tokens, nucleus sampling,
        and the fully-generic set. Requests using an unwarmed feature set
        still work; they compile on first dispatch.

        Returns the number of programs compiled. See
        Runner.warmup_programs for the enumeration.
        """
        if self.runner is None:
            return 0
        if sampling_examples is None:
            # mirror what real clients send: the HTTP API defaults
            # repetition_penalty to 1.1 (reference serving default), so
            # every API request lands in the penalties=True program family
            # — warm both the API-shaped sets and the bare library ones
            sampling_examples = [
                SamplingParams(temperature=0.0),
                SamplingParams(temperature=0.0, repetition_penalty=1.1),
                SamplingParams(temperature=0.0, repetition_penalty=1.1,
                               min_tokens=1),
                SamplingParams(temperature=0.8, top_p=0.95, top_k=40,
                               repetition_penalty=1.1),
                SamplingParams(
                    temperature=0.8, top_p=0.9, top_k=40, min_p=0.05,
                    typical_p=0.95, repetition_penalty=1.1,
                    frequency_penalty=0.1, presence_penalty=0.1,
                    min_tokens=1,
                ),
            ]
        feature_sets = [
            SamplerFeatures.for_params([p]) for p in sampling_examples
        ]
        logits_sets = []
        if include_host_sampling:
            # host-sampled rows (logprobs, logit_bias, stop sequences) ride
            # return_logits=True programs; greedy + fully-generic cover the
            # common cases (stop strings arrive with plain greedy params)
            logits_sets = [feature_sets[0], feature_sets[-1]]
        with self._lock:
            return self.runner.warmup_programs(
                feature_sets, logits_feature_sets=logits_sets, log=log,
            )

    # -- stepping ---------------------------------------------------------------

    def step(self) -> Dict[int, List[int]]:
        """One engine iteration. Returns {request_id: [new_token_ids...]}.

        Single-step paths yield 1-element lists; multi-step decode yields up
        to ``multistep_decode`` accepted tokens per request."""
        # fairness: a tight step loop can re-acquire the (unfair) lock
        # before a blocked admission thread wakes — yield briefly when
        # someone is waiting so new requests join the batch promptly
        if self._lock_waiters > 0:
            time.sleep(0.002)
        with self._lock:
            return self._step_locked()

    def _step_locked(self) -> Dict[int, List[int]]:
        t0 = time.perf_counter()

        if self._decode_chain is not None:
            # a multistep window is already executing on device: advance the
            # chain (dispatch the next window from its carry, then resolve
            # this one). Timeout sweep / fp8 upgrade wait for a normal step.
            t1 = time.perf_counter()
            result = self._chain_advance()
            self._perf["forward_ms"] += (time.perf_counter() - t1) * 1000
            self._check_stop_sequences(result)
            if self._merge_enabled and self._merge_primaries:
                self._propagate_merged(result)
            if self._ep_tables is not None:
                self._ep_check_emitted(result)
            self.total_steps += 1
            step_ms = (time.perf_counter() - t0) * 1000
            self._perf["total_ms"] += step_ms
            emitted = sum(len(v) for v in result.values())
            self.batch_sizer.record(emitted, step_ms)
            self.scheduler.max_batch_size = self.batch_sizer.adjust(
            allow_shrink=self.scheduler.num_pending == 0)
            return result

        self._sweep_timeouts()
        self._prune_spent_processors()
        self._maybe_enable_fp8_kv()

        batch = self.scheduler.schedule()
        self._perf["schedule_ms"] += (time.perf_counter() - t0) * 1000
        # release slots of requests that finished in the sweep
        for req in self.scheduler.finished:
            if req.request_id in self._slot_by_rid:
                self._release_request(req.request_id)
        # ...and of requests the scheduler preempted (they left running but
        # still hold sampler slots — exhausting the slot pool otherwise)
        for rid in list(self._slot_by_rid):
            req = self.scheduler.get_request(rid)
            if req is not None and req.state in (
                RequestState.PENDING, RequestState.PREEMPTED
            ):
                self._release_slot(rid)  # keep the deadline: it may resume
        if batch is None:
            # merged secondaries whose primary already finished still need
            # resolution even when nothing is scheduled
            if self._merge_enabled and self._merge_primaries:
                leftover: Dict[int, List[int]] = {}
                self._propagate_merged(leftover)
                return leftover
            return {}

        t1 = time.perf_counter()
        single: Dict[int, int] = {}
        multi: Optional[Dict[int, List[int]]] = None
        multi_applied = False
        if self.runner is None:
            single = self._step_modelless(batch)
        else:
            decode = batch.decode_seqs
            prefill = self._pack_prefill_rows(batch.prefill_seqs)
            if self._ep_tables is not None:
                self._ep_check_scheduled(decode, prefill)
            k = self._multistep_window(batch)
            dec_cap = max(self.engine_config.decode_batch_buckets)
            pre_cap = max(self.engine_config.prefill_batch_buckets)
            if (
                decode and not prefill
                and self.speculative is not None
                and len(decode) <= self.spec_max_batch
            ):
                multi = self._speculative_step(decode)
            elif decode and k > 1:
                if (
                    not prefill
                    and self.speculative is None
                    and len(decode) <= dec_cap
                    and self.engine_config.decode_chaining
                    and self._chain_init_eligible(decode, k)
                ):
                    # pure-decode steady state: start a pipelined window
                    # chain. Window 1 dispatches here; _chain_advance then
                    # dispatches window 2 from its on-device carry before
                    # resolving window 1 — from now on, one window is always
                    # executing while the host processes the previous one.
                    self._dispatch_chain_window(decode, k)
                    multi = self._chain_advance()
                    multi_applied = True
                    self._step_mix["chained"] += 1
                    self._step_mix["window_k_sum"] += k
                    self._step_mix["decode_rows"] += len(decode)
                else:
                    # decode rows run the fused multistep window even when
                    # prefill chunks share the step. WINDOWS enqueue first:
                    # a request is either prefilling or decoding, so the
                    # window never reads KV the wave is about to write, and
                    # decode tokens resolve after ~one window of device
                    # time instead of queueing behind the wave (~130 ms —
                    # that queue WAS the sustained-load ITL p99). The wave
                    # rides behind the window and both resolve in order.
                    wins = [
                        self._dispatch_multi_decode(part, k)
                        for part in _split(decode, dec_cap)
                    ]
                    pending = [
                        self._dispatch_group(part, kind="prefill")
                        for part in self._split_prefill_parts(
                            prefill, pre_cap)
                    ]
                    multi = {}
                    for w in wins:
                        multi.update(self._resolve_multi_decode(*w))
                    single.update(self._finish_groups(pending))
                    self._step_mix["window"] += 1
                    self._step_mix["window_k_sum"] += k
                    self._step_mix["decode_rows"] += len(decode)
                    self._step_mix["prefill_rows"] += len(prefill)
            else:
                # the scheduler can emit more rows than the largest compiled
                # bucket; split so padding never exceeds the bucket table.
                # Dispatch EVERY part before resolving any — the device
                # executes the queue in order while the host keeps enqueueing,
                # so N parts cost ~1 round-trip instead of N.
                pending = [
                    self._dispatch_group(part, kind="decode")
                    for part in _split(decode, dec_cap)
                ]
                pending += [
                    self._dispatch_group(part, kind="prefill")
                    for part in self._split_prefill_parts(prefill, pre_cap)
                ]
                single.update(self._finish_groups(pending))
                self._step_mix["single"] += 1
                self._step_mix["decode_rows"] += len(decode)
                self._step_mix["prefill_rows"] += len(prefill)
        self._perf["forward_ms"] += (time.perf_counter() - t1) * 1000

        result: Dict[int, List[int]] = {}
        if multi is not None and multi_applied:
            # chain path: tokens already applied inside _chain_advance
            result.update(multi)
        elif multi is not None:
            for rid, toks in multi.items():
                req = self.scheduler.get_request(rid)
                n = self.scheduler.apply_decode_tokens(req, toks)
                result[rid] = toks[:n]
                self.total_tokens_generated += n
        if multi is None or single or batch.prefill_seqs:
            # prefill rows (and the pure single-step path) go through
            # update_after_step: chunk-progress advance + token append +
            # block growth. Decode rows already applied above are absent
            # from `single`, so the sweep skips them. batch.prefill_seqs
            # matters even when no token was sampled: a MID-prompt chunk
            # riding behind a decode window produces no sample, and
            # skipping the update froze prefill_done — the same chunk
            # re-dispatched every step (idempotent KV writes kept outputs
            # correct) until decode drained, serializing long-prompt
            # admission behind the whole decode backlog (measured: 25
            # identical (8,512) chunk dispatches in the mixed longctx
            # trace, TTFT p50 4.0s -> the chunk count collapses to 4).
            self.scheduler.update_after_step(batch, single)
            for rid, tok in single.items():
                result[rid] = [tok]
            self.total_tokens_generated += len(single)

        self._check_stop_sequences(result)
        if self._merge_enabled and self._merge_primaries:
            self._propagate_merged(result)
        if self._ep_tables is not None:
            self._ep_check_emitted(result)

        self.total_steps += 1
        step_ms = (time.perf_counter() - t0) * 1000
        self._perf["total_ms"] += step_ms

        # adaptive batch sizing (ref: i64_engine.py:1024-1031)
        emitted = sum(len(v) for v in result.values())
        self.batch_sizer.record(emitted, step_ms)
        self.scheduler.max_batch_size = self.batch_sizer.adjust(
            allow_shrink=self.scheduler.num_pending == 0)
        return result

    def _propagate_merged(self, result: Dict[int, List[int]]) -> None:
        """Copy the primary's new tokens to merged secondaries — zero compute
        and zero KV for duplicates (ref: i64_engine.py:969-1005). Secondaries
        finish on their own token budget, on EOS, or when the primary ends."""
        eos = self.model_config.eos_token_id
        for phash, (primary_rid, _, sec_rids) in list(self._merge_primaries.items()):
            preq = self.scheduler.get_request(primary_rid)
            primary_done = preq is None or preq.state == RequestState.FINISHED
            new_toks = result.get(primary_rid, [])
            done_secs = []
            for sec_rid in sec_rids:
                sec = self._merged_secondaries.get(sec_rid)
                if sec is None:
                    done_secs.append(sec_rid)
                    continue
                emitted = []
                finished_reason = None
                for tok in new_toks:
                    sec["output"].append(tok)
                    emitted.append(tok)
                    if tok == eos:
                        finished_reason = "stop"
                        break
                    if len(sec["output"]) >= sec["max_new_tokens"]:
                        finished_reason = "length"
                        break
                if emitted:
                    result[sec_rid] = emitted
                if finished_reason is None and primary_done:
                    finished_reason = preq.finish_reason if preq else "stop"
                if finished_reason is not None:
                    self.merged_finished[sec_rid] = GenerationResult(
                        request_id=sec_rid,
                        prompt_tokens=sec["prompt"],
                        output_tokens=sec["output"],
                        num_steps=len(sec["output"]),
                        elapsed_ms=(time.perf_counter() - sec["t0"]) * 1000,
                        finish_reason=finished_reason or "stop",
                    )
                    del self._merged_secondaries[sec_rid]
                    done_secs.append(sec_rid)
            for s in done_secs:
                if s in sec_rids:
                    sec_rids.remove(s)
            if primary_done:
                if sec_rids:
                    continue  # wait until all secondaries resolved
                del self._merge_primaries[phash]

    def _multistep_window(self, batch: ScheduledBatch) -> int:
        """How many decode steps to fuse into one dispatch.

        Stay responsive: fall back to single-step whenever new work is
        waiting for admission, and never overshoot the shortest remaining
        budget too far (row freezing bounds waste on device anyway)."""
        k = self.engine_config.multistep_decode
        if k <= 1:
            return 1
        mixed_cap = self.engine_config.multistep_mixed
        if (self.scheduler.num_pending > 0
                and len(self.scheduler.running)
                < self.scheduler.max_batch_size):
            # schedule() already admitted every admissible pending request,
            # so the remainder is blocked on slots/blocks. A short window
            # keeps the wait after a slot frees small; collapsing to 1 here
            # once destroyed throughput 5x when the batch sizer pinched one
            # request out of a saturated batch (k=1 for its whole lifetime).
            # When the batch is FULL, pending requests cannot admit until a
            # row finishes, so the collapse buys nothing and costs 4x the
            # per-window overhead for the whole sustained-load regime
            # (r5: 256-request bench ran 72% over its burst-regime
            # pro-rata before this gate).
            return max(1, min(k, mixed_cap)) if mixed_cap else 1
        if mixed_cap and any(s.is_prefill for s in batch.seqs):
            return max(1, min(k, mixed_cap))
        return k

    # -- pipelined multistep decode (window chaining) -----------------------

    def _chain_init_eligible(self, seqs, k: int) -> bool:
        """A window chain may start only when every row is a pure on-device
        decode row: no host sampling, no logits processors (stop sequences
        finish a request host-side while the device would keep generating —
        a frozen-row/live-row divergence the chain cannot see), and KV
        capacity for TWO windows (the in-flight one plus the next) is
        reservable up front so no mid-chain allocation can preempt."""
        if self.scheduler.num_pending > 0:
            return False
        for s in seqs:
            req = s.request
            rid = req.request_id
            if req.state != RequestState.RUNNING:
                return False
            p = self._params_by_rid.get(rid, SamplingParams())
            if self._needs_host(p, rid) or self._procs_by_rid.get(rid):
                return False
            if not self.scheduler.ensure_capacity(req, 2 * k + 2):
                return False
        return True

    def _build_decode_arrays(self, rows):
        """Flat decode-row arrays for the multistep window programs.

        The ONE place encoding the device program's input conventions
        (ctx_lens counts the current token, tokens_left floors at 1,
        block tables zero-pad) — shared by the chained and unchained
        dispatch paths so they cannot diverge."""
        b = len(rows)
        last_tokens = np.zeros(b, np.int64)
        positions = np.zeros(b, np.int32)
        ctx_lens = np.zeros(b, np.int32)
        slot_ids = np.zeros(b, np.int32)
        tokens_left = np.zeros(b, np.int32)
        max_blocks = max(len(s.request.kv_block_ids) for s in rows)
        block_tables = np.zeros((b, max(max_blocks, 1)), np.int32)
        params_list = []
        requests = []
        for i, s in enumerate(rows):
            req = s.request
            last_tokens[i] = s.token_ids[0]
            positions[i] = s.positions[0]
            ctx_lens[i] = int(s.positions[0]) + 1
            slot_ids[i] = self._assign_slot(req)
            tokens_left[i] = max(req.max_new_tokens - req.num_generated, 1)
            block_tables[i, : len(req.kv_block_ids)] = req.kv_block_ids
            params_list.append(
                self._params_by_rid.get(req.request_id, SamplingParams())
            )
            requests.append(req)
        features = SamplerFeatures.for_params(params_list)
        sample_args = make_param_arrays(params_list, requests)
        return (last_tokens, positions, block_tables, ctx_lens, slot_ids,
                tokens_left, sample_args, features, requests)

    def _dispatch_chain_window(self, seqs, k: int) -> None:
        """Dispatch the first window of a chain (no readback)."""
        (last_tokens, positions, block_tables, ctx_lens, slot_ids,
         tokens_left, sample_args, features, requests) = (
            self._build_decode_arrays(seqs))
        win = self.runner.dispatch_multi_decode(
            last_tokens, positions, block_tables, ctx_lens, slot_ids,
            tokens_left, sample_args, features, num_steps=k,
        )
        self._decode_chain = {"win": win, "reqs": requests}

    def _chain_can_continue(self, reqs, k: int) -> bool:
        """May the NEXT window dispatch before this one resolves?

        Conservative: any admission waiting on a free slot, any row no
        longer RUNNING (cancel), any expired deadline, or any capacity
        shortfall breaks the chain. Rows the host already knows are
        finished are frozen on device too (EOS and budget freezing are
        on-device), so block release for them is deferred until the chain
        ends — no reuse hazard.

        Pending work does NOT break a chain while the batch is full with
        no finished row: admission needs a free slot, and the chain breaks
        on its own the moment a resolve reveals one (at worst one window's
        dispatch-ahead later). Priority preemption is likewise delayed by
        at most one window — best-effort, as the scheduler documents."""
        if self.scheduler.num_pending > 0 and (
            len(self.scheduler.running) < self.scheduler.max_batch_size
            or any(req.is_finished for req in reqs)
        ):
            return False
        now = time.monotonic()
        for req in reqs:
            if req.state != RequestState.RUNNING:
                return False
            dl = self._deadlines.get(req.request_id)
            if dl is not None and now > dl:
                return False
        # someone must still have budget beyond the un-resolved window
        if not any(
            not req.is_finished
            and req.max_new_tokens - req.num_generated > k
            for req in reqs
        ):
            return False
        for req in reqs:
            if req.is_finished:
                continue
            if not self.scheduler.ensure_capacity(req, 2 * k + 2):
                return False
        return True

    def _chain_advance(self) -> Dict[int, List[int]]:
        """Dispatch window N+1 from window N's on-device carry (if the chain
        may continue), THEN resolve window N — the readback overlaps the new
        window's execution. Applies window N's tokens and returns them."""
        ch = self._decode_chain
        self._decode_chain = None
        win, reqs = ch["win"], ch["reqs"]
        k = win.num_steps
        nxt = None
        if self._chain_can_continue(reqs, k):
            mb = max(len(r.kv_block_ids) for r in reqs)
            bt = np.zeros((len(reqs), max(mb, 1)), np.int32)
            ctx = np.zeros(len(reqs), np.int32)
            for i, r in enumerate(reqs):
                bt[i, : len(r.kv_block_ids)] = r.kv_block_ids
                ctx[i] = r.total_tokens
            nxt = self.runner.resume_multi_decode(win, bt, ctx)
        emitted = self.runner.resolve_window(win)  # host sync

        result: Dict[int, List[int]] = {}
        for i, req in enumerate(reqs):
            if req.state != RequestState.RUNNING or req.is_finished:
                continue
            toks = [int(t) for t in emitted[:, i] if t >= 0]
            if not toks:
                continue
            n = self.scheduler.apply_decode_tokens(req, toks)
            if n:
                result[req.request_id] = toks[:n]
                self.total_tokens_generated += n
        if nxt is not None and any(
            req.state == RequestState.RUNNING and not req.is_finished
            for req in reqs
        ):
            self._decode_chain = {"win": nxt, "reqs": reqs}
        # else: an already-dispatched window with every row frozen just
        # discards its (empty) output — dropping the handle is enough
        return result

    def _run_multi_decode(self, seqs, k: int) -> Dict[int, List[int]]:
        return self._resolve_multi_decode(*self._dispatch_multi_decode(seqs, k))

    def _dispatch_multi_decode(self, seqs, k: int):
        """Enqueue one fused decode window WITHOUT resolving it.

        Returns (win, rows, fallback_rows); win is None when no row can
        ride the window (all host-sampled / capacity-blocked). Splitting
        dispatch from resolve lets a mixed step enqueue its windows BEFORE
        the prefill wave: the decode rows' tokens resolve after ~one window
        of device time instead of queueing behind the wave's ~130 ms, which
        was the serving ITL p99 under sustained load (r5: ~230 ms)."""
        rows = []
        fallback_rows = []
        for s in seqs:
            # host-sampled rows (logprobs/constraints) can't ride the fused
            # on-device window; the whole window's KV must also fit up front
            p = self._params_by_rid.get(s.request.request_id, SamplingParams())
            if self._needs_host(p, s.request.request_id):
                fallback_rows.append(s)
                self._step_mix["fb_host"] += 1
            elif self.scheduler.ensure_capacity(s.request, k + 1):
                rows.append(s)
            else:
                fallback_rows.append(s)
                self._step_mix["fb_capacity"] += 1
        if not rows:
            return None, [], seqs

        (last_tokens, positions, block_tables, ctx_lens, slot_ids,
         tokens_left, sample_args, features, requests) = (
            self._build_decode_arrays(rows))
        win = self.runner.dispatch_multi_decode(
            last_tokens, positions, block_tables, ctx_lens, slot_ids,
            tokens_left, sample_args, features, num_steps=k,
        )
        return win, rows, fallback_rows

    def _resolve_multi_decode(self, win, rows, fallback_rows):
        if win is None:
            return {
                rid: [tok]
                for rid, tok in self._run_group(
                    fallback_rows, kind="decode").items()
            }
        emitted = self.runner.resolve_window(win)  # (k, b)

        out: Dict[int, List[int]] = {}
        for i, s in enumerate(rows):
            toks = [int(t) for t in emitted[:, i] if t >= 0]
            out[s.request.request_id] = toks
            self._step_mix["window_tokens"] += len(toks)
        self._step_mix["window_fallback_rows"] += len(fallback_rows)

        if fallback_rows:
            single = self._run_group(fallback_rows, kind="decode")
            for rid, tok in single.items():
                out[rid] = [tok]
        return out

    def _speculative_step(self, seqs) -> Dict[int, List[int]]:
        """Draft K tokens per sequence, verify in one paged target pass,
        accept the matching prefix (ref: i64_engine.py:660-693).

        The verify pass writes candidate K/V through the paged cache; the
        accepted prefix's rows are exact and the first rejected slot is
        overwritten by the next ordinary decode step."""
        spec = self.speculative
        out: Dict[int, List[int]] = {}
        fallback = []
        for s in seqs:
            req = s.request
            params = self._params_by_rid.get(req.request_id, SamplingParams())
            # host-sampled / history-dependent rows use the normal path
            if (
                self._needs_host(params, req.request_id)
                or params.needs_token_history
                # verify writes K+1 positions; never past max_seq_len
                or req.total_tokens + spec.K + 1
                > self.engine_config.max_seq_len
                or not self.scheduler.ensure_capacity(req, spec.K + 2)
            ):
                fallback.append(s)
                continue
            context = np.concatenate([
                np.asarray(req.prompt_token_ids, np.int64),
                np.asarray(req.output_token_ids, np.int64),
            ])
            draft = spec.draft(context, rid=req.request_id)
            n = req.total_tokens
            verify_tokens = np.concatenate(
                [[context[-1]], draft]).astype(np.int64)[None, :]
            t = verify_tokens.shape[1]
            positions = np.arange(n - 1, n - 1 + t, dtype=np.int32)[None, :]
            bt = np.asarray(req.kv_block_ids, np.int32)[None, :]
            logits = self.runner.execute_verify(
                verify_tokens, positions, bt,
                np.array([n + spec.K], np.int32),
                np.ones((1, t), bool),
            )
            accepted, _ = spec.accept(
                draft, logits, params=params,
                past_tokens=list(context) if params.needs_token_history else None,
            )
            # clip to the request's remaining budget
            remaining = req.max_new_tokens - req.num_generated
            out[req.request_id] = accepted[:max(1, remaining)]
        if fallback:
            for rid, tok in self._run_group(fallback, kind="decode").items():
                out[rid] = [tok]
        return out

    def _check_stop_sequences(self, result: Dict[int, List[int]]) -> None:
        """After tokens are applied, finish any request whose output now ends
        with a stop sequence (truncation happens at result assembly,
        ref: i64_engine.py:1214-1224)."""
        for rid in result:
            procs = self._procs_by_rid.get(rid)
            if not procs:
                continue
            req = self.scheduler.get_request(rid)
            if req is None or req.state == RequestState.FINISHED:
                continue
            for proc in procs:
                if isinstance(proc, StopSequenceProcessor) and proc.check(
                    req.output_token_ids
                ):
                    req.state = RequestState.FINISHED
                    req.finish_reason = "stop"
                    break

    def _maybe_enable_fp8_kv(self) -> None:
        """Auto-upgrade the KV cache to fp8 at 70% block utilization —
        doubles effective capacity under pressure (ref: kv_cache.py:819-831)."""
        if (
            not self.engine_config.kv_fp8_auto
            or self.runner is None
            or self.runner.kv_k.dtype.itemsize == 1
        ):
            return
        if self.scheduler.blocks.usage() >= 0.7:
            logger.info("KV usage >= 70%% — converting cache to fp8 e4m3")
            self.runner.convert_kv_dtype("float8_e4m3fn")

    def _sweep_timeouts(self) -> None:
        if not self._deadlines:
            return
        now = time.monotonic()
        expired = [rid for rid, dl in self._deadlines.items() if now > dl]
        for rid in expired:
            req = self.scheduler.get_request(rid)
            if req is not None and req.state != RequestState.FINISHED:
                self.scheduler.cancel(rid)
                req.finish_reason = "timeout"
            self._release_request(rid)

    def _run_group(self, seqs, kind: str) -> Dict[int, int]:
        """Dispatch one group and synchronously resolve its tokens."""
        return self._resolve_group(self._dispatch_group(seqs, kind))

    def _dispatch_group(self, seqs, kind: str) -> "_PendingGroup":
        """Build padded arrays for one program kind and enqueue on device.

        Returns a pending handle holding *device* arrays; the caller resolves
        it with `_resolve_group`. Splitting dispatch from resolution lets one
        engine step enqueue every prefill/decode part back-to-back before any
        host round-trip — under a remote-dispatch link (this environment's
        ~40 ms tunnel) the parts then overlap instead of serializing."""
        ec = self.engine_config
        b = len(seqs)
        t = max(len(s.token_ids) for s in seqs)
        token_ids = np.zeros((b, t), np.int64)
        positions = np.zeros((b, t), np.int32)
        valid = np.zeros((b, t), bool)
        ctx_lens = np.zeros(b, np.int32)
        last_idx = np.zeros(b, np.int32)
        slot_ids = np.zeros(b, np.int32)
        sample_mask = np.zeros(b, bool)
        max_blocks = max(len(s.request.kv_block_ids) for s in seqs)
        block_tables = np.zeros((b, max(max_blocks, 1)), np.int32)

        # VLM: fill soft-token rows for any chunk overlapping stored
        # soft positions (absolute prompt positions)
        soft_embeds = soft_mask = None
        if self._soft_by_rid and kind == "prefill":
            for i, s in enumerate(seqs):
                entry = self._soft_by_rid.get(s.request.request_id)
                if entry is None:
                    continue
                emb, pos = entry
                lo, hi = int(s.positions[0]), int(s.positions[-1])
                sel = (pos >= lo) & (pos <= hi)
                if not sel.any():
                    continue
                if soft_embeds is None:
                    soft_embeds = np.zeros((b, t, emb.shape[1]), np.float32)
                    soft_mask = np.zeros((b, t), bool)
                cols = (pos[sel] - lo).astype(np.int64)
                soft_embeds[i, cols] = emb[sel]
                soft_mask[i, cols] = True

        params_list = []
        requests = []
        for i, s in enumerate(seqs):
            n = len(s.token_ids)
            token_ids[i, :n] = s.token_ids
            positions[i, :n] = s.positions
            valid[i, :n] = True
            # context visible to attention = tokens written through this step
            ctx_lens[i] = int(s.positions[-1]) + 1
            last_idx[i] = n - 1
            slot_ids[i] = self._assign_slot(s.request)
            sample_mask[i] = s.needs_sample
            bids = s.request.kv_block_ids
            block_tables[i, : len(bids)] = bids
            params_list.append(
                self._params_by_rid.get(s.request.request_id, SamplingParams())
            )
            requests.append(s.request)

        features = SamplerFeatures.for_params(params_list)
        need_host = [
            i for i, p in enumerate(params_list)
            if seqs[i].needs_sample
            and self._needs_host(p, seqs[i].request.request_id)
        ]
        sample_args = make_param_arrays(params_list, requests)

        tokens, logits = self.runner.execute(
            token_ids, positions, block_tables, ctx_lens, last_idx, valid,
            slot_ids, sample_mask, sample_args, features,
            return_logits=bool(need_host), kind=kind, defer=True,
            soft_embeds=soft_embeds, soft_mask=soft_mask,
        )
        return _PendingGroup(seqs, params_list, need_host, tokens, logits)

    def _split_prefill_parts(self, prefill: list, cap: int):
        """Yield prefill dispatch parts with BLOCK-ALIGNED rows grouped
        apart from unaligned ones: the runner's whole-block KV-write fast
        path is all-or-nothing per dispatch, so one unaligned tail row used
        to drop the entire group to the serialized row scatter. Aligned
        parts dispatch FIRST — a request's packed subrows are uniform-width
        except the tail, so only the (unaligned) tail can move later, which
        preserves the write-before-attend order of its earlier subrows."""
        bsz = self.engine_config.kv_block_size
        aligned, rest = [], []
        for s in prefill:
            n = len(s.token_ids)
            if (n % bsz == 0 and n >= bsz
                    and int(s.positions[0]) % bsz == 0):
                aligned.append(s)
            else:
                rest.append(s)
        # don't split a group that would have dispatched whole anyway —
        # two tiny parts cost an extra program execution for nothing
        if not aligned or not rest or len(prefill) <= cap and (
                len(aligned) < 2 or len(rest) < 2):
            yield from self._budget_split(prefill, cap)
            return
        yield from self._budget_split(aligned, cap)
        yield from self._budget_split(rest, cap)

    def _budget_split(self, rows: list, cap: int):
        """Chunk prefill rows into parts whose BUCKETED dispatch size
        (batch bucket x token bucket) stays within max_prefill_tokens.

        With batch buckets up to max_batch, one wave of short prompts packs
        into a single dispatch (64 x 128 = one program execution instead of
        eight — each dispatch costs fixed host/tunnel overhead), while a
        part is still split before a wide row would blow the padded token
        area past the scheduler's chunk budget. Row order is preserved, so
        a request's packed subrows never reorder across parts (their KV
        write-before-attend contract — see _pack_prefill_rows). Warmup
        prunes the program space by the same rule, so every part shape this
        produces is precompiled."""
        ecfg = self.engine_config
        budget = max(ecfg.max_prefill_tokens, ecfg.prefill_token_buckets[0])
        bb, tb = ecfg.prefill_batch_buckets, ecfg.prefill_token_buckets

        def bucket(v, buckets):
            for x in buckets:
                if v <= x:
                    return x
            return buckets[-1]

        cur, cur_t = [], 0
        for s in rows:
            t = bucket(len(s.token_ids), tb)
            grown_t = max(cur_t, t)
            grown_b = bucket(len(cur) + 1, bb)
            if cur and (len(cur) >= cap or grown_b * grown_t > budget):
                yield cur
                cur, cur_t = [s], t
            else:
                cur.append(s)
                cur_t = grown_t
        if cur:
            yield cur

    def _pack_prefill_rows(self, prefill: list) -> list:
        """Split prefill chunks into subrows of <= prefill_pack_tokens.

        True-varlen analog for the bucketed-row layout: one long prompt no
        longer pads every other row in its group to its length — rows
        become uniformly narrow and the batch dimension absorbs the
        variance. Correctness: each subrow carries its own positions and
        a per-row ctx_lens (= its last position + 1), so queries attend
        only through their own tokens; a request's subrows stay contiguous
        and ordered, so cross-group splits still write earlier tokens'
        KV before later rows attend (device programs execute in order).
        Only the final subrow of a sampling chunk samples."""
        tp = self.engine_config.prefill_pack_tokens
        if not tp or tp <= 0:
            return prefill
        # subrows must FILL a token bucket: a pack size below a bucket
        # boundary buckets up anyway and serves padding (longctx bench,
        # round 4: pack 256 under buckets (128, 512) made every long-prompt
        # dispatch 50% pad columns — 2x prefill compute). Round the pack
        # size up to the bucket it would land in.
        for b in self.engine_config.prefill_token_buckets:
            if b >= tp:
                tp = b
                break
        out = []
        for s in prefill:
            n = len(s.token_ids)
            if n <= tp:
                out.append(s)
                continue
            for i in range(0, n, tp):
                j = min(i + tp, n)
                out.append(ScheduledSeq(
                    request=s.request,
                    token_ids=s.token_ids[i:j],
                    positions=s.positions[i:j],
                    is_prefill=True,
                    needs_sample=s.needs_sample and j == n,
                ))
        return out

    def _finish_group(self, pending: "_PendingGroup") -> Dict[int, int]:
        """Resolve a dispatched group — or skip the host sync entirely when
        no row samples this step (mid-prompt prefill chunks).

        Chunked prefill steps don't depend on device RESULTS, only on the
        device-side KV writes, which program order guarantees. Skipping the
        readback lets consecutive chunk steps enqueue back-to-back through
        the dispatch link, so an N-chunk prompt pays ~1 round-trip instead
        of N (the cross-step analog of the split-group pipelining above).
        A small in-flight cap bounds the unresolved queue.
        """
        if any(s.needs_sample for s in pending.seqs):
            return self._resolve_group(pending)
        self._inflight_groups.append(pending)
        while len(self._inflight_groups) > 8:
            old = self._inflight_groups.pop(0)
            np.asarray(old.tokens)  # sync: program long since retired
        return {}

    def _finish_groups(self, pendings: list) -> Dict[int, int]:
        """Resolve many dispatched groups with ONE host sync.

        Each group resolve is a device sync, and through the remote tunnel
        a sync costs ~20-30 ms of fixed latency on top of device time — the
        r5 profile showed a 64-request burst admission paying 8 sequential
        group resolves (~45 ms each) inside one step. Concatenating the
        sampled-token arrays device-side (one cheap eager op) and fetching
        the result in one np.asarray collapses that to a single sync.
        Groups that need host-side logits keep their individual path."""
        result: Dict[int, int] = {}
        to_resolve = []
        for pg in pendings:
            if any(s.needs_sample for s in pg.seqs):
                to_resolve.append(pg)
            else:
                result.update(self._finish_group(pg))  # defers, no sync
        fused = [pg for pg in to_resolve if pg.logits is None]
        if len(fused) > 1:
            cat = np.asarray(jnp.concatenate(
                [jnp.asarray(pg.tokens) for pg in fused]))
            off = 0
            for pg in fused:
                n = int(pg.tokens.shape[0])
                result.update(
                    self._resolve_group(pg, tokens_np=cat[off:off + n]))
                off += n
        elif fused:
            result.update(self._resolve_group(fused[0]))
        for pg in to_resolve:
            if pg.logits is not None:
                result.update(self._resolve_group(pg))
        return result

    def _resolve_group(
        self, pending: "_PendingGroup", tokens_np: Optional[np.ndarray] = None
    ) -> Dict[int, int]:
        """Host-sync one dispatched group and assemble its sampled tokens."""
        b = len(pending.seqs)
        tokens = (np.asarray(pending.tokens)
                  if tokens_np is None else tokens_np)[:b]
        logits = (
            np.asarray(pending.logits)[:b]
            if pending.logits is not None
            else None
        )
        result: Dict[int, int] = {}
        for i, s in enumerate(pending.seqs):
            if not s.needs_sample:
                continue
            rid = s.request.request_id
            if i in pending.need_host:
                tok = self._sample_host_row(
                    logits[i], pending.params_list[i], s.request
                )
            else:
                tok = int(tokens[i])
            result[rid] = tok
        return result

    def _sample_host_row(
        self, logits: np.ndarray, params: SamplingParams, req: Request
    ) -> int:
        logits = np.asarray(logits, np.float32).copy()

        # constrained-decoding chain (JSON/regex/choice/suppress)
        procs = self._procs_by_rid.get(req.request_id)
        if procs:
            active = [p for p in procs if not isinstance(p, StopSequenceProcessor)]
            if active:
                logits = apply_logits_processors(
                    logits, active, req.output_token_ids
                ).astype(np.float32)

        # min_tokens: suppress EOS/stop ids until the floor is reached
        # (device path does this via eos_suppress; ref: sampling.py:393-398)
        if params.min_tokens > 0 and req.num_generated < params.min_tokens:
            v = logits.shape[-1]
            if 0 <= req.eos_token_id < v:
                logits[req.eos_token_id] = NEG_INF
            for tid in params.stop_token_ids or []:
                if 0 <= int(tid) < v:
                    logits[int(tid)] = NEG_INF

        past = None
        if params.needs_token_history:
            past = list(req.prompt_token_ids) + req.output_token_ids
        pre_filter = logits.astype(np.float64).copy()
        tok = sample_host(logits, params, past_tokens=past, rng=self._host_rng)
        if params.logprobs is not None:
            lp = compute_logprobs_host(pre_filter, tok, params.logprobs)
            self._logprobs_by_rid.setdefault(req.request_id, []).append(lp)
        return tok

    def _step_modelless(self, batch: ScheduledBatch) -> Dict[int, int]:
        """Random-logits engine for scheduler/API tests (ref :835-836)."""
        result = {}
        for s in batch.seqs:
            if not s.needs_sample:
                continue
            rid = s.request.request_id
            params = self._params_by_rid.get(rid, SamplingParams())
            logits = self._host_rng.standard_normal(
                self.model_config.vocab_size
            ).astype(np.float32)
            tok = self._sample_host_row(logits, params, s.request)
            result[rid] = tok
        return result

    # -- blocking generate (tests/bench; ref i64_engine.py:1157-1234) -----------

    def generate(
        self,
        prompt_token_ids,
        sampling_params: Optional[SamplingParams] = None,
        priority: int = 0,
    ) -> GenerationResult:
        rid = self.add_request(prompt_token_ids, sampling_params, priority)
        return self.wait_for(rid)

    def generate_beam(
        self,
        prompt_token_ids,
        sampling_params: Optional[SamplingParams] = None,
    ) -> GenerationResult:
        """Beam-search generation (num_beams > 1, ref: sampling.py:622-757).

        Runs cache-free full forwards over the beam batch — beams are a
        quality tool, not a throughput path, so they bypass the paged engine.
        """
        params = sampling_params or SamplingParams(num_beams=4)
        prompt = [int(t) for t in prompt_token_ids]
        eos = self.model_config.eos_token_id
        searcher = BeamSearcher(
            num_beams=max(2, params.num_beams),
            max_length=len(prompt) + params.max_tokens,
            length_penalty=params.length_penalty,
            eos_token_id=eos,
        )
        searcher.init_beams(prompt)
        t0 = time.perf_counter()
        steps = 0
        from ..models import complexity_deep as cdm

        import jax.numpy as jnp

        while not searcher.is_done and steps < params.max_tokens:
            seqs = [b.token_ids for b in searcher.beams]
            t = max(len(s) for s in seqs)
            batch = np.zeros((len(seqs), t), np.int32)
            seq_lens = np.zeros(len(seqs), np.int32)
            for i, s in enumerate(seqs):
                batch[i, : len(s)] = s
                seq_lens[i] = len(s)
            if self.runner is not None:
                # only last-position logits are needed — materializing the
                # full (B, T, V) fp32 logits tensor is 100x more HBM traffic
                b_ids = jnp.asarray(batch)
                hidden, _ = cdm.forward_hidden(
                    self.runner.params, self.model_config, b_ids,
                    jnp.broadcast_to(
                        jnp.arange(t, dtype=jnp.int32)[None], batch.shape),
                    seq_lens=jnp.asarray(seq_lens),
                )
                last = jnp.take_along_axis(
                    hidden, jnp.asarray(seq_lens - 1)[:, None, None], axis=1
                )[:, 0]
                logits = np.asarray(
                    cdm.lm_logits(self.runner.params, self.model_config, last))
            else:
                logits = self._host_rng.standard_normal(
                    (len(seqs), self.model_config.vocab_size)
                ).astype(np.float32)
            searcher.step(logits)
            steps += 1

        best = searcher.get_best()
        out = best.token_ids[len(prompt):]
        finish = "stop" if (out and out[-1] == eos) else "length"
        return GenerationResult(
            request_id=-1,
            prompt_tokens=prompt,
            output_tokens=out,
            num_steps=steps,
            elapsed_ms=(time.perf_counter() - t0) * 1000,
            finish_reason=finish,
        )

    def wait_for(self, rid: int, max_steps: int = 100000) -> GenerationResult:
        t0 = time.perf_counter()
        steps = 0
        req = self.scheduler.get_request(rid)
        while steps < max_steps:
            if req is not None and req.state == RequestState.FINISHED:
                break
            if req is None and rid in self.merged_finished:
                return self.merged_finished.pop(rid)
            self.step()
            steps += 1
            # also release finished requests' slots
            for f in self.scheduler.finished:
                if f.request_id in self._slot_by_rid:
                    self._release_request(f.request_id)
        if req is None:
            if rid in self.merged_finished:
                return self.merged_finished.pop(rid)
            raise KeyError(f"unknown request {rid}")
        return self._result_for(req, steps, (time.perf_counter() - t0) * 1000)

    def _result_for(self, req: Request, steps: int, elapsed_ms: float) -> GenerationResult:
        rid = req.request_id
        out = list(req.output_token_ids)
        finish = req.finish_reason or (
            "stop" if out and out[-1] == req.eos_token_id else "length"
        )
        logprobs = self._logprobs_by_rid.pop(rid, None)

        # truncate stop-sequence tokens from the output
        # (ref: i64_engine.py:1214-1224)
        for proc in self._procs_by_rid.pop(rid, []):
            if isinstance(proc, StopSequenceProcessor) and proc.should_stop:
                idx = proc.stop_index
                if 0 <= idx < len(out):
                    out = out[:idx]
                    if logprobs:
                        logprobs = logprobs[:idx]
                break

        result = GenerationResult(
            request_id=rid,
            prompt_tokens=list(req.prompt_token_ids),
            output_tokens=out,
            num_steps=steps,
            elapsed_ms=elapsed_ms,
            finish_reason=finish,
            logprobs=logprobs,
        )
        self._purge_request(rid)
        return result

    # -- vision (VLM) -------------------------------------------------------------

    def enable_vision(self, vision_params, vision_config) -> None:
        self.vision_params = vision_params
        self.vision_config = vision_config

    def encode_images(self, images: np.ndarray) -> np.ndarray:
        """Preprocess + encode images into LLM-space soft tokens
        (N, num_patches, llm_hidden). Requires enable_vision()."""
        if self.vision_params is None:
            raise RuntimeError("vision encoder not enabled")
        from ..models.vision import preprocess_images, vision_encode

        pixels = preprocess_images(images, self.vision_config.image_size)
        import jax.numpy as jnp

        out = vision_encode(self.vision_params, self.vision_config,
                            jnp.asarray(pixels))
        return np.asarray(out)

    # -- LoRA (ref: i64_engine.py:402-454) ---------------------------------------

    def enable_lora(self, max_adapters: int = 8):
        if self.runner is None:
            raise RuntimeError("LoRA requires a loaded model")
        if self.lora_manager is None:
            from ..core.lora import LoRAManager

            self.lora_manager = LoRAManager(self, max_adapters=max_adapters)
        return self.lora_manager

    def load_lora_adapter(self, name: str, path: str) -> int:
        return self.enable_lora().load_adapter(name, path)

    def set_active_lora(self, name: Optional[str]) -> None:
        self.enable_lora().set_active(name)

    def embed(self, prompt_token_ids) -> np.ndarray:
        """Mean-pooled, L2-normalized final hidden states
        (ref: i64_engine.py:456-479). Model-less engines return a
        deterministic hash-seeded vector so API tests run without weights."""
        ids = np.asarray(prompt_token_ids, dtype=np.int64)
        if self.runner is None:
            seed = int(hashlib.md5(ids.tobytes()).hexdigest()[:8], 16)
            vec = np.random.default_rng(seed).standard_normal(
                self.model_config.hidden_size)
        else:
            import jax.numpy as jnp

            from ..models import complexity_deep as cdm

            tokens = jnp.asarray(ids[None, :], jnp.int32)
            t = tokens.shape[1]
            positions = jnp.arange(t, dtype=jnp.int32)[None, :]
            hidden, _ = cdm.forward_hidden(
                self.runner.params, self.model_config, tokens, positions,
                seq_lens=jnp.full((1,), t, jnp.int32),
            )
            vec = np.asarray(hidden[0], np.float64).mean(axis=0)
        norm = np.linalg.norm(vec)
        return (vec / norm if norm > 0 else vec).astype(np.float32)

    # -- stats -------------------------------------------------------------------

    def get_stats(self) -> dict:
        s = self.scheduler.get_stats()
        total = max(self._perf["total_ms"], 1e-9)
        s["perf"] = {
            **self._perf,
            "forward_pct": 100.0 * self._perf["forward_ms"] / total,
            "avg_step_ms": total / max(self.total_steps, 1),
            "tokens_per_s": 1000.0 * self.total_tokens_generated / total,
        }
        s["total_tokens_generated"] = self.total_tokens_generated
        s["step_mix"] = dict(self._step_mix)
        if self.runner is not None:
            s["kv_cache_bytes"] = self.runner.kv_cache_memory_bytes()
        return s
