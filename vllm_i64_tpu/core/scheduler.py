"""Integer-only continuous-batching scheduler.

Re-implementation of the reference scheduler semantics
(ref: vllm_i64/engine/i64_scheduler.py) — every scheduling decision is an
integer operation; no float anywhere:

- priority heap pending queue (priority, arrival_step, request_id)  (:199-254)
- continuous batching mixing prefill chunks and decodes             (:345-503)
- chunked prefill under a token budget                              (:437-458)
- preemption of low-priority requests with save/restore of partial
  generation, re-admitted with a priority boost                     (:300-343, :404-414)
- integer KV block allocator with O(1) free-list ops                (:275-291)
- post-step block growth with preempt-on-OOM                        (:505-546)

Deviations from the reference (deliberate):
- block id 0 is reserved as the null block (scatter target for padding
  tokens on device; ref block_pool.py:190-192 reserves it too).
- mid-prefill chunks do NOT append a sampled token to the output (the
  reference appends one per step even before prefill completes,
  i64_scheduler.py:505-523 — a correctness bug for prompts longer than the
  prefill budget). Here ``update_after_step`` only consumes tokens for rows
  whose prefill completed, and ``schedule`` reports which rows need sampling.
"""

from __future__ import annotations

import heapq
import logging
from collections import deque
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from .block_pool import BlockPool

logger = logging.getLogger("vllm_i64_tpu.scheduler")


class RequestState(IntEnum):
    PENDING = 0
    RUNNING = 1
    PREEMPTED = 2
    FINISHED = 3


@dataclass(eq=False)  # identity semantics: ndarray fields break value eq
class Request:
    """One inference request — all fields integer or integer arrays."""

    request_id: int
    prompt_token_ids: np.ndarray  # (prompt_len,) i64
    max_new_tokens: int
    state: RequestState = RequestState.PENDING
    priority: int = 0  # lower = more urgent
    arrival_step: int = 0
    eos_token_id: int = 0

    output_token_ids: List[int] = field(default_factory=list)
    kv_block_ids: List[int] = field(default_factory=list)
    prefill_done: int = 0  # tokens already written to KV by prefill chunks
    # restored output tokens that must ALSO be re-prefilled after a
    # preemption (prefill target = prompt + restore_extra)
    restore_extra: int = 0
    cached_prefix_len: int = 0  # tokens satisfied by prefix cache at admission

    # preemption save slots
    _saved: Optional[Tuple[List[int], int]] = field(default=None, repr=False)
    # KV swap save slot: (handle, nblocks, prefill_done, restore_extra,
    # cached_prefix_len) — set when the victim's blocks were swapped to host
    # instead of discarded (ref: kv_cache.py:711-813)
    _swapped: Optional[tuple] = field(default=None, repr=False)

    # per-tenant prefix-cache namespace (sha256[:16] of api key)
    cache_namespace: Optional[bytes] = field(default=None, repr=False)
    prefix_registered: bool = field(default=False, repr=False)

    finish_reason: Optional[str] = None

    @property
    def num_prompt_tokens(self) -> int:
        return int(len(self.prompt_token_ids))

    @property
    def num_generated(self) -> int:
        return len(self.output_token_ids)

    @property
    def total_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_generated

    @property
    def prefill_complete(self) -> bool:
        # a restored request must re-prefill its saved output tokens too —
        # comparing against the prompt alone would switch to decode with
        # KV missing for positions prompt..prompt+restore_extra-1
        return self.prefill_done >= self.num_prompt_tokens + self.restore_extra

    @property
    def is_finished(self) -> bool:
        if self.state == RequestState.FINISHED:
            return True
        if self.num_generated >= self.max_new_tokens:
            return True
        return bool(
            self.output_token_ids and self.output_token_ids[-1] == self.eos_token_id
        )

    def last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return int(self.prompt_token_ids[-1])


@dataclass
class ScheduledSeq:
    """One row of a scheduled batch."""

    request: Request
    token_ids: np.ndarray  # (n,) i64 tokens to feed this step
    positions: np.ndarray  # (n,) i32
    is_prefill: bool
    needs_sample: bool  # last logits of this row produce a token


@dataclass
class ScheduledBatch:
    seqs: List[ScheduledSeq]
    step: int

    @property
    def num_seqs(self) -> int:
        return len(self.seqs)

    @property
    def total_tokens(self) -> int:
        return sum(len(s.token_ids) for s in self.seqs)

    @property
    def decode_seqs(self) -> List[ScheduledSeq]:
        return [s for s in self.seqs if len(s.token_ids) == 1 and not s.is_prefill]

    @property
    def prefill_seqs(self) -> List[ScheduledSeq]:
        return [s for s in self.seqs if s.is_prefill or len(s.token_ids) > 1]


class Scheduler:
    """Continuous-batching scheduler over integer state."""

    def __init__(
        self,
        max_batch_size: int = 32,
        max_seq_len: int = 2048,
        kv_block_size: int = 16,
        max_kv_blocks: int = 4096,
        max_prefill_tokens: int = 512,
        max_chunk_tokens: int = 0,
        enable_preemption: bool = True,
        enable_prefix_caching: bool = True,
        kv_swap=None,
    ):
        self.max_batch_size = max_batch_size
        self.max_seq_len = max_seq_len
        self.kv_block_size = kv_block_size
        self.max_prefill_tokens = max_prefill_tokens
        # per-SEQUENCE prefill chunk cap (a row must fit the widest compiled
        # token bucket); 0 = same as the per-step total budget. Splitting the
        # two lets one dispatch carry many whole prompts (16 x 128 rows) while
        # long prompts still chunk at the bucket width.
        self.max_chunk_tokens = max_chunk_tokens or max_prefill_tokens
        self.enable_preemption = enable_preemption
        # Optional KV swap store (ref: kv_cache.py enable_swap/swap_out/
        # swap_in :711-813): an object with swap_out(block_ids)->handle|None,
        # swap_in(handle, target_block_ids), discard(handle). When set,
        # preemption saves the victim's KV to host instead of discarding it,
        # and re-admission restores the blocks verbatim — no re-prefill.
        self.kv_swap = kv_swap

        from .native import make_block_pool

        # C++ pool when the toolchain allows; Python BlockPool otherwise
        self.blocks = make_block_pool(
            max_kv_blocks, kv_block_size, enable_caching=enable_prefix_caching
        )

        self._pending: List[Tuple[int, int, int, Request]] = []
        # count of heap entries whose request is still PENDING — the heap
        # keeps stale (cancelled/admitted) entries for lazy removal, and
        # num_pending is polled per admission iteration and per has_work
        # check, so an O(heap) scan made scheduling O(pending^2) under
        # backlog
        self._pending_count = 0
        self.running: List[Request] = []
        self.finished: List[Request] = []

        self._next_id = 0
        self.step_counter = 0
        # KV-pressure observability: preemptions are the leading indicator
        # of an undersized block pool (ref i64_scheduler.py preempt path)
        self.num_preemptions = 0
        self._requests: Dict[int, Request] = {}

    # -- queue ops ---------------------------------------------------------

    def add_request(
        self,
        prompt_token_ids: np.ndarray,
        max_new_tokens: int = 256,
        priority: int = 0,
        eos_token_id: int = 0,
        cache_namespace: Optional[bytes] = None,
        request_id: Optional[int] = None,
    ) -> int:
        rid = self._next_id if request_id is None else request_id
        self._next_id = max(self._next_id, rid) + 1
        req = Request(
            request_id=rid,
            prompt_token_ids=np.asarray(prompt_token_ids, dtype=np.int64),
            max_new_tokens=int(max_new_tokens),
            priority=int(priority),
            arrival_step=self.step_counter,
            eos_token_id=int(eos_token_id),
            cache_namespace=cache_namespace,
        )
        self._requests[rid] = req
        heapq.heappush(self._pending, (req.priority, req.arrival_step, rid, req))
        self._pending_count += 1
        return rid

    def add_prefilled_request(
        self,
        prompt_token_ids: np.ndarray,
        first_token: int,
        max_new_tokens: int = 256,
        priority: int = 0,
        eos_token_id: int = 0,
        request_id: Optional[int] = None,
    ) -> Optional[int]:
        """Admit a request whose prompt KV was computed elsewhere
        (disaggregated prefill, ref: disaggregated.py:571-610): enters
        RUNNING with prefill complete and the first sampled token applied.
        The caller must then populate the allocated KV blocks.
        Returns the request id, or None if no KV blocks are available."""
        prompt = np.asarray(prompt_token_ids, dtype=np.int64)
        total = len(prompt) + 1  # + first decode token's KV next step
        nblocks = -(-total // self.kv_block_size)
        blocks = self.blocks.allocate(nblocks)
        if blocks is None and self._preempt_for(nblocks, priority):
            blocks = self.blocks.allocate(nblocks)
        if blocks is None:
            return None
        rid = self._next_id if request_id is None else request_id
        self._next_id = max(self._next_id, rid) + 1
        req = Request(
            request_id=rid,
            prompt_token_ids=prompt,
            max_new_tokens=int(max_new_tokens),
            state=RequestState.RUNNING,
            priority=int(priority),
            arrival_step=self.step_counter,
            eos_token_id=int(eos_token_id),
        )
        req.kv_block_ids = blocks
        req.prefill_done = len(prompt)
        req.output_token_ids = [int(first_token)]
        self._requests[rid] = req
        self.running.append(req)
        return rid

    def get_request(self, rid: int) -> Optional[Request]:
        return self._requests.get(rid)

    def cancel(self, rid: int) -> bool:
        req = self._requests.get(rid)
        if req is None or req.state == RequestState.FINISHED:
            return False
        if req.state == RequestState.RUNNING and req in self.running:
            self.running.remove(req)
            self.blocks.free(req.kv_block_ids)
            req.kv_block_ids = []
        elif req.state == RequestState.PENDING:
            # heap entry stays for lazy removal; account for it now
            self._pending_count -= 1
        if req._swapped is not None and self.kv_swap is not None:
            self.kv_swap.discard(req._swapped[0])
            req._swapped = None
        req.state = RequestState.FINISHED
        req.finish_reason = "cancelled"
        self.finished.append(req)
        return True

    def _pop_pending(self) -> Optional[Request]:
        while self._pending:
            _, _, _, req = heapq.heappop(self._pending)
            if req.state == RequestState.PENDING:
                self._pending_count -= 1
                return req
        return None

    def _peek_pending(self) -> Optional[Request]:
        while self._pending:
            _, _, _, req = self._pending[0]
            if req.state == RequestState.PENDING:
                return req
            heapq.heappop(self._pending)
        return None

    def _remove_pending(self, req: Request) -> None:
        """Remove a specific request from the pending heap.

        Admission must NOT pop the heap top: _preempt_for pushes boosted
        (priority -1) victims mid-admission, so the top may no longer be the
        request being admitted — popping blindly dropped the victim on the
        floor, starving it forever (it stayed PENDING but queue-less)."""
        for i, entry in enumerate(self._pending):
            if entry[2] == req.request_id:
                self._pending[i] = self._pending[-1]
                self._pending.pop()
                heapq.heapify(self._pending)
                if req.state == RequestState.PENDING:
                    self._pending_count -= 1
                return

    @property
    def num_pending(self) -> int:
        return self._pending_count

    @property
    def has_work(self) -> bool:
        return bool(self.running) or self.num_pending > 0

    # -- preemption ---------------------------------------------------------

    def _preempt_for(self, blocks_needed: int, requester_priority: int) -> bool:
        """Evict lowest-priority running requests until enough blocks free.

        Partial generation is saved on the request and restored when it is
        re-admitted (ref: i64_scheduler.py:300-343).
        """
        if not self.enable_preemption or not self.running:
            return False
        victims = sorted(
            self.running, key=lambda r: (-r.priority, -len(r.kv_block_ids))
        )
        # measure actual availability: shared prefix blocks (ref > 1) do not
        # free when a victim releases them, and already-free blocks count
        # toward the goal without preempting anyone
        for victim in victims:
            if self.blocks.num_free >= blocks_needed:
                break
            # never preempt equal-or-higher-priority work
            if victim.priority <= requester_priority:
                continue
            victim.state = RequestState.PREEMPTED
            victim._saved = (list(victim.output_token_ids), victim.prefill_done)
            # swap-instead-of-discard: save the victim's KV block contents
            # on the host so re-admission restores them verbatim (no
            # re-prefill). swap_out returns None when over its memory
            # budget — then fall back to preempt-and-recompute.
            if self.kv_swap is not None and victim.kv_block_ids:
                handle = self.kv_swap.swap_out(victim.kv_block_ids)
                if handle is not None:
                    victim._swapped = (
                        handle,
                        len(victim.kv_block_ids),
                        victim.prefill_done,
                        victim.restore_extra,
                        victim.cached_prefix_len,
                    )
            self.blocks.free(victim.kv_block_ids)
            victim.kv_block_ids = []
            victim.output_token_ids = []
            victim.prefill_done = 0
            victim.restore_extra = 0
            victim.cached_prefix_len = 0
            self.running.remove(victim)
            # re-admit with a priority boost so it isn't starved
            victim.priority = min(victim.priority, -1)
            victim.state = RequestState.PENDING
            heapq.heappush(
                self._pending,
                (victim.priority, victim.arrival_step, victim.request_id, victim),
            )
            self._pending_count += 1
            self.num_preemptions += 1
            logger.info(
                "preempted request %d (saved %d generated tokens)",
                victim.request_id,
                len(victim._saved[0]),
            )
        return self.blocks.num_free >= blocks_needed

    # -- prefix caching -------------------------------------------------------

    def _match_prefix(self, req: Request) -> Tuple[List[int], int]:
        """Walk the chained block hashes of the prompt and claim every
        consecutive cache hit. At least one prompt token is always
        recomputed so the final chunk produces logits to sample from."""
        if not self.blocks.enable_caching:
            return [], 0
        prompt = req.prompt_token_ids
        bs = self.kv_block_size
        max_reusable = (len(prompt) - 1) // bs
        prev: Optional[bytes] = None
        hits: List[int] = []
        for b in range(max_reusable):
            h = BlockPool.hash_block(
                prompt[b * bs : (b + 1) * bs], prev, req.cache_namespace
            )
            bid = self.blocks.get_cached(h)
            if bid is None:
                break
            hits.append(bid)
            prev = h
        if hits:
            self.blocks.touch(hits)
        return hits, len(hits) * bs

    def _register_prefix(self, req: Request) -> None:
        """Register the prompt's full KV blocks in the prefix cache once the
        prompt is computed and the first token sampled
        (ref: register_prefix_blocks, kv_cache.py:636-661)."""
        if req.prefix_registered or not self.blocks.enable_caching:
            return
        if not req.prefill_complete or req.num_generated < 1:
            return
        req.prefix_registered = True
        prompt = req.prompt_token_ids
        bs = self.kv_block_size
        prev: Optional[bytes] = None
        for b in range(len(prompt) // bs):
            h = BlockPool.hash_block(
                prompt[b * bs : (b + 1) * bs], prev, req.cache_namespace
            )
            self.blocks.cache(req.kv_block_ids[b], h)
            prev = h

    # -- main scheduling ----------------------------------------------------

    def schedule(self) -> Optional[ScheduledBatch]:
        self.step_counter += 1

        # sweep finished
        still = []
        for req in self.running:
            if req.is_finished:
                req.state = RequestState.FINISHED
                if req.finish_reason is None:
                    req.finish_reason = (
                        "stop"
                        if req.output_token_ids
                        and req.output_token_ids[-1] == req.eos_token_id
                        else "length"
                    )
                self.blocks.free(req.kv_block_ids)
                self.finished.append(req)
            else:
                still.append(req)
        self.running = still

        # admission (with prefix-cache reuse, ref: kv_cache.py:590-634 +
        # prefill skip at i64_engine.py:556-570)
        while self.num_pending > 0 and len(self.running) < self.max_batch_size:
            req = self._peek_pending()
            if req is None:
                break
            tokens_needed = req.num_prompt_tokens
            if req._saved is not None:
                tokens_needed += len(req._saved[0])

            reused_blocks: List[int] = []
            reused_tokens = 0
            if req._saved is None and req.num_generated == 0:
                reused_blocks, reused_tokens = self._match_prefix(req)

            nblocks = -(-tokens_needed // self.kv_block_size) - len(reused_blocks)
            if req._swapped is not None:
                # swapped restore needs exactly the block count it held at
                # preemption (which already includes decode growth headroom)
                nblocks = req._swapped[1]
                reused_blocks, reused_tokens = [], 0
            blocks = self.blocks.allocate(nblocks)
            if blocks is None and self._preempt_for(nblocks, req.priority):
                blocks = self.blocks.allocate(nblocks)
            if blocks is None:
                if reused_blocks:
                    self.blocks.free(reused_blocks)  # undo the touch
                break
            self._remove_pending(req)
            req.kv_block_ids = reused_blocks + blocks
            req.state = RequestState.RUNNING
            if req._swapped is not None:
                # restore the swapped KV verbatim into the new physical
                # blocks; scheduler state resumes exactly where it left off
                # (block table ids are rebuilt from kv_block_ids each step,
                # so the physical relocation is invisible to the device
                # program). No re-prefill happens.
                handle, _, prefill_done, restore_extra, cached = req._swapped
                self.kv_swap.swap_in(handle, blocks)
                saved_out, _ = req._saved
                req.output_token_ids = saved_out
                req.prefill_done = prefill_done
                req.restore_extra = restore_extra
                req.cached_prefix_len = cached
                req._swapped = None
                req._saved = None
            elif req._saved is not None:
                saved_out, saved_prefill = req._saved
                req.output_token_ids = saved_out
                req.prefill_done = 0  # KV gone — must re-prefill prompt (+ saved out)
                req.restore_extra = len(saved_out)
                req._saved = None
            else:
                # cached prefix tokens skip chunked prefill entirely
                req.prefill_done = reused_tokens
                req.cached_prefix_len = reused_tokens
            self.running.append(req)

        if not self.running:
            return None

        # batch build with chunked-prefill token budget
        budget = self.max_prefill_tokens
        seqs: List[ScheduledSeq] = []
        for req in self.running:
            if not req.prefill_complete:
                # tokens to (re-)prefill: prompt plus restored output tokens
                full = list(req.prompt_token_ids) + req.output_token_ids
                remaining = len(full) - req.prefill_done
                chunk = min(remaining, self.max_chunk_tokens, max(budget, 0))
                if chunk <= 0:
                    continue  # out of budget this step; prefill next step
                start = req.prefill_done
                toks = np.asarray(full[start : start + chunk], dtype=np.int64)
                pos = np.arange(start, start + chunk, dtype=np.int32)
                budget -= chunk
                final_chunk = start + chunk >= len(full)
                seqs.append(
                    ScheduledSeq(
                        request=req,
                        token_ids=toks,
                        positions=pos,
                        is_prefill=True,
                        needs_sample=final_chunk,
                    )
                )
            else:
                toks = np.array([req.last_token_id()], dtype=np.int64)
                pos = np.array([req.total_tokens - 1], dtype=np.int32)
                seqs.append(
                    ScheduledSeq(
                        request=req,
                        token_ids=toks,
                        positions=pos,
                        is_prefill=False,
                        needs_sample=True,
                    )
                )

        if not seqs:
            return None
        return ScheduledBatch(seqs=seqs, step=self.step_counter)

    def update_after_step(
        self, batch: ScheduledBatch, new_tokens: Dict[int, int]
    ) -> None:
        """Advance prefill progress; append sampled tokens; grow KV blocks.

        Two phases: ALL sampled tokens are applied before any block growth.
        _grow_blocks can preempt a lower-priority peer of the SAME batch;
        if that peer's token had not been appended yet, its preemption
        snapshot would miss a token the engine already streamed to the
        client, and the restored request would re-sample that position
        (streamed text and final output diverge)."""
        sampled = []
        for seq in batch.seqs:
            req = seq.request
            if req.state != RequestState.RUNNING:
                continue
            if seq.is_prefill:
                req.prefill_done += len(seq.token_ids)
            if seq.needs_sample and req.request_id in new_tokens:
                req.output_token_ids.append(int(new_tokens[req.request_id]))
                self._register_prefix(req)
                sampled.append(req)
        for req in sampled:
            # preempted by an earlier row's growth: token is in the saved
            # snapshot, KV is gone — nothing to grow
            if req.state != RequestState.RUNNING:
                continue
            # one decoded token also lives in KV next step; ensure capacity
            self._grow_blocks(req)

    @property
    def _max_blocks_per_seq(self) -> int:
        return -(-self.max_seq_len // self.kv_block_size)

    def ensure_capacity(self, req: Request, extra_tokens: int) -> bool:
        """Pre-allocate KV blocks to hold total_tokens + extra_tokens
        (multi-step decode reserves its whole window up front). The block
        table never grows past max_seq_len's worth — positions are bounded
        by the admission-time prompt+max_tokens <= max_seq_len check."""
        needed = -(-(req.total_tokens + extra_tokens) // self.kv_block_size)
        needed = min(needed, self._max_blocks_per_seq)
        deficit = needed - len(req.kv_block_ids)
        if deficit <= 0:
            return True
        new = self.blocks.allocate(deficit)
        if new is None:
            return False
        req.kv_block_ids.extend(new)
        return True

    def apply_decode_tokens(self, req: Request, tokens) -> int:
        """Append a multi-step window of sampled tokens; stop at finish.
        Returns how many were accepted."""
        accepted = 0
        for tok in tokens:
            if req.is_finished:
                break
            req.output_token_ids.append(int(tok))
            accepted += 1
        if accepted:
            self._register_prefix(req)
        self._grow_blocks(req)
        return accepted

    def _grow_blocks(self, req: Request) -> None:
        # +1: the next decode step writes K/V at position total_tokens
        needed = -(-(req.total_tokens + 1) // self.kv_block_size)
        needed = min(needed, self._max_blocks_per_seq)
        deficit = needed - len(req.kv_block_ids)
        if deficit <= 0:
            return
        new = self.blocks.allocate(deficit)
        if new is None and self._preempt_for(deficit, req.priority):
            new = self.blocks.allocate(deficit)
        if new is None:
            logger.warning(
                "KV OOM for request %d — finishing early", req.request_id
            )
            req.state = RequestState.FINISHED
            req.finish_reason = "kv_oom"
            return
        req.kv_block_ids.extend(new)

    def get_stats(self) -> Dict[str, int]:
        return {
            "pending": self.num_pending,
            "running": len(self.running),
            "finished": len(self.finished),
            "free_kv_blocks": self.blocks.num_free,
            "total_steps": self.step_counter,
            "preemptions": self.num_preemptions,
        }
