"""Host-memory KV swap store for preemption.

TPU-native analog of the reference's pinned-CPU-memory KV swap
(ref: vllm_i64/core/kv_cache.py enable_swap/swap_out/swap_in :711-813):
when the scheduler preempts a victim for KV blocks, its block contents are
copied to host numpy arrays and restored verbatim into (possibly different)
physical blocks at re-admission — the restored request resumes decoding
immediately instead of re-prefilling its prompt + partial generation.

The reference pins swap memory and lets the engine decide swap-vs-evict
(i64_engine.py:822-828); here the policy is a byte budget: ``swap_out``
returns None once the store would exceed ``max_bytes`` and the scheduler
falls back to preempt-and-recompute for that victim.
"""

from __future__ import annotations

from typing import Dict, Optional


def _handle_bytes(handle: Dict[int, tuple]) -> int:
    return sum(k.nbytes + v.nbytes for k, v in handle.values())


class RunnerKVSwap:
    """Scheduler-facing swap store backed by a ModelRunner's paged cache.

    Protocol consumed by core.scheduler.Scheduler:
      swap_out(block_ids) -> handle | None   (None = over budget, recompute)
      swap_in(handle, target_block_ids)      (restore + release budget)
      discard(handle)                        (cancelled request; release)
    """

    def __init__(self, runner, max_bytes: int):
        self.runner = runner
        self.max_bytes = int(max_bytes)
        self.used_bytes = 0
        self.swap_outs = 0
        self.swap_ins = 0
        self.rejected = 0

    def _block_bytes(self) -> int:
        # per-block bytes across all layers, K and V
        k = self.runner.kv_k  # (L, NB, bs, HD) flat pages
        per_layer = k.shape[2] * k.shape[3] * k.dtype.itemsize
        return 2 * k.shape[0] * per_layer

    def swap_out(self, block_ids) -> Optional[Dict[int, tuple]]:
        need = len(block_ids) * self._block_bytes()
        if self.used_bytes + need > self.max_bytes:
            self.rejected += 1
            return None
        handle = self.runner.swap_out_blocks(block_ids)
        self.used_bytes += _handle_bytes(handle)
        self.swap_outs += 1
        return handle

    def swap_in(self, handle: Dict[int, tuple], target_block_ids) -> None:
        self.runner.swap_in_blocks(handle, target_block_ids)
        self.used_bytes -= _handle_bytes(handle)
        self.swap_ins += 1

    def discard(self, handle: Dict[int, tuple]) -> None:
        self.used_bytes -= _handle_bytes(handle)

    def get_stats(self) -> dict:
        return {
            "used_bytes": self.used_bytes,
            "max_bytes": self.max_bytes,
            "swap_outs": self.swap_outs,
            "swap_ins": self.swap_ins,
            "rejected": self.rejected,
        }
