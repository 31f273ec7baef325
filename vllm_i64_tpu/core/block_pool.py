"""Integer block pool with prefix caching and LRU eviction.

Behavioral spec is the reference's pool (ref: vllm_i64/core/block_pool.py:
ref-counted blocks, O(1) LRU free queue, chained SHA-256 block hashes with
per-tenant namespace salt, null block 0 reserved, hash eviction on realloc).

Implementation is integer-first and array-based — no per-block Python
objects: the doubly-linked free list is two int32 numpy arrays (prev/next
indexed by block id), ref counts are one int32 array, and the hash maps are
two dicts. This keeps the per-step scheduler cost flat at tens of thousands
of blocks and ports directly to the C++ host runtime.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

NO_NODE = -1


class BlockPool:
    """Allocate / free / prefix-cache integer block ids."""

    def __init__(self, num_blocks: int, block_size: int, enable_caching: bool = True):
        if num_blocks <= 1:
            raise ValueError(f"num_blocks must be > 1, got {num_blocks}")
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_caching = enable_caching

        n = num_blocks
        self.ref = np.zeros(n, np.int32)
        # linked list over block ids; head/tail are virtual nodes n and n+1
        self._prev = np.full(n + 2, NO_NODE, np.int32)
        self._next = np.full(n + 2, NO_NODE, np.int32)
        self._head = n
        self._tail = n + 1
        self._in_free = np.zeros(n, bool)

        # wire 1..n-1 into the free list in id order (block 0 = null, reserved)
        chain = [self._head] + list(range(1, n)) + [self._tail]
        for a, b in zip(chain, chain[1:]):
            self._next[a] = b
            self._prev[b] = a
        self._in_free[1:] = True
        self.num_free = n - 1

        self.ref[0] = 1  # null block permanently claimed

        # prefix cache maps
        self._hash_of: Dict[int, bytes] = {}
        self._block_of: Dict[bytes, int] = {}

        # stats
        self.cache_hits = 0
        self.cache_queries = 0

    # -- linked list ---------------------------------------------------------

    def _ll_remove(self, i: int) -> None:
        p, nx = self._prev[i], self._next[i]
        self._next[p] = nx
        self._prev[nx] = p
        self._prev[i] = NO_NODE
        self._next[i] = NO_NODE
        self._in_free[i] = False
        self.num_free -= 1

    def _ll_append(self, i: int) -> None:
        """Tail append = MRU position (evicted last)."""
        p = self._prev[self._tail]
        self._next[p] = i
        self._prev[i] = p
        self._next[i] = self._tail
        self._prev[self._tail] = i
        self._in_free[i] = True
        self.num_free += 1

    def _ll_popleft(self) -> int:
        i = int(self._next[self._head])
        if i == self._tail:
            raise RuntimeError("block pool free list empty")
        self._ll_remove(i)
        return i

    # -- allocation ----------------------------------------------------------

    def allocate(self, n: int) -> Optional[List[int]]:
        """Claim n blocks LRU-first, evicting their cached hashes.
        Returns None when fewer than n blocks are free (caller may preempt)."""
        if n > self.num_free:
            return None
        out = []
        for _ in range(n):
            bid = self._ll_popleft()
            h = self._hash_of.pop(bid, None)
            if h is not None:
                self._block_of.pop(h, None)
            assert self.ref[bid] == 0, f"block {bid} double-allocated"
            self.ref[bid] = 1
            out.append(bid)
        return out

    def touch(self, block_ids: Sequence[int]) -> None:
        """Prefix-cache hit: ref++ and pull out of the free list if idle."""
        for bid in block_ids:
            if self.ref[bid] == 0 and self._in_free[bid]:
                self._ll_remove(bid)
            self.ref[bid] += 1

    def free(self, block_ids: Iterable[int]) -> None:
        """ref--; blocks reaching 0 return to the free-list tail in REVERSE
        caller order so the block nearest the sequence tail is evicted first
        and the prompt head survives longest (prefix-reuse friendly)."""
        released = []
        for bid in block_ids:
            if bid <= 0 or self.ref[bid] <= 0:
                continue  # double-free guard (matches the C++ pool)
            self.ref[bid] -= 1
            if self.ref[bid] == 0:
                released.append(bid)
        for bid in reversed(released):
            self._ll_append(bid)

    def allocate_specific(self, block_id: int) -> bool:
        """Claim one specific idle block (tests / swap-in restore)."""
        if self.ref[block_id] != 0 or not self._in_free[block_id]:
            return False
        self._ll_remove(block_id)
        h = self._hash_of.pop(block_id, None)
        if h is not None:
            self._block_of.pop(h, None)
        self.ref[block_id] = 1
        return True

    # -- prefix cache ----------------------------------------------------------

    @staticmethod
    def hash_block(
        token_ids,
        prev_hash: Optional[bytes] = None,
        namespace: Optional[bytes] = None,
    ) -> bytes:
        """Chained SHA-256 over (namespace, prev_hash, tokens as i64 LE).
        The namespace salt isolates tenants — identical token sequences under
        different API keys never share blocks (timing-oracle defense,
        ref: block_pool.py:245-263)."""
        h = hashlib.sha256()
        if namespace is not None:
            h.update(namespace)
        if prev_hash is not None:
            h.update(prev_hash)
        h.update(np.asarray(token_ids, dtype="<i8").tobytes())
        return h.digest()

    def get_cached(self, block_hash: bytes) -> Optional[int]:
        if not self.enable_caching:
            return None
        self.cache_queries += 1
        bid = self._block_of.get(block_hash)
        if bid is not None:
            self.cache_hits += 1
        return bid

    def cache(self, block_id: int, block_hash: bytes) -> None:
        """Register a full, computed block under its chained hash."""
        if not self.enable_caching or block_id <= 0:
            return
        if block_id in self._hash_of or block_hash in self._block_of:
            return  # already registered (first writer wins on duplicates)
        self._hash_of[block_id] = block_hash
        self._block_of[block_hash] = block_id

    # -- stats -----------------------------------------------------------------

    def usage(self) -> float:
        total = self.num_blocks - 1
        return 1.0 - self.num_free / total if total else 0.0

    def get_stats(self) -> dict:
        return {
            "num_blocks": self.num_blocks,
            "free_blocks": self.num_free,
            "usage": self.usage(),
            "cached_blocks": len(self._block_of),
            "cache_hits": self.cache_hits,
            "cache_queries": self.cache_queries,
        }
