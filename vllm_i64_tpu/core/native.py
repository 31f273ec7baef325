"""Native (C++) host-runtime loader + wrappers.

Compile-or-fallback, like the reference's JIT kernel loader
(ref: vllm_i64/kernels/kernel_loader.py:98-128): first use compiles
csrc/host_runtime.cpp with g++ into a cached shared library and binds it
via ctypes; when no toolchain is available everything silently falls back
to the pure-Python core/block_pool.py implementation.

``NativeBlockPool`` is API-compatible with ``core.block_pool.BlockPool``.
Full SHA-256 block hashes are folded to their first 8 bytes for the C-side
prefix map (collision probability ~2^-64 — the chained construction already
mixes the namespace and full history into every digest).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Iterable, List, Optional, Sequence

import numpy as np

logger = logging.getLogger("vllm_i64_tpu.native")

_LIB = None
_LIB_TRIED = False

_SRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "host_runtime.cpp"


def _cache_dir() -> Path:
    d = Path(os.environ.get("VLLM_I64_TPU_CACHE",
                            Path.home() / ".cache" / "vllm_i64_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def load_native():
    """Compile (once) and load the host-runtime shared library, or None."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not _SRC.exists():
        return None
    src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so_path = _cache_dir() / f"host_runtime_{src_hash}.so"
    try:
        if not so_path.exists():
            with tempfile.TemporaryDirectory() as td:
                tmp = Path(td) / "host_runtime.so"
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     str(_SRC), "-o", str(tmp)],
                    check=True, capture_output=True, timeout=120,
                )
                tmp.replace(so_path)
            logger.info("compiled native host runtime -> %s", so_path)
        lib = ctypes.CDLL(str(so_path))
    except (subprocess.SubprocessError, OSError) as exc:
        logger.warning("native host runtime unavailable (%s); "
                       "using Python block pool", exc)
        return None

    lib.pool_create.restype = ctypes.c_void_p
    lib.pool_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.pool_destroy.argtypes = [ctypes.c_void_p]
    lib.pool_allocate.restype = ctypes.c_int32
    lib.pool_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.pool_touch.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.pool_free.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.pool_allocate_specific.restype = ctypes.c_int32
    lib.pool_allocate_specific.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pool_cache.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                               ctypes.c_uint64]
    lib.pool_get_cached.restype = ctypes.c_int32
    lib.pool_get_cached.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    for fn in ("pool_num_free", "pool_ref"):
        getattr(lib, fn).restype = ctypes.c_int32
    lib.pool_ref.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pool_num_free.argtypes = [ctypes.c_void_p]
    for fn in ("pool_cache_hits", "pool_cache_queries", "pool_cached_blocks"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _digest64(h: bytes) -> int:
    return int.from_bytes(h[:8], "little")


class NativeBlockPool:
    """ctypes wrapper over the C++ pool — drop-in for BlockPool."""

    def __init__(self, num_blocks: int, block_size: int,
                 enable_caching: bool = True):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native host runtime not available")
        self._lib = lib
        self._h = lib.pool_create(num_blocks, 1 if enable_caching else 0)
        if not self._h:
            raise ValueError(f"num_blocks must be > 1, got {num_blocks}")
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_caching = enable_caching

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pool_destroy(self._h)
            self._h = None

    # -- allocation ------------------------------------------------------------

    def allocate(self, n: int) -> Optional[List[int]]:
        out = (ctypes.c_int32 * max(n, 1))()
        if not self._lib.pool_allocate(self._h, n, out):
            return None
        return list(out[:n])

    def touch(self, block_ids: Sequence[int]) -> None:
        arr = (ctypes.c_int32 * len(block_ids))(*block_ids)
        self._lib.pool_touch(self._h, arr, len(block_ids))

    def free(self, block_ids: Iterable[int]) -> None:
        ids = list(block_ids)
        arr = (ctypes.c_int32 * max(len(ids), 1))(*ids)
        self._lib.pool_free(self._h, arr, len(ids))

    def allocate_specific(self, block_id: int) -> bool:
        return bool(self._lib.pool_allocate_specific(self._h, block_id))

    # -- prefix cache -----------------------------------------------------------

    # identical chained-hash construction as the Python pool
    from .block_pool import BlockPool as _PyPool

    hash_block = staticmethod(_PyPool.hash_block)

    def get_cached(self, block_hash: bytes) -> Optional[int]:
        bid = self._lib.pool_get_cached(self._h, _digest64(block_hash))
        return None if bid < 0 else int(bid)

    def cache(self, block_id: int, block_hash: bytes) -> None:
        self._lib.pool_cache(self._h, block_id, _digest64(block_hash))

    # -- stats -------------------------------------------------------------------

    @property
    def num_free(self) -> int:
        return int(self._lib.pool_num_free(self._h))

    @property
    def cache_hits(self) -> int:
        return int(self._lib.pool_cache_hits(self._h))

    @property
    def cache_queries(self) -> int:
        return int(self._lib.pool_cache_queries(self._h))

    def usage(self) -> float:
        total = self.num_blocks - 1
        return 1.0 - self.num_free / total if total else 0.0

    def get_stats(self) -> dict:
        return {
            "num_blocks": self.num_blocks,
            "free_blocks": self.num_free,
            "usage": self.usage(),
            "cached_blocks": int(self._lib.pool_cached_blocks(self._h)),
            "cache_hits": self.cache_hits,
            "cache_queries": self.cache_queries,
            "native": True,
        }


def make_block_pool(num_blocks: int, block_size: int,
                    enable_caching: bool = True, prefer_native: bool = True):
    """Factory: native pool when the toolchain allows, Python otherwise."""
    if prefer_native and load_native() is not None:
        try:
            return NativeBlockPool(num_blocks, block_size, enable_caching)
        except (RuntimeError, ValueError):
            pass
    from .block_pool import BlockPool

    return BlockPool(num_blocks, block_size, enable_caching)
