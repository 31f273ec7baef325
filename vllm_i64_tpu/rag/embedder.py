"""Swappable embedders (ref: vllm_i64/rag/embedder.py).

TPU-native default: the serving model's own mean-pooled hidden states
(EngineEmbedder — the reference's "model-based I64Embedder" analog).
HashingEmbedder is the dependency-free deterministic fallback.
"""

from __future__ import annotations

import hashlib
import os
from typing import List

import numpy as np


class Embedder:
    dim: int = 0

    def encode(self, texts: List[str]) -> np.ndarray:
        raise NotImplementedError


class EngineEmbedder(Embedder):
    """Embeddings from the loaded model via Engine.embed() — normalized
    mean-pooled final hidden states."""

    def __init__(self, engine, tokenizer=None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.dim = engine.model_config.hidden_size

    def _ids(self, text: str) -> List[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer.encode(text))[:512] or [0]
        return [b for b in text.encode("utf-8")][:512] or [0]

    def encode(self, texts: List[str]) -> np.ndarray:
        return np.stack([self.engine.embed(self._ids(t)) for t in texts])


class HashingEmbedder(Embedder):
    """Feature-hashing bag-of-words embedder: deterministic, no model, no
    network. Words hash into a fixed-dim vector, L2 normalized."""

    def __init__(self, dim: int = 256):
        self.dim = dim

    def encode(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            for word in text.lower().split():
                h = hashlib.md5(word.encode()).digest()
                idx = int.from_bytes(h[:4], "little") % self.dim
                sign = 1.0 if h[4] & 1 else -1.0
                out[i, idx] += sign
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out


def get_embedder(engine=None, tokenizer=None) -> Embedder:
    """Factory controlled by RAG_EMBEDDER env (engine|hashing)."""
    backend = os.getenv("RAG_EMBEDDER", "engine" if engine is not None else "hashing")
    if backend == "engine" and engine is not None:
        return EngineEmbedder(engine, tokenizer)
    return HashingEmbedder()
