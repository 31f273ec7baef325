"""Numpy cosine-similarity vector index with disk persistence
(ref: vllm_i64/rag/index.py — FAISS there; plain numpy here, no deps)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Tuple

import numpy as np


class VectorIndex:
    def __init__(self, dim: int):
        self.dim = dim
        self.vectors = np.zeros((0, dim), np.float32)
        self.chunks: List[str] = []
        self.sources: List[str] = []

    def add(self, chunks: List[str], vectors: np.ndarray,
            source: str = "") -> None:
        if len(chunks) != len(vectors):
            raise ValueError("chunks/vectors length mismatch")
        v = np.asarray(vectors, np.float32)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        v = v / np.maximum(norms, 1e-12)
        self.vectors = np.concatenate([self.vectors, v], axis=0)
        self.chunks.extend(chunks)
        self.sources.extend([source] * len(chunks))

    def search(self, query_vec: np.ndarray, k: int = 3) -> List[Tuple[int, float]]:
        """Returns [(chunk_index, cosine_score)] best-first."""
        if len(self.chunks) == 0:
            return []
        q = np.asarray(query_vec, np.float32).reshape(-1)
        q = q / max(np.linalg.norm(q), 1e-12)
        scores = self.vectors @ q
        top = np.argsort(-scores)[:k]
        return [(int(i), float(scores[i])) for i in top]

    def save(self, directory: str) -> None:
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "vectors.npy", self.vectors)
        with open(d / "chunks.json", "w", encoding="utf-8") as f:
            json.dump({"dim": self.dim, "chunks": self.chunks,
                       "sources": self.sources}, f)

    @classmethod
    def load(cls, directory: str) -> "VectorIndex":
        d = Path(directory)
        with open(d / "chunks.json", encoding="utf-8") as f:
            meta = json.load(f)
        idx = cls(dim=meta["dim"])
        idx.vectors = np.load(d / "vectors.npy")
        idx.chunks = meta["chunks"]
        idx.sources = meta.get("sources", [""] * len(idx.chunks))
        return idx
