"""High-level RAG interface (ref: vllm_i64/rag/retriever.py)."""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

from .chunker import chunk_file, chunk_text
from .embedder import Embedder, get_embedder
from .index import VectorIndex

logger = logging.getLogger("vllm_i64_tpu.rag")


@dataclass
class Hit:
    text: str
    score: float
    source: str = ""


class Retriever:
    def __init__(self, embedder: Optional[Embedder] = None):
        self.embedder = embedder or get_embedder()
        self.index: Optional[VectorIndex] = None

    # -- indexing ---------------------------------------------------------

    def index_text(self, text: str, chunk_size: int = 200, overlap: int = 50,
                   source: str = "") -> int:
        return self._add(chunk_text(text, chunk_size, overlap), source)

    def index_file(self, path: str, chunk_size: int = 200,
                   overlap: int = 50) -> int:
        return self._add(chunk_file(path, chunk_size, overlap), source=path)

    def _add(self, chunks: List[str], source: str) -> int:
        if not chunks:
            return 0
        vectors = self.embedder.encode(chunks)
        if self.index is None:
            self.index = VectorIndex(dim=vectors.shape[1])
        self.index.add(chunks, vectors, source=source)
        return len(chunks)

    # -- retrieval -----------------------------------------------------------

    def search(self, query: str, k: int = 3) -> List[Hit]:
        if self.index is None or not self.index.chunks:
            return []
        qv = self.embedder.encode([query])[0]
        return [
            Hit(text=self.index.chunks[i], score=s,
                source=self.index.sources[i])
            for i, s in self.index.search(qv, k=k)
        ]

    def get_context(self, query: str, k: int = 3,
                    separator: str = "\n---\n") -> str:
        return separator.join(h.text for h in self.search(query, k=k))

    # -- persistence ------------------------------------------------------------

    def save(self, directory: str) -> None:
        if self.index is None:
            raise RuntimeError("nothing to save — index is empty")
        self.index.save(directory)

    @classmethod
    def load(cls, directory: str, embedder: Optional[Embedder] = None) -> "Retriever":
        obj = cls(embedder=embedder)
        obj.index = VectorIndex.load(directory)
        if (obj.embedder is not None and obj.index is not None
                and obj.index.dim and obj.embedder.dim != obj.index.dim):
            from .embedder import HashingEmbedder

            if isinstance(obj.embedder, HashingEmbedder):
                # hashing is stateless — adapt its dim to the saved index
                # instead of crashing on the first query
                logger.info(
                    "adapting hashing embedder dim %d -> saved index dim %d",
                    obj.embedder.dim, obj.index.dim)
                obj.embedder = HashingEmbedder(dim=obj.index.dim)
            else:
                raise ValueError(
                    f"embedder dim {obj.embedder.dim} != saved index dim "
                    f"{obj.index.dim} — the index was built with a "
                    f"different embedder; rebuild it or load with the "
                    f"matching one")
        return obj

    @classmethod
    def load_or_create(cls, directory: str, engine=None,
                       tokenizer=None) -> "Retriever":
        emb = get_embedder(engine=engine, tokenizer=tokenizer)
        if Path(directory, "chunks.json").exists():
            logger.info("loading RAG index from %s", directory)
            return cls.load(directory, embedder=emb)
        return cls(embedder=emb)

    def get_stats(self) -> dict:
        return {
            "chunks": len(self.index.chunks) if self.index else 0,
            "dim": self.index.dim if self.index else self.embedder.dim,
            "embedder": type(self.embedder).__name__,
        }
