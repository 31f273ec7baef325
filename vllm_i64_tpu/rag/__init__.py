"""RAG pipeline: chunking, embedding, vector index, retriever
(ref: vllm_i64/rag/)."""

from .chunker import chunk_file, chunk_text
from .embedder import Embedder, EngineEmbedder, HashingEmbedder, get_embedder
from .index import VectorIndex
from .retriever import Hit, Retriever

__all__ = [
    "chunk_text", "chunk_file",
    "Embedder", "EngineEmbedder", "HashingEmbedder", "get_embedder",
    "VectorIndex", "Retriever", "Hit",
]
