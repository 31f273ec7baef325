"""Word-window text chunking (ref: vllm_i64/rag/chunker.py)."""

from __future__ import annotations

from typing import List


def chunk_text(text: str, chunk_size: int = 200, overlap: int = 50) -> List[str]:
    """Overlapping word windows: chunk_size words, overlap shared."""
    words = text.split()
    step = max(1, chunk_size - overlap)
    chunks = []
    for i in range(0, len(words), step):
        window = words[i:i + chunk_size]
        if i > 0 and i + len(window) <= i - step + chunk_size:
            # tail window fully contained in the previous chunk — indexing
            # it duplicates content and crowds top-k retrieval
            break
        chunk = " ".join(window)
        if chunk.strip():
            chunks.append(chunk)
    return chunks


def chunk_file(path: str, chunk_size: int = 200, overlap: int = 50) -> List[str]:
    """Chunk a .txt file (PDF needs pymupdf, gated)."""
    if path.endswith(".pdf"):
        try:
            import fitz  # type: ignore
        except ImportError as exc:
            raise ImportError("PDF chunking requires pymupdf") from exc
        doc = fitz.open(path)
        text = "\n".join(page.get_text() for page in doc)
    else:
        with open(path, encoding="utf-8") as f:
            text = f.read()
    return chunk_text(text, chunk_size=chunk_size, overlap=overlap)
