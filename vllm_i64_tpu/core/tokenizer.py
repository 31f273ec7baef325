"""Tokenizer wrapper: text <-> int64 token ids.

Same contract as the reference tokenizer (ref: vllm_i64/core/tokenizer.py):
HF fast-tokenizer wrapper, trailing-EOS strip on encode (the model must not
see EOS inside the prompt), and special-token discovery by candidate-name
lists. Adds a deterministic byte-level fallback so the engine and server are
fully usable without a tokenizer.json (tests, synthetic checkpoints).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger("vllm_i64_tpu.tokenizer")

_EOS_NAMES = ["</s>", "<|endoftext|>", "<|end|>", "<eos>", "<|eot_id|>"]
_BOS_NAMES = ["<s>", "<|startoftext|>", "<|begin|>", "<bos>", "<|begin_of_text|>"]
_PAD_NAMES = ["<pad>", "<|pad|>", "<|padding|>"]


class Tokenizer:
    """HF fast tokenizer wrapper (ref: tokenizer.py:19-75)."""

    def __init__(self, tokenizer_path: str):
        from tokenizers import Tokenizer as HFTokenizer

        self._tok = HFTokenizer.from_file(tokenizer_path)

    def encode(self, text: str) -> List[int]:
        ids = self._tok.encode(text).ids
        eos = self.eos_token_id
        if ids and ids[-1] == eos:
            ids = ids[:-1]
        return ids

    def decode(self, token_ids: List[int]) -> str:
        return self._tok.decode(list(int(t) for t in token_ids))

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def _find(self, names: List[str], fallback: int) -> int:
        for name in names:
            tid = self._tok.token_to_id(name)
            if tid is not None:
                return tid
        return fallback

    @property
    def eos_token_id(self) -> int:
        return self._find(_EOS_NAMES, 0)

    @property
    def bos_token_id(self) -> int:
        return self._find(_BOS_NAMES, 0)

    @property
    def pad_token_id(self) -> int:
        return self._find(_PAD_NAMES, self.eos_token_id)


class ByteTokenizer:
    """Deterministic fallback: UTF-8 bytes offset by the special tokens.

    id 0 = EOS, 1 = PAD, 2 = BOS, byte b -> 3 + b. Round-trips any text and
    needs no files; lets every engine/API test run without checkpoints
    (the reference instead returns None and degrades, tokenizer.py:104-106).
    """

    vocab_size = 259

    eos_token_id = 0
    pad_token_id = 1
    bos_token_id = 2

    def encode(self, text: str) -> List[int]:
        return [3 + b for b in text.encode("utf-8")]

    def decode(self, token_ids: List[int]) -> str:
        data = bytes(int(t) - 3 for t in token_ids if 3 <= int(t) < 259)
        return data.decode("utf-8", errors="replace")


def load_tokenizer(checkpoint_path: Optional[str]) -> Optional[Tokenizer]:
    """Find tokenizer.json in/next to a checkpoint dir (ref: tokenizer.py:78-106)."""
    if not checkpoint_path:
        return None
    p = Path(checkpoint_path)
    config_dir = p if p.is_dir() else p.parent
    for candidate in (config_dir / "tokenizer.json",
                      config_dir.parent / "tokenizer.json"):
        if candidate.exists():
            logger.info("Tokenizer: %s", candidate)
            return Tokenizer(str(candidate))
    logger.warning("tokenizer.json not found near %s (byte fallback available)",
                   checkpoint_path)
    return None


def load_tokenizer_or_fallback(checkpoint_path: Optional[str]):
    tok = load_tokenizer(checkpoint_path) if checkpoint_path else None
    return tok if tok is not None else ByteTokenizer()
