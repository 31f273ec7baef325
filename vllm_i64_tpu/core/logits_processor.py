"""Constrained decoding: logits processors for structured output.

Numpy re-implementation of the reference processor chain
(ref: vllm_i64/core/logits_processor.py:23-309):
- JSON mode (integer state machine over brace depth / string state)
- regex constraint with partial-match checking
- choice constraint (token-trie over allowed sequences)
- stop sequences (token-window match, exposes stop_index for truncation)
- suppress-first-tokens (step-0 masking)

These run host-side on the final-token logits row of "complex" requests
only — the TPU fast path never sees them. All state is integer; only the
logits row is float (the reference's "integers everywhere" discipline).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Set

import numpy as np

NEG_INF = float("-inf")


class LogitsProcessor:
    """Base: takes (logits (V,) f32, generated_ids) -> modified logits."""

    def __call__(self, logits: np.ndarray, generated_ids: List[int]) -> np.ndarray:
        return logits


class JSONLogitsProcessor(LogitsProcessor):
    """Force valid JSON: integer state machine tracking depth / in-string /
    escape; boosts EOS once the document closes
    (ref: logits_processor.py:30-125)."""

    STATE_START = 0
    STATE_OPEN = 1
    STATE_COMPLETE = 6

    def __init__(self, tokenizer=None, eos_token_id: int = 0):
        self.tokenizer = tokenizer
        if tokenizer is not None and getattr(tokenizer, "eos_token_id", None) is not None:
            eos_token_id = tokenizer.eos_token_id
        self.eos_token_id = int(eos_token_id)
        self._depth = 0
        self._state = self.STATE_START
        self._in_string = False
        self._escape_next = False
        self._consumed = 0  # generated tokens already folded into the state

    def __call__(self, logits: np.ndarray, generated_ids: List[int]) -> np.ndarray:
        for tok in generated_ids[self._consumed:]:
            self._update_state(int(tok))
        self._consumed = len(generated_ids)

        if self._state == self.STATE_COMPLETE:
            eos_logit = logits[self.eos_token_id]
            logits = np.full_like(logits, NEG_INF)
            logits[self.eos_token_id] = eos_logit + 10.0
        return logits

    def _update_state(self, token_id: int) -> None:
        if self.tokenizer is not None:
            chars = self.tokenizer.decode([token_id])
        else:
            chars = chr(token_id) if token_id < 128 else ""
        for ch in chars:
            if self._escape_next:
                self._escape_next = False
                continue
            if ch == "\\":
                self._escape_next = True
                continue
            if self._in_string:
                if ch == '"':
                    self._in_string = False
                continue
            if ch == '"':
                self._in_string = True
            elif ch in "{[":
                self._depth += 1
                self._state = self.STATE_OPEN
            elif ch in "}]":
                self._depth -= 1
                if self._depth == 0:
                    self._state = self.STATE_COMPLETE

    def is_complete(self) -> bool:
        return self._state == self.STATE_COMPLETE


class RegexLogitsProcessor(LogitsProcessor):
    """Constrain to a regex: boost EOS on full match, force EOS when the
    prefix can no longer match (ref: logits_processor.py:128-180)."""

    _PROBE_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 {}[]\",:.\n"

    def __init__(self, pattern: str, tokenizer=None, eos_token_id: int = 0):
        self.pattern = re.compile(pattern)
        self.tokenizer = tokenizer
        if tokenizer is not None and getattr(tokenizer, "eos_token_id", None) is not None:
            eos_token_id = tokenizer.eos_token_id
        self.eos_token_id = int(eos_token_id)
        self._generated_text = ""
        # TRUE prefix-viability needs partial matching, which stdlib `re`
        # lacks: `re.match(pattern, text)` answers the WRONG question (it
        # tests whether a match STARTS at 0, so '1' under '[0-9]{5}' looked
        # dead and every fixed-length pattern truncated after one token,
        # while 'abX' under 'ab' looked alive and ran unconstrained)
        try:
            import regex as _regex

            self._partial = _regex.compile(pattern)
        except ImportError:  # pragma: no cover — regex ships with the env
            self._partial = None

    def _prefix_viable(self, text: str) -> bool:
        if self._partial is not None:
            return self._partial.fullmatch(text, partial=True) is not None
        # conservative fallback: never force EOS on uncertainty
        return True

    def __call__(self, logits: np.ndarray, generated_ids: List[int]) -> np.ndarray:
        if self.tokenizer is not None and generated_ids:
            self._generated_text = self.tokenizer.decode(list(generated_ids))

        if self._generated_text and self.pattern.fullmatch(self._generated_text):
            eos_logit = logits[self.eos_token_id]
            logits = np.full_like(logits, NEG_INF)
            logits[self.eos_token_id] = eos_logit + 10.0
            return logits

        if self.tokenizer is not None and self._generated_text:
            if not self._prefix_viable(self._generated_text):
                logits = np.full_like(logits, NEG_INF)
                logits[self.eos_token_id] = 0.0
        return logits

    def is_match(self) -> bool:
        return bool(self.pattern.fullmatch(self._generated_text))


class ChoiceLogitsProcessor(LogitsProcessor):
    """Constrain output to one of N fixed strings via a token trie
    (ref: logits_processor.py:183-222)."""

    def __init__(self, choices: List[str], tokenizer=None, eos_token_id: int = 0):
        self.choices = choices
        self._choice_ids: List[List[int]] = []
        if tokenizer is not None:
            self._choice_ids = [list(tokenizer.encode(c)) for c in choices]
            if getattr(tokenizer, "eos_token_id", None) is not None:
                eos_token_id = tokenizer.eos_token_id
        self.eos_token_id = int(eos_token_id)

    def __call__(self, logits: np.ndarray, generated_ids: List[int]) -> np.ndarray:
        if not self._choice_ids:
            return logits
        pos = len(generated_ids)
        gen = list(generated_ids)
        allowed: Set[int] = set()
        completed = False
        for seq in self._choice_ids:
            if pos < len(seq) and gen == seq[:pos]:
                allowed.add(seq[pos])
            elif pos >= len(seq) and gen[: len(seq)] == seq:
                completed = True
        if completed and not allowed:
            # a full choice is generated and no longer choice continues it:
            # force EOS — passing logits through here let the model append
            # arbitrary text after the chosen string
            mask = np.full_like(logits, NEG_INF)
            mask[self.eos_token_id] = 0.0
            return logits + mask
        if allowed:
            mask = np.full_like(logits, NEG_INF)
            for tid in allowed:
                if tid < logits.shape[-1]:
                    mask[tid] = 0.0
            logits = logits + mask
        elif pos > 0:
            # generated ids diverged from every choice (shouldn't happen
            # when this processor ran from step 0; defensive): end cleanly
            # rather than silently dropping the constraint
            mask = np.full_like(logits, NEG_INF)
            mask[self.eos_token_id] = 0.0
            logits = logits + mask
        return logits


class StopSequenceProcessor(LogitsProcessor):
    """Token-window stop-sequence detector. Does not modify logits; the
    engine consumes should_stop/stop_index to finish + truncate
    (ref: logits_processor.py:225-263; truncation at i64_engine.py:1216-1224)."""

    def __init__(self, stop_sequences: List[List[int]]):
        self.stop_sequences = [list(map(int, s)) for s in stop_sequences if s]
        self._triggered = False
        self._stop_idx = -1

    def __call__(self, logits: np.ndarray, generated_ids: List[int]) -> np.ndarray:
        self.check(generated_ids)
        return logits

    def check(self, generated_ids: List[int]) -> bool:
        if self._triggered:
            return True
        ids = list(generated_ids)
        for seq in self.stop_sequences:
            n = len(seq)
            if len(ids) >= n and ids[-n:] == seq:
                self._triggered = True
                self._stop_idx = len(ids) - n
                return True
        return False

    @property
    def should_stop(self) -> bool:
        return self._triggered

    @property
    def stop_index(self) -> int:
        return self._stop_idx


class SuppressTokensProcessor(LogitsProcessor):
    """Mask given tokens at generation step 0 only
    (ref: logits_processor.py:291-309)."""

    def __init__(self, suppress_ids: List[int]):
        self.suppress_ids = [int(t) for t in suppress_ids]

    def __call__(self, logits: np.ndarray, generated_ids: List[int]) -> np.ndarray:
        if len(generated_ids) == 0:
            logits = logits.copy()
            for tid in self.suppress_ids:
                if tid < logits.shape[-1]:
                    logits[tid] = NEG_INF
        return logits


@dataclass
class OutputConstraints:
    """Bundle of structured-output constraints for one request
    (ref: logits_processor.py:266-288)."""

    json_mode: bool = False
    regex_pattern: Optional[str] = None
    choices: Optional[List[str]] = None
    stop_sequences: Optional[List[List[int]]] = None
    suppress_first_tokens: Optional[List[int]] = None

    def build_processors(self, tokenizer=None, eos_token_id: int = 0) -> List[LogitsProcessor]:
        procs: List[LogitsProcessor] = []
        if self.suppress_first_tokens:
            procs.append(SuppressTokensProcessor(self.suppress_first_tokens))
        if self.json_mode:
            procs.append(JSONLogitsProcessor(tokenizer=tokenizer, eos_token_id=eos_token_id))
        if self.regex_pattern:
            procs.append(RegexLogitsProcessor(
                self.regex_pattern, tokenizer=tokenizer, eos_token_id=eos_token_id))
        if self.choices:
            procs.append(ChoiceLogitsProcessor(self.choices, tokenizer=tokenizer))
        if self.stop_sequences:
            procs.append(StopSequenceProcessor(self.stop_sequences))
        return procs


def apply_logits_processors(
    logits: np.ndarray,
    processors: List[LogitsProcessor],
    generated_ids: List[int],
) -> np.ndarray:
    for proc in processors:
        logits = proc(logits, generated_ids)
    return logits
