"""Token-aware rolling context for chat messages.

Deterministic and local — never makes a recursive model call
(ref: vllm_i64/core/context_manager.py). Fit policy:

  1. system messages always stay
  2. the newest ``recent_turns`` user turns stay verbatim when possible
  3. older turns collapse into one bounded extractive summary message
     (newest-first selection, binary-searched head+tail snippets)
  4. retained turns roll into the summary one by one if still too big
  5. last resort: head+tail token-truncate the essential messages

The final prompt is always measured with the real tokenizer against
``max_seq_len - max_output_tokens`` before generation starts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

Message = Dict[str, str]

SUMMARY_HEADER = "Conversation summary of older turns:"
CUT_MARK = "\n[…]\n"


class ContextWindowError(ValueError):
    """Even the essential chat context cannot fit the window."""


@dataclass(frozen=True)
class ContextPlan:
    """A rendered prompt plus the measurements that produced it."""

    messages: List[Message]
    prompt: str
    prompt_token_ids: List[int]
    max_seq_len: int
    reserved_output_tokens: int
    original_messages: int
    retained_messages: int
    summarized_messages: int
    dropped_messages: int
    original_tokens: int
    summary_tokens: int

    @property
    def prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def tokens_saved(self) -> int:
        return max(0, self.original_tokens - self.prompt_tokens)

    @property
    def compressed(self) -> bool:
        return (self.original_tokens != self.prompt_tokens
                or self.dropped_messages > 0)

    def to_metrics(self) -> dict:
        return {
            "compressed": self.compressed,
            "max_seq_len": self.max_seq_len,
            "reserved_output_tokens": self.reserved_output_tokens,
            "available_prompt_tokens": self.max_seq_len - self.reserved_output_tokens,
            "original_messages": self.original_messages,
            "retained_messages": self.retained_messages,
            "summarized_messages": self.summarized_messages,
            "dropped_messages": self.dropped_messages,
            "original_tokens": self.original_tokens,
            "prompt_tokens": self.prompt_tokens,
            "summary_tokens": self.summary_tokens,
            "tokens_saved": self.tokens_saved,
        }


def _flatten_ws(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def _head_tail_chars(text: str, limit: int) -> str:
    """Longest head+tail character view of flattened text under limit."""
    compact = _flatten_ws(text)
    if len(compact) <= limit:
        return compact
    head = max(1, int(limit * 0.68))
    tail = max(1, limit - head - 5)
    return f"{compact[:head].rstrip()} […] {compact[-tail:].lstrip()}"


class ContextManager:
    """Fit chat messages into the model context window."""

    def __init__(
        self,
        *,
        encode: Callable[[str], List[int]],
        decode: Callable[[List[int]], str],
        render: Callable[[List[Message]], str],
        max_seq_len: int,
        recent_turns: int = 2,
        max_summary_tokens: int = 256,
    ):
        self.encode = encode
        self.decode = decode
        self.render = render
        self.max_seq_len = int(max_seq_len)
        self.recent_turns = max(1, int(recent_turns))
        self.max_summary_tokens = max(16, int(max_summary_tokens))

    # -- public API -------------------------------------------------------

    def fit(self, messages: Sequence[Dict], *, max_output_tokens: int) -> ContextPlan:
        if max_output_tokens < 1:
            raise ContextWindowError("max_tokens must be >= 1")
        budget = self.max_seq_len - max_output_tokens
        if budget < 1:
            raise ContextWindowError(
                f"max_tokens leaves no prompt room in the "
                f"{self.max_seq_len}-token window")

        msgs = self._normalize(messages)
        if not msgs:
            raise ContextWindowError("messages must not be empty")

        full_prompt, full_ids = self._measure(msgs)
        if len(full_ids) <= budget:
            return self._plan(msgs, full_prompt, full_ids, max_output_tokens,
                              msgs, 0, 0, len(full_ids), 0)

        systems = [m for m in msgs if m["role"] == "system"]
        turns = self._turns([m for m in msgs if m["role"] != "system"])
        recent = turns[-self.recent_turns:] if turns else []
        older = turns[: len(turns) - len(recent)]

        while True:
            recent_msgs = [m for t in recent for m in t]
            older_msgs = [m for t in older for m in t]
            sum_budget = min(self.max_summary_tokens, max(16, budget // 4))

            summary, n_sum, n_drop = self._summarize(older_msgs, sum_budget)
            cand = systems + ([summary] if summary else []) + recent_msgs
            prompt, ids = self._measure(cand)
            if len(ids) > budget and summary:
                # shrink the summary budget by the overflow until it fits —
                # starting BELOW sum_budget: the first probe at sum_budget
                # would exactly repeat the summarize+measure already done
                # above (a full binary-search-per-message pass on the
                # request critical path)
                b = sum_budget - max(8, len(ids) - budget)
                while b >= 8:
                    summary, n_sum, n_drop = self._summarize(older_msgs, b)
                    cand = systems + ([summary] if summary else []) + recent_msgs
                    prompt, ids = self._measure(cand)
                    if len(ids) <= budget:
                        break
                    b -= max(8, len(ids) - budget)
                else:
                    summary, n_sum, n_drop = None, 0, len(older_msgs)
                    cand = systems + recent_msgs
                    prompt, ids = self._measure(cand)

            if len(ids) <= budget:
                s_tok = len(self.encode(summary["content"])) if summary else 0
                return self._plan(
                    msgs, prompt, ids, max_output_tokens, cand,
                    n_sum, n_drop, len(full_ids), s_tok,
                    retained=len(systems) + len(recent_msgs),
                )

            if len(recent) > 1:
                older.append(recent.pop(0))  # roll one more turn into summary
                continue
            break

        # essentials-only fallback: newest turn + systems, head+tail truncated
        essential = systems + [m for t in recent for m in t]
        fitted, prompt, ids = self._shrink_essentials(essential, budget)
        return self._plan(
            msgs, prompt, ids, max_output_tokens, fitted,
            0, max(0, len(msgs) - len(fitted)), len(full_ids), 0,
            retained=len(fitted),
        )

    # -- internals ----------------------------------------------------------

    def _plan(self, original, prompt, ids, reserved, messages, n_sum, n_drop,
              orig_tokens, s_tok, retained=None) -> ContextPlan:
        return ContextPlan(
            messages=messages,
            prompt=prompt,
            prompt_token_ids=ids,
            max_seq_len=self.max_seq_len,
            reserved_output_tokens=reserved,
            original_messages=len(original),
            retained_messages=retained if retained is not None else len(messages),
            summarized_messages=n_sum,
            dropped_messages=n_drop,
            original_tokens=orig_tokens,
            summary_tokens=s_tok,
        )

    @staticmethod
    def _normalize(messages: Sequence[Dict]) -> List[Message]:
        out = []
        for m in messages:
            role = str(m.get("role", "user") or "user")
            content = m.get("content", "")
            if not isinstance(content, str):
                content = "" if content is None else str(content)
            out.append({"role": role, "content": content})
        return out

    @staticmethod
    def _turns(messages: Sequence[Message]) -> List[List[Message]]:
        """Group into user-led turns: a turn starts at each user message."""
        turns: List[List[Message]] = []
        cur: List[Message] = []
        for m in messages:
            if m["role"] == "user" and cur:
                turns.append(cur)
                cur = []
            cur.append(m)
        if cur:
            turns.append(cur)
        return turns

    def _measure(self, messages: List[Message]) -> Tuple[str, List[int]]:
        prompt = self.render(messages)
        return prompt, self.encode(prompt)

    def _summarize(
        self, messages: Sequence[Message], token_budget: int
    ) -> Tuple[Optional[Message], int, int]:
        """One extractive summary message under token_budget.

        Walks old messages newest-first (they bridge into the verbatim
        turns); per message, binary-search the longest head+tail snippet
        that still fits the running summary."""
        if not messages or token_budget < 8:
            return None, 0, len(messages)

        lines: List[str] = []
        taken = 0
        for m in reversed(messages):
            compact = _flatten_ws(m["content"])
            if not compact:
                continue
            role = m["role"].capitalize()
            best = None
            lo, hi = 1, min(240, len(compact))
            while lo <= hi:
                mid = (lo + hi) // 2
                line = f"- {role}: {_head_tail_chars(compact, mid)}"
                omitted = len(messages) - (taken + 1)
                tail = (f"\n- [{omitted} earlier message"
                        f"{'s' if omitted != 1 else ''} omitted.]") if omitted else ""
                text = SUMMARY_HEADER + "\n" + "\n".join([line] + lines) + tail
                if len(self.encode(text)) <= token_budget:
                    best = line
                    lo = mid + 1
                else:
                    hi = mid - 1
            if best is None:
                continue
            lines.insert(0, best)
            taken += 1

        dropped = max(0, len(messages) - taken)
        if not lines:
            marker = (f"{SUMMARY_HEADER}\n- [{len(messages)} earlier "
                      f"messages omitted.]")
            ids = self.encode(marker)
            if len(ids) > token_budget:
                marker = self.decode(ids[:token_budget])
            return {"role": "system", "content": marker}, 0, len(messages)

        tail = (f"\n- [{dropped} earlier message"
                f"{'s' if dropped != 1 else ''} omitted.]") if dropped else ""
        body = SUMMARY_HEADER + "\n" + "\n".join(lines) + tail
        return {"role": "system", "content": body}, taken, dropped

    def _shrink_essentials(
        self, messages: List[Message], budget: int
    ) -> Tuple[List[Message], str, List[int]]:
        fitted = [dict(m) for m in messages]
        for _ in range(64):
            prompt, ids = self._measure(fitted)
            if len(ids) <= budget:
                return fitted, prompt, ids
            overflow = len(ids) - budget
            sized = [(i, len(self.encode(m["content"])))
                     for i, m in enumerate(fitted) if m["content"]]
            if not sized:
                break
            idx, ntok = max(sized, key=lambda x: x[1])
            if ntok <= 4:
                break
            fitted[idx]["content"] = self._head_tail_tokens(
                fitted[idx]["content"], max(4, ntok - overflow - 4))
        prompt, ids = self._measure(fitted)
        if len(ids) > budget:
            raise ContextWindowError(
                f"essential chat template needs {len(ids)} prompt tokens; "
                f"only {budget} available")
        return fitted, prompt, ids

    def _head_tail_tokens(self, text: str, token_budget: int) -> str:
        ids = self.encode(text)
        if len(ids) <= token_budget:
            return text
        mark = self.encode(CUT_MARK)
        room = max(1, token_budget - len(mark))
        head = max(1, int(room * 0.65))
        tail = max(0, room - head)
        kept = ids[:head]
        if tail:
            kept = kept + mark + ids[-tail:]
        return self.decode(kept)
