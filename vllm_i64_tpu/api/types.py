"""API request/response types (ref: vllm_i64/api/types.py).

OpenAI-compatible request parsing + validation, conversion to
SamplingParams, and the sha256 partition-affinity helper.
"""

from __future__ import annotations

import hashlib
import json
import uuid
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

from ..core.logits_processor import OutputConstraints
from ..core.sampling import SamplingParams


def compute_partition(api_key: Optional[str], user_id: Optional[str], n: int = 64) -> int:
    """Deterministic partition index for cache affinity / load balancing:
    sha256(api_key:user_id) % n; random when no user id
    (ref: types.py:15-26)."""
    uid = user_id if user_id is not None else str(uuid.uuid4())
    digest = hashlib.sha256(f"{api_key or ''}:{uid}".encode()).digest()
    return int.from_bytes(digest[:4], "big") % n


def _as_stop_list(stop):
    """OpenAI allows `stop` as a bare string or a list of strings; a bare
    string must become ONE sequence, not be iterated character-by-character."""
    if stop is None:
        return None
    if isinstance(stop, str):
        return [stop]
    return list(stop)


@dataclass
class CompletionRequest:
    prompt: str
    max_tokens: int = 256
    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.9
    min_p: float = 0.0
    typical_p: float = 1.0
    repetition_penalty: float = 1.1
    min_tokens: int = 0
    stream: bool = False
    response_format: Optional[Dict] = None
    stop: Optional[list] = None
    n: int = 1
    best_of: int = 1
    logprobs: Optional[int] = None
    seed: Optional[int] = None
    logit_bias: Optional[Dict[str, float]] = None
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    priority: int = 0
    suppress_first_tokens: Optional[List[int]] = None
    user: Optional[str] = field(default=None)

    # request-scoped extras attached by handlers (not part of the wire type)
    _prompt_token_ids: Optional[List[int]] = field(default=None, repr=False)
    _context_metrics: Optional[dict] = field(default=None, repr=False)
    # VLM soft tokens: ((P, H) f32 embeds, (P,) prompt positions)
    _soft: Optional[tuple] = field(default=None, repr=False)

    @classmethod
    def from_body(cls, body: dict, prompt: str,
                  suppress_first_tokens=None, user=None) -> "CompletionRequest":
        return cls(
            prompt=prompt,
            max_tokens=body.get("max_tokens", 256),
            temperature=body.get("temperature", 0.8),
            top_k=body.get("top_k", 50),
            top_p=body.get("top_p", 0.9),
            min_p=body.get("min_p", 0.0),
            typical_p=body.get("typical_p", 1.0),
            repetition_penalty=body.get("repetition_penalty", 1.1),
            min_tokens=body.get("min_tokens", 0),
            stream=body.get("stream", False),
            response_format=body.get("response_format"),
            stop=_as_stop_list(body.get("stop")),
            n=body.get("n", 1),
            best_of=body.get("best_of", 1),
            logprobs=body.get("logprobs"),
            seed=body.get("seed"),
            logit_bias=body.get("logit_bias"),
            frequency_penalty=body.get("frequency_penalty", 0.0),
            presence_penalty=body.get("presence_penalty", 0.0),
            priority=body.get("priority", 0),
            suppress_first_tokens=suppress_first_tokens,
            user=user if user is not None else body.get("user"),
        )

    def validate(self, max_seq_len: int = 2048,
                 prompt_tokens: Optional[int] = None) -> Optional[str]:
        """Returns an error message, or None when valid
        (ref: types.py:57-99 — incl. the total-token budget check)."""
        if self._prompt_token_ids is not None:
            if len(self._prompt_token_ids) == 0:
                return "prompt must not be empty"
        elif not self.prompt or not self.prompt.strip():
            return "prompt must not be empty"
        if self.max_tokens < 1:
            return "max_tokens must be >= 1"
        if self.max_tokens > max_seq_len:
            return f"max_tokens must be <= {max_seq_len}"
        if prompt_tokens is not None and prompt_tokens + self.max_tokens > max_seq_len:
            return (f"prompt_tokens ({prompt_tokens}) + max_tokens "
                    f"({self.max_tokens}) must be <= {max_seq_len}")
        if self.temperature < 0:
            return "temperature must be >= 0"
        if self.top_k < 0:
            return "top_k must be >= 0"
        for name in ("top_p", "min_p", "typical_p"):
            v = getattr(self, name)
            if v < 0 or v > 1:
                return f"{name} must be in [0, 1]"
        if self.min_tokens < 0:
            return "min_tokens must be >= 0"
        if self.repetition_penalty <= 0:
            return "repetition_penalty must be > 0"
        if self.logprobs is not None and not (0 <= self.logprobs <= 20):
            return "logprobs must be between 0 and 20"
        for name in ("frequency_penalty", "presence_penalty"):
            v = getattr(self, name)
            if v < -2.0 or v > 2.0:
                return f"{name} must be in [-2.0, 2.0]"
        if self.logit_bias:
            for k, v in self.logit_bias.items():
                if not str(k).lstrip("-").isdigit():
                    return f"logit_bias keys must be token ID strings, got '{k}'"
                if v < -100 or v > 100:
                    return f"logit_bias values must be in [-100, 100], got {v}"
        return None

    def to_sampling_params(self, tokenizer=None) -> SamplingParams:
        rf = self.response_format or {}
        json_mode = rf.get("type") == "json_object"
        constraints = None
        if self.response_format or self.stop or self.suppress_first_tokens:
            stop_seqs = None
            if self.stop and tokenizer is not None:
                stop_seqs = [list(tokenizer.encode(s)) for s in self.stop]
            elif self.stop:
                stop_seqs = [[int(b) for b in s.encode("utf-8")] for s in self.stop]
            constraints = OutputConstraints(
                json_mode=json_mode,
                regex_pattern=rf.get("pattern") if rf.get("type") == "regex" else None,
                stop_sequences=stop_seqs,
                suppress_first_tokens=self.suppress_first_tokens,
            )
        logit_bias = ({int(k): v for k, v in self.logit_bias.items()}
                      if self.logit_bias else None)
        return SamplingParams(
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            min_p=self.min_p,
            typical_p=self.typical_p,
            repetition_penalty=self.repetition_penalty,
            max_tokens=self.max_tokens,
            min_tokens=self.min_tokens,
            json_mode=json_mode,
            num_beams=self.best_of if self.best_of > 1 else 1,
            logprobs=self.logprobs,
            output_constraints=constraints,
            seed=self.seed,
            logit_bias=logit_bias,
            frequency_penalty=self.frequency_penalty,
            presence_penalty=self.presence_penalty,
        )


@dataclass
class CompletionResponse:
    id: str
    object: str = "text_completion"
    created: int = 0
    model: str = "vllm-i64-tpu"
    choices: List[Dict] = None
    usage: Optional[Dict] = None
    context_metrics: Optional[Dict] = None

    def __post_init__(self):
        if self.choices is None:
            self.choices = []

    def to_dict(self) -> dict:
        d = asdict(self)
        if d.get("usage") is None:
            d.pop("usage", None)
        if d.get("context_metrics") is None:
            d.pop("context_metrics", None)
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict())
