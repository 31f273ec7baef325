"""Chat template rendering (Jinja2) with checkpoint discovery.

Same behavior as the reference (ref: vllm_i64/core/chat_template.py):
- render {"role","content"} message lists with add_generation_prompt
- discovery order: chat_template.jinja / .j2 / template.jinja next to the
  checkpoint, then tokenizer_config.json#chat_template, walking up at most
  4 directories (chat_template.py:59-95)
- plus a built-in default template so chat works without checkpoint files.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, List, Optional

logger = logging.getLogger("vllm_i64_tpu.chat_template")

# Minimal ChatML-style default (used when the checkpoint ships no template).
DEFAULT_TEMPLATE = (
    "{% for message in messages %}"
    "<|{{ message['role'] }}|>\n{{ message['content'] }}\n"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|assistant|>\n{% endif %}"
)


def _raise_exception(message: str = "template error"):
    raise ValueError(f"chat template: {message}")


class ChatTemplate:
    def __init__(self, template_str: str):
        # HF-compat environment: real checkpoint templates reference
        # bos_token/eos_token, call raise_exception(), and use |tojson —
        # a bare jinja2.Template silently rendered undefined vars as ""
        # (corrupting the prompt) or raised at render time
        from jinja2 import Environment

        env = Environment()
        env.filters.setdefault("tojson", lambda v, **kw: json.dumps(v, **kw))
        env.globals["raise_exception"] = _raise_exception
        self.source = template_str
        self.template = env.from_string(template_str)

    def apply(
        self,
        messages: List[Dict[str, str]],
        add_generation_prompt: bool = True,
        **extra,
    ) -> str:
        ctx = {
            # common HF template globals; callers may override via extra
            "bos_token": "",
            "eos_token": "",
            "unk_token": "",
            "pad_token": "",
            "tools": None,
        }
        ctx.update(extra)
        return self.template.render(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            **ctx,
        )

    @staticmethod
    def from_file(path: str) -> "ChatTemplate":
        with open(path, "r", encoding="utf-8") as f:
            return ChatTemplate(f.read())

    @staticmethod
    def default() -> "ChatTemplate":
        return ChatTemplate(DEFAULT_TEMPLATE)


def find_chat_template(checkpoint_path: str) -> Optional[str]:
    """Walk up from the checkpoint looking for a shipped template
    (ref: chat_template.py:59-95)."""
    source = Path(checkpoint_path).expanduser()
    search_dir = source.parent if source.is_file() else source
    for _ in range(4):
        for name in ("chat_template.jinja", "chat_template.j2", "template.jinja"):
            path = search_dir / name
            if path.is_file():
                logger.info("chat_template: %s", path)
                return path.read_text(encoding="utf-8")
        tok_cfg = search_dir / "tokenizer_config.json"
        if tok_cfg.is_file():
            try:
                tmpl = json.loads(tok_cfg.read_text(encoding="utf-8")).get(
                    "chat_template")
            except (OSError, json.JSONDecodeError) as exc:
                logger.warning("Invalid tokenizer config %s: %s", tok_cfg, exc)
            else:
                if isinstance(tmpl, str) and tmpl.strip():
                    logger.info("chat_template: %s#chat_template", tok_cfg)
                    return tmpl
        parent = search_dir.parent
        if parent == search_dir:
            break
        search_dir = parent
    return None


def load_chat_template(checkpoint_path: Optional[str]) -> ChatTemplate:
    """Load the checkpoint's template, or the built-in default."""
    if checkpoint_path:
        tmpl = find_chat_template(checkpoint_path)
        if tmpl:
            return ChatTemplate(tmpl)
    return ChatTemplate.default()
