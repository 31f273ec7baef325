"""Rolling-summary context manager tests
(ref: tests/test_context_manager.py, core/context_manager.py)."""

import pytest

from vllm_i64_tpu.core.chat_template import ChatTemplate
from vllm_i64_tpu.core.context_manager import (
    ContextManager,
    ContextWindowError,
)
from vllm_i64_tpu.core.tokenizer import ByteTokenizer


def make_cm(max_seq_len=512, **kw):
    tok = ByteTokenizer()
    tmpl = ChatTemplate.default()
    return ContextManager(
        encode=tok.encode,
        decode=tok.decode,
        render=lambda msgs: tmpl.apply(msgs, add_generation_prompt=True),
        max_seq_len=max_seq_len,
        **kw,
    )


def msgs_of_size(n_turns, chars_per_msg=100):
    out = [{"role": "system", "content": "You are helpful."}]
    for i in range(n_turns):
        out.append({"role": "user", "content": f"question {i} " + "x" * chars_per_msg})
        out.append({"role": "assistant", "content": f"answer {i} " + "y" * chars_per_msg})
    return out


def test_fits_verbatim_when_small():
    cm = make_cm(max_seq_len=2048)
    messages = msgs_of_size(2, 50)
    plan = cm.fit(messages, max_output_tokens=100)
    assert not plan.compressed
    assert plan.retained_messages == len(messages)
    assert plan.dropped_messages == 0
    assert plan.prompt_tokens <= 2048 - 100


def test_budget_always_respected():
    cm = make_cm(max_seq_len=512)
    for n in (2, 5, 10, 20):
        plan = cm.fit(msgs_of_size(n, 120), max_output_tokens=128)
        assert plan.prompt_tokens <= 512 - 128, n


def test_compression_keeps_recent_turns_verbatim():
    cm = make_cm(max_seq_len=600)
    messages = msgs_of_size(8, 100)
    plan = cm.fit(messages, max_output_tokens=64)
    assert plan.compressed
    # the newest user question must survive verbatim in the prompt
    assert "question 7" in plan.prompt
    # older turns are summarized or dropped
    assert plan.summarized_messages + plan.dropped_messages > 0


def test_summary_message_injected_as_system():
    cm = make_cm(max_seq_len=700)
    plan = cm.fit(msgs_of_size(10, 80), max_output_tokens=64)
    roles = [m["role"] for m in plan.messages]
    assert "system" in roles
    summary_msgs = [m for m in plan.messages
                    if m["content"].startswith("Conversation summary")]
    if plan.summarized_messages:
        assert summary_msgs


def test_deterministic():
    cm = make_cm(max_seq_len=600)
    messages = msgs_of_size(8, 100)
    p1 = cm.fit(messages, max_output_tokens=64)
    p2 = cm.fit(messages, max_output_tokens=64)
    assert p1.prompt == p2.prompt
    assert p1.to_metrics() == p2.to_metrics()


def test_essential_truncation_last_resort():
    cm = make_cm(max_seq_len=256)
    huge = [{"role": "user", "content": "z" * 5000}]
    plan = cm.fit(huge, max_output_tokens=32)
    assert plan.prompt_tokens <= 256 - 32
    # head and tail preserved around the truncation marker
    assert plan.messages[0]["content"].startswith("z")
    assert plan.messages[0]["content"].endswith("z")
    assert "[…]" in plan.messages[0]["content"]


def test_raises_when_nothing_fits():
    cm = make_cm(max_seq_len=64)
    with pytest.raises(ContextWindowError):
        cm.fit(msgs_of_size(1), max_output_tokens=64)  # no prompt room
    with pytest.raises(ContextWindowError):
        cm.fit([], max_output_tokens=8)
    with pytest.raises(ContextWindowError):
        cm.fit(msgs_of_size(1), max_output_tokens=0)


def test_metrics_shape():
    cm = make_cm(max_seq_len=600)
    plan = cm.fit(msgs_of_size(8, 100), max_output_tokens=64)
    m = plan.to_metrics()
    for key in ("compressed", "original_tokens", "prompt_tokens",
                "tokens_saved", "summarized_messages", "dropped_messages",
                "available_prompt_tokens"):
        assert key in m
    assert m["tokens_saved"] == m["original_tokens"] - m["prompt_tokens"]


def test_non_string_content_normalized():
    cm = make_cm()
    plan = cm.fit([{"role": "user", "content": 42},
                   {"role": "user", "content": None}], max_output_tokens=16)
    assert plan.prompt_tokens > 0
