"""Tokenizer + chat template tests (ref: core/tokenizer.py, core/chat_template.py)."""

import json

from vllm_i64_tpu.core.chat_template import ChatTemplate, load_chat_template
from vllm_i64_tpu.core.tokenizer import (
    ByteTokenizer,
    Tokenizer,
    load_tokenizer,
    load_tokenizer_or_fallback,
)


def make_wordlevel_tokenizer(tmp_path):
    """Build a tiny real HF tokenizer file for tests."""
    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"</s>": 0, "<pad>": 1, "<s>": 2, "hello": 3, "world": 4,
             "the": 5, "cat": 6, "[UNK]": 7}
    tok = HFTokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(["</s>", "<pad>", "<s>"])
    path = tmp_path / "tokenizer.json"
    tok.save(str(path))
    return path


def test_byte_tokenizer_roundtrip():
    bt = ByteTokenizer()
    text = "Hello, TPU! ünïcode 漢字"
    ids = bt.encode(text)
    assert all(3 <= i < 259 for i in ids)
    assert bt.decode(ids) == text
    assert bt.eos_token_id == 0 and bt.pad_token_id == 1 and bt.bos_token_id == 2


def test_hf_tokenizer_wrapper(tmp_path):
    path = make_wordlevel_tokenizer(tmp_path)
    tok = Tokenizer(str(path))
    assert tok.eos_token_id == 0
    assert tok.bos_token_id == 2
    assert tok.pad_token_id == 1
    ids = tok.encode("hello world")
    assert ids == [3, 4]


def test_eos_stripped_on_encode(tmp_path):
    path = make_wordlevel_tokenizer(tmp_path)
    tok = Tokenizer(str(path))
    # "hello </s>" encodes ending in EOS; wrapper must strip it
    ids = tok.encode("hello </s>")
    assert ids == [3]


def test_load_tokenizer_discovery(tmp_path):
    make_wordlevel_tokenizer(tmp_path)
    tok = load_tokenizer(str(tmp_path))
    assert tok is not None and tok.vocab_size == 8
    assert load_tokenizer("/nonexistent/path") is None
    fb = load_tokenizer_or_fallback("/nonexistent/path")
    assert isinstance(fb, ByteTokenizer)


def test_default_chat_template():
    ct = ChatTemplate.default()
    out = ct.apply(
        [{"role": "system", "content": "be brief"},
         {"role": "user", "content": "hi"}],
        add_generation_prompt=True,
    )
    assert "be brief" in out and "hi" in out
    assert out.rstrip().endswith("<|assistant|>")
    out2 = ct.apply([{"role": "user", "content": "hi"}], add_generation_prompt=False)
    assert "<|assistant|>" not in out2


def test_chat_template_from_tokenizer_config(tmp_path):
    tmpl = "{% for m in messages %}[{{ m['role'] }}]{{ m['content'] }}{% endfor %}"
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"chat_template": tmpl}))
    ct = load_chat_template(str(tmp_path))
    assert ct.source == tmpl
    assert ct.apply([{"role": "user", "content": "x"}]) == "[user]x"


def test_chat_template_jinja_file_priority(tmp_path):
    (tmp_path / "chat_template.jinja").write_text("FILE:{{ messages[0]['content'] }}")
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"chat_template": "CFG"}))
    ct = load_chat_template(str(tmp_path))
    assert ct.apply([{"role": "user", "content": "z"}]) == "FILE:z"
