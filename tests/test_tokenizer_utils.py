"""Tokenizer helpers + device utils tests (weight-free)."""

import jax
import pytest

from qwen3_tts_tpu.tokenizer import TextTokenizer
from qwen3_tts_tpu.utils import device as dev


def mock_tokenizer() -> TextTokenizer:
    """Tiny BPE with added specials (the reference's mock pattern,
    text.rs:24-52)."""
    from tokenizers import Tokenizer, AddedToken
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {c: i for i, c in enumerate("abcdefghij")}
    vocab["hello"] = 10
    vocab["world"] = 11
    tok = Tokenizer(WordLevel(vocab=vocab, unk_token="a"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(
        [AddedToken("<|im_start|>", special=True), AddedToken("<|im_end|>", special=True)]
    )
    return TextTokenizer(tok)


def test_encode_decode_roundtrip():
    t = mock_tokenizer()
    ids = t.encode("hello world")
    assert ids == [10, 11]
    assert "hello" in t.decode(ids)


def test_encode_with_special():
    t = mock_tokenizer()
    ids = t.encode_with_special("hello")
    assert ids[0] == t.bos_token_id
    assert ids[-1] == t.eos_token_id


def test_encode_chat_framing():
    t = mock_tokenizer()
    ids = t.encode_chat("hello", "user")
    im_start = t.token_to_id("<|im_start|>")
    im_end = t.token_to_id("<|im_end|>")
    assert ids[0] == im_start
    assert ids[-1] == im_end


def test_encode_padded_left_pads_and_truncates():
    t = mock_tokenizer()
    padded = t.encode_padded("hello world", 5)
    assert len(padded) == 5
    assert padded[:3] == [t.pad_token_id] * 3
    assert padded[3:] == [10, 11]
    truncated = t.encode_padded("hello world", 1)
    assert truncated == [10]


def test_encode_batch():
    t = mock_tokenizer()
    out = t.encode_batch(["hello", "world"])
    assert out == [[10], [11]]


def test_device_helpers():
    assert dev.parse_device("cpu").platform == "cpu"
    assert dev.parse_device("auto") is not None
    assert "cpu" in dev.device_info(dev.parse_device("cpu"))
    with pytest.raises(ValueError):
        dev.parse_device("cuda")
    dev.sync_device()  # no-op smoke
