"""Text tokenizer: Qwen2 BPE via the HF ``tokenizers`` package.

Resolution order mirrors the reference (src/tokenizer/text.rs:55-124):
  1. direct path to a tokenizer.json file,
  2. directory containing tokenizer.json,
  3. directory with vocab.json + merges.txt -> rebuild the Qwen2Converter
     pipeline (NFC normalizer, split-regex + ByteLevel pre-tokenizer, BPE,
     ByteLevel post-processor/decoder),
  4. HuggingFace Hub (only when network access is available).
"""

from __future__ import annotations

import json
from pathlib import Path

from tokenizers import Tokenizer

# Python Qwen2Converter pre-tokenization regex (text.rs:8).
PRETOKENIZE_REGEX = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

DEFAULT_TOKENIZER_REPO = "Qwen/Qwen2-0.5B"


class TextTokenizer:
    def __init__(self, tokenizer: Tokenizer):
        self.tokenizer = tokenizer

        def _tid(token: str, fallback: int) -> int:
            # `or` would conflate a legitimate ID of 0 with a missing token.
            tid = tokenizer.token_to_id(token)
            return tid if tid is not None else fallback

        self.bos_token_id = _tid("<|im_start|>", 151644)
        self.eos_token_id = _tid("<|im_end|>", 151645)
        self.pad_token_id = _tid("<|endoftext|>", 151643)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_pretrained(cls, source: str | Path) -> "TextTokenizer":
        path = Path(source)
        if path.is_file():
            return cls.from_file(path)
        if (path / "tokenizer.json").exists():
            return cls.from_file(path / "tokenizer.json")
        if (path / "vocab.json").exists() and (path / "merges.txt").exists():
            return cls.from_vocab_and_merges(path)
        if path.is_dir():
            raise FileNotFoundError(
                f"No tokenizer files found in '{source}'. Expected tokenizer.json "
                "or vocab.json + merges.txt."
            )
        # Treat as a HF Hub repo id.
        try:
            from huggingface_hub import hf_hub_download

            file = hf_hub_download(str(source), "tokenizer.json")
            return cls.from_file(file)
        except Exception as e:  # noqa: BLE001 — surfaced with context
            raise FileNotFoundError(
                f"No local tokenizer at '{source}' and Hub download failed: {e}"
            ) from e

    @classmethod
    def from_file(cls, path: str | Path) -> "TextTokenizer":
        return cls(Tokenizer.from_file(str(path)))

    @classmethod
    def from_vocab_and_merges(cls, directory: str | Path) -> "TextTokenizer":
        """Rebuild the Qwen2 fast-tokenizer pipeline from slow-tokenizer files."""
        from tokenizers import decoders, models, normalizers, pre_tokenizers, processors

        directory = Path(directory)
        bpe = models.BPE.from_file(
            str(directory / "vocab.json"),
            str(directory / "merges.txt"),
            unk_token="<|endoftext|>",
            byte_fallback=False,
        )
        tok = Tokenizer(bpe)
        tok.normalizer = normalizers.NFC()
        tok.pre_tokenizer = pre_tokenizers.Sequence(
            [
                pre_tokenizers.Split(
                    pattern=__import__("tokenizers").Regex(PRETOKENIZE_REGEX),
                    behavior="isolated",
                    invert=False,
                ),
                pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
            ]
        )
        tok.post_processor = processors.ByteLevel(trim_offsets=False)
        tok.decoder = decoders.ByteLevel()

        config_path = directory / "tokenizer_config.json"
        if config_path.exists():
            _add_special_tokens_from_config(tok, config_path)
        return cls(tok)

    # -- encode / decode -----------------------------------------------------

    def encode(self, text: str) -> list[int]:
        return self.tokenizer.encode(text, add_special_tokens=False).ids

    def encode_with_special(self, text: str) -> list[int]:
        return [self.bos_token_id, *self.encode(text), self.eos_token_id]

    def encode_chat(self, text: str, role: str) -> list[int]:
        return self.encode(f"<|im_start|>{role}\n{text}<|im_end|>")

    def encode_for_tts(self, text: str) -> list[int]:
        ids = self.encode_chat(text, "user")
        ids.extend(self.encode("<|im_start|>assistant\n"))
        return ids

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        return [e.ids for e in self.tokenizer.encode_batch(texts, add_special_tokens=False)]

    def encode_padded(self, text: str, max_length: int) -> list[int]:
        """Truncate or left-pad with the pad token (text.rs:284-298)."""
        ids = self.encode(text)
        if len(ids) > max_length:
            return ids[:max_length]
        return [self.pad_token_id] * (max_length - len(ids)) + ids

    def decode(self, ids: list[int]) -> str:
        return self.tokenizer.decode(list(ids), skip_special_tokens=True)

    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size(with_added_tokens=True)

    def token_to_id(self, token: str) -> int | None:
        return self.tokenizer.token_to_id(token)

    def id_to_token(self, token_id: int) -> str | None:
        return self.tokenizer.id_to_token(token_id)


def _add_special_tokens_from_config(tok: Tokenizer, config_path: Path) -> None:
    from tokenizers import AddedToken

    config = json.loads(config_path.read_text())
    added = config.get("added_tokens_decoder")
    if not isinstance(added, dict):
        return
    specials = []
    for info in added.values():
        content = info.get("content")
        if not content or not info.get("special", False):
            continue
        specials.append(
            AddedToken(
                content,
                special=True,
                lstrip=info.get("lstrip", False),
                rstrip=info.get("rstrip", False),
                normalized=info.get("normalized", False),
                single_word=info.get("single_word", False),
            )
        )
    if specials:
        tok.add_special_tokens(specials)
