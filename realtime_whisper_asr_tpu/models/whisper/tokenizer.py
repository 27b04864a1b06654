"""Tokenizer abstraction for the Whisper text side.

The reference gets tokenization implicitly through faster-whisper/CTranslate2
(and probes ids in `先看这个，cursor不用看/token_id.py`). Here tokenization is
an explicit protocol with two implementations:

- ``HFTokenizer``: wraps a *locally available* transformers WhisperTokenizer
  (no network). Used when real checkpoints are present.
- ``MockTokenizer``: deterministic, dependency-free mapping (id -> "w<id>")
  for random-weight tests, golden streaming tests, and benchmarks. Encoding is
  the inverse, so encode(decode(ids)) == ids for in-vocab words.

Both expose the same surface: encode/decode plus ``split_to_word_tokens`` used
by DTW word-timestamp extraction (timestamps.py).
"""

from __future__ import annotations

from typing import Protocol, Sequence

from realtime_whisper_asr_tpu.models.whisper.config import WhisperConfig


class Tokenizer(Protocol):
    def encode(self, text: str) -> list[int]: ...

    def decode(self, ids: Sequence[int]) -> str: ...

    def split_to_word_tokens(self, ids: Sequence[int]) -> tuple[list[str], list[list[int]]]: ...


def _strip_special(ids: Sequence[int], cfg: WhisperConfig) -> list[int]:
    return [int(i) for i in ids if int(i) < cfg.eot]


class MockTokenizer:
    """Deterministic stand-in: token id k (< eot) is the word ``w<k>``."""

    def __init__(self, cfg: WhisperConfig):
        self.cfg = cfg

    def encode(self, text: str) -> list[int]:
        ids = []
        for w in text.split():
            if w.startswith("w") and w[1:].isdigit():
                ids.append(int(w[1:]) % self.cfg.eot)
            else:
                ids.append(sum(ord(c) for c in w) % self.cfg.eot)
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        toks = _strip_special(ids, self.cfg)
        return " ".join(f"w{i}" for i in toks)

    def split_to_word_tokens(self, ids: Sequence[int]):
        toks = _strip_special(ids, self.cfg)
        return [f" w{i}" for i in toks], [[i] for i in toks]


class HFTokenizer:
    """transformers.WhisperTokenizer(Fast) wrapper (local files only)."""

    def __init__(self, tok, cfg: WhisperConfig):
        self.tok = tok
        self.cfg = cfg

    @classmethod
    def from_dir(cls, path: str, cfg: WhisperConfig) -> "HFTokenizer":
        from transformers import WhisperTokenizerFast

        return cls(WhisperTokenizerFast.from_pretrained(path, local_files_only=True), cfg)

    def encode(self, text: str) -> list[int]:
        return self.tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self.tok.decode(_strip_special(ids, self.cfg))

    def split_to_word_tokens(self, ids: Sequence[int]):
        """Group token ids into space-delimited words (multibyte-safe decode)."""
        ids = _strip_special(ids, self.cfg)
        words: list[str] = []
        word_tokens: list[list[int]] = []
        cur: list[int] = []
        for tid in ids:
            cur.append(tid)
            text = self.tok.decode(cur)
            # flush when the accumulated piece decodes cleanly (no dangling bytes)
            if text and "�" not in text:
                if text.startswith(" ") and len(cur) > 1 and words:
                    # shouldn't happen (space starts a new group below)
                    pass
                words.append(text)
                word_tokens.append(cur)
                cur = []
        if cur:
            words.append(self.tok.decode(cur))
            word_tokens.append(cur)
        # merge pieces that don't start with a space into the previous word
        merged_w: list[str] = []
        merged_t: list[list[int]] = []
        for w, t in zip(words, word_tokens):
            if merged_w and not w.startswith(" "):
                merged_w[-1] += w
                merged_t[-1] += t
            else:
                merged_w.append(w)
                merged_t.append(t)
        return merged_w, merged_t

    def non_speech_ids(self) -> tuple[int, ...]:
        """Standard Whisper non-speech suppress list, computed from the vocab."""
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』') + (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
        )
        miscellaneous = set("♩♪♫♬♭♮♯")
        result = set()
        for symbol in symbols + list(miscellaneous):
            for tokens in [self.tok.encode(symbol, add_special_tokens=False),
                           self.tok.encode(" " + symbol, add_special_tokens=False)]:
                if len(tokens) == 1 or symbol in miscellaneous:
                    result.add(tokens[0])
        return tuple(sorted(result))


def get_tokenizer(cfg: WhisperConfig, checkpoint_dir: str | None = None) -> Tokenizer:
    if checkpoint_dir:
        try:
            return HFTokenizer.from_dir(checkpoint_dir, cfg)
        except Exception:
            pass
    return MockTokenizer(cfg)
