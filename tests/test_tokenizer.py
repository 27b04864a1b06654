"""Self-contained BPE + unicode-aware word splitting (zh/ja word grouping).

The reference relies on faster-whisper's GPT-2 BPE and CJK-aware ts_words
(`/root/reference/asr_components.py:291-297`); these tests lock the native
equivalents: vocab.json/merges.txt loading without transformers, byte-level
round-trips for CJK text, and per-character word grouping for space-less
languages so word-level LocalAgreement commits keep word granularity.
"""

import numpy as np
import pytest

from realtime_whisper_asr_tpu.models import whisper as W
from realtime_whisper_asr_tpu.models.whisper.bpe import BPE, bytes_to_unicode, write_vocab_files
from realtime_whisper_asr_tpu.models.whisper.tokenizer import (
    BPETokenizer,
    MockTokenizer,
    get_tokenizer,
    split_tokens_on_unicode,
    split_words,
)

CFG = W.get_config("tiny")


def byte_vocab_with_merges():
    """256 byte tokens + a few English merges ('Ġ'='space' in GPT-2 coding)."""
    table = bytes_to_unicode()
    vocab = {table[b]: b for b in range(256)}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"), ("Ġ", "hello")]
    nid = 256
    for a, b in merges:
        vocab[a + b] = nid
        nid += 1
    return vocab, merges


@pytest.fixture()
def bpe_dir(tmp_path):
    vocab, merges = byte_vocab_with_merges()
    write_vocab_files(str(tmp_path), vocab, merges)
    return str(tmp_path)


def test_bpe_roundtrip_ascii_and_cjk(bpe_dir):
    bpe = BPE.from_dir(bpe_dir)
    for text in ("hello world", " hello", "你好世界", "mixed 中文 and english.", "¡ñé!"):
        assert bpe.decode(bpe.encode(text)) == text


def test_bpe_merges_apply(bpe_dir):
    bpe = BPE.from_dir(bpe_dir)
    ids = bpe.encode(" hello")
    assert ids == [bpe.vocab["Ġhello"]]  # full merge chain applied
    # unmerged text falls back to byte tokens
    assert len(bpe.encode("xyz")) == 3


def test_byte_fallback_needs_no_files():
    bpe = BPE.byte_fallback()
    assert bpe.decode(bpe.encode("任意 text 123")) == "任意 text 123"
    assert len(bpe.encode("你")) == 3  # 3 utf-8 bytes, no merges


def test_split_tokens_on_unicode_regroups_multibyte(bpe_dir):
    bpe = BPE.from_dir(bpe_dir)
    ids = bpe.encode("你好")
    assert len(ids) == 6  # 2 chars x 3 bytes
    pieces, piece_tokens = split_tokens_on_unicode(ids, bpe.decode)
    assert pieces == ["你", "好"]
    assert [len(t) for t in piece_tokens] == [3, 3]
    assert all("�" not in p for p in pieces)


def test_split_words_zh_per_character(bpe_dir):
    """zh: each unicode group is a word — a segment must NOT collapse into one
    word (that breaks word-level commits for exactly the reference's primary
    language, config.json zh block)."""
    tok = BPETokenizer.from_dir(bpe_dir, CFG)
    ids = tok.encode("你好世界")
    words, word_tokens = tok.split_to_word_tokens(ids, language="zh")
    assert words == ["你", "好", "世", "界"]
    assert sum(len(t) for t in word_tokens) == len(ids)


def test_split_words_en_spaces_and_punctuation(bpe_dir):
    tok = BPETokenizer.from_dir(bpe_dir, CFG)
    ids = tok.encode(" hello world.")
    words, word_tokens = tok.split_to_word_tokens(ids, language="en")
    assert words == [" hello", " world", "."]
    assert sum(len(t) for t in word_tokens) == len(ids)


def test_split_words_ja_unicode_groups():
    bpe = BPE.byte_fallback()
    ids = bpe.encode("こんにちは")
    words, _ = split_words(ids, bpe.decode, language="ja")
    assert words == list("こんにちは")


def test_get_tokenizer_prefers_bpe_dir(bpe_dir, tmp_path):
    tok = get_tokenizer(CFG, bpe_dir)
    assert isinstance(tok, BPETokenizer)
    empty = tmp_path / "empty"
    empty.mkdir()
    assert isinstance(get_tokenizer(CFG, str(empty)), MockTokenizer)
    assert isinstance(get_tokenizer(CFG, None), MockTokenizer)


def test_non_speech_ids_from_vocab(bpe_dir):
    tok = BPETokenizer.from_dir(bpe_dir, CFG)
    ids = tok.non_speech_ids()
    bpe = tok.bpe
    # single-byte symbols must be present
    for sym in "#()*+/:":
        assert bpe.encode(sym)[0] in ids


def test_word_timestamps_zh_word_granularity(bpe_dir):
    """DTW word times for zh must come out per character group, not one blob."""
    from realtime_whisper_asr_tpu.models.whisper import timestamps as TS

    tok = BPETokenizer.from_dir(bpe_dir, CFG)
    ids = tok.encode("你好世界")  # 12 byte tokens
    n_frames = 300
    xattn = np.zeros((len(ids), 1500))
    for i in range(len(ids)):
        center = int((i + 0.5) * n_frames / len(ids))
        xattn[i, max(0, center - 4) : center + 4] = 1.0
    words = TS.word_timestamps(ids, xattn, tok, n_frames, language="zh")
    assert [w for _, _, w in words] == ["你", "好", "世", "界"]
    begs = [b for b, _, _ in words]
    assert begs == sorted(begs)
