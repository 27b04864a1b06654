"""Real-checkpoint path coverage: on-disk HF dirs, tokenizer files, alignment
heads — the exact code that runs the first time a real checkpoint appears
(reference analog: faster-whisper model dirs under models_fast/,
`/root/reference/一键实时识别麦克风.py:1097,1115`)."""

import json
import os

import numpy as np
import pytest

from realtime_whisper_asr_tpu.models import whisper as W
from realtime_whisper_asr_tpu.models.whisper.tokenizer import (
    BPETokenizer,
    HFTokenizer,
    get_tokenizer,
)
from tests.test_tokenizer import byte_vocab_with_merges

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _hf_dir(tmp_path, alignment_heads=None):
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
    )
    torch.manual_seed(0)
    model = transformers.WhisperModel(hf_cfg)
    path = tmp_path / "hf_ckpt"
    model.save_pretrained(str(path), safe_serialization=True)
    if alignment_heads is not None:
        with open(path / "generation_config.json", "w") as f:
            json.dump({"alignment_heads": alignment_heads}, f)
    return str(path), model


def test_load_checkpoint_dir_from_disk_safetensors(tmp_path):
    import jax.numpy as jnp

    path, model = _hf_dir(tmp_path)
    cfg, params = W.load_checkpoint_dir(path, dtype=jnp.float32)
    assert cfg.n_audio_state == 64 and cfg.n_text_layer == 2
    # weights actually round-tripped through safetensors, not re-initialized
    got = np.asarray(params["decoder"]["tok_emb"])
    want = model.state_dict()["decoder.embed_tokens.weight"].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_asr_from_hf_dir_loads_alignment_heads_and_transcribes(tmp_path):
    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.asr import TPUWhisperASR

    path, _ = _hf_dir(tmp_path, alignment_heads=[[1, 0], [1, 1]])
    asr = TPUWhisperASR(checkpoint_dir=path, dtype=jnp.float32, language="en")
    assert asr.alignment_heads is not None
    assert asr.alignment_heads.shape == (2, 2)
    np.testing.assert_array_equal(asr.alignment_heads, [[0.0, 0.0], [1.0, 1.0]])
    rng = np.random.default_rng(0)
    segs = asr.transcribe(rng.standard_normal(16000 * 2).astype(np.float32) * 0.1)
    assert isinstance(segs.tokens, list)  # decoded end-to-end from disk weights


def test_alignment_heads_malformed_is_none(tmp_path):
    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.asr import TPUWhisperASR

    path, _ = _hf_dir(tmp_path)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        f.write("{not json")
    asr = TPUWhisperASR(checkpoint_dir=path, dtype=jnp.float32)
    assert asr.alignment_heads is None


def _write_tokenizer_fixture(path):
    from realtime_whisper_asr_tpu.models.whisper.bpe import write_vocab_files

    vocab, merges = byte_vocab_with_merges()
    write_vocab_files(str(path), vocab, merges)


def test_hf_tokenizer_from_dir_slow_fallback(tmp_path):
    """WhisperTokenizer (slow) loads from bare vocab.json/merges.txt; the fast
    path needs tokenizer.json — from_dir must fall back, not crash."""
    _write_tokenizer_fixture(tmp_path)
    cfg = W.get_config("tiny")
    tok = HFTokenizer.from_dir(str(tmp_path), cfg)
    ids = tok.encode(" hello")
    assert ids == [260]  # full merge chain via transformers
    assert tok.decode(ids) == " hello"
    words, _ = tok.split_to_word_tokens(tok.encode("你好"), language="zh")
    assert words == ["你", "好"]


def test_checkpoint_dir_with_vocab_gets_real_tokenizer(tmp_path):
    """An HF checkpoint dir shipping vocab/merges must yield the BPE tokenizer,
    never the mock — the first real checkpoint load is not the first run."""
    path, _ = _hf_dir(tmp_path)
    _write_tokenizer_fixture(path)
    tok = get_tokenizer(W.get_config("tiny"), path)
    assert isinstance(tok, BPETokenizer)
