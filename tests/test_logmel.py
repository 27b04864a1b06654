"""Numerical parity tests for the fused Pallas log-mel frontend.

Strategy per SURVEY.md §4: the reference ships zero tests; we gate the Pallas
kernel against (a) a plain-jnp rfft implementation and (b) the independent
``transformers.WhisperFeatureExtractor`` (numpy) implementation.

Tolerances are energy-aware: the kernel computes the DFT as f32 matmuls, whose
absolute error (~2e-6 of peak power) is negligible for ASR but becomes a large
*relative* error in mel bins 60+ dB below peak, i.e. near the −8-decade clamp
floor. We therefore require tight agreement on perceptually-relevant bins
(normalized output > 0.3 ⇔ within 4 decades of peak) and bounded error overall.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from realtime_whisper_asr_tpu.ops import (
    log_mel_spectrogram,
    log_mel_spectrogram_reference,
    mel_filterbank,
    HOP_LENGTH,
)

SR = 16000


def _speechy_audio(seconds: float, seed: int = 0) -> np.ndarray:
    """Synthetic speech-ish signal: AM-modulated harmonics + noise bursts."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t))
    sig = sig * env + 0.05 * rng.standard_normal(t.shape)
    return (0.5 * sig / np.max(np.abs(sig))).astype(np.float32)


def _assert_logmel_close(ours: np.ndarray, golden: np.ndarray):
    diff = np.abs(ours - golden)
    hot = golden > 0.3  # within ~4 decades of peak power
    assert hot.any()
    assert diff[hot].max() < 2e-2, f"hot-bin max diff {diff[hot].max()}"
    assert diff.mean() < 3e-3, f"mean diff {diff.mean()}"
    # Bins in the bottom decade above the clamp floor carry ~zero energy; the
    # f32-matmul DFT may disagree with the f64 FFT there by up to ~1 decade.
    assert diff.max() < 0.5, f"overall max diff {diff.max()}"


@pytest.mark.parametrize("seconds,n_mels", [(1.0, 80), (1.0, 128), (30.0, 80)])
def test_pallas_matches_jnp_reference(seconds, n_mels):
    audio = _speechy_audio(seconds)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels=n_mels))
    ref = log_mel_spectrogram_reference(audio, n_mels=n_mels)
    assert ours.shape == (len(audio) // HOP_LENGTH, n_mels)
    _assert_logmel_close(ours, ref)


def test_matches_transformers_feature_extractor():
    transformers = pytest.importorskip("transformers")
    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    audio = _speechy_audio(30.0, seed=1)
    golden = fe(audio, sampling_rate=SR, return_tensors="np")["input_features"][0]  # (80, 3000)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio), n_mels=80)).T
    assert ours.shape == golden.shape
    _assert_logmel_close(ours, golden)


def test_mel_filterbank_properties():
    fb = mel_filterbank(80, 400)
    assert fb.shape == (80, 201)
    assert np.all(fb >= 0)
    # Triangles overlap: every interior FFT bin inside the passband is covered.
    coverage = fb.sum(axis=0)
    assert np.all(coverage[3:-3] > 0)


def test_silence_is_constant_floor():
    audio = np.zeros(SR, dtype=np.float32)
    out = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    assert np.allclose(out, out.flat[0])
