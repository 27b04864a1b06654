"""Fused audio-dedup feature extraction (on-device).

The reference computes a 5-dim feature vector per chunk in numpy — RMS,
spectral centroid, zero-crossing rate, 85 % rolloff, spectral bandwidth
(`audio_deduplicator.py:60-181`) — one FFT per mic chunk on the host. Here the
whole vector is ONE jitted JAX function (and batches of chunks are one call),
so the dedup gate costs a single device roundtrip.

Feature semantics match the reference: max-normalized 5-vector; cosine
similarity shifted to [0, 1] (`audio_deduplicator.py:183-207`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10


@functools.partial(jax.jit, static_argnames=("sampling_rate",))
def dedup_features(
    chunks: jnp.ndarray, sampling_rate: int = 16000, n_valid=None
) -> jnp.ndarray:
    """(B, N) float32 audio chunks -> (B, 5) max-normalized feature vectors.

    ``n_valid`` (traced scalar) marks the valid prefix when chunks are padded
    to a bucket length: RMS/ZCR normalize by the valid length; the spectral
    features see a zero-padded FFT (a finer interpolation of the same
    spectrum), which is consistent across same-bucket chunks — exactly what
    the cosine-similarity dedup gate compares.
    """
    chunks = chunks.astype(jnp.float32)
    b, n = chunks.shape
    denom = jnp.float32(n) if n_valid is None else jnp.maximum(n_valid, 1).astype(jnp.float32)
    rms = jnp.sqrt(jnp.sum(chunks * chunks, axis=-1) / denom)

    spec = jnp.abs(jnp.fft.rfft(chunks, axis=-1))
    freqs = jnp.fft.rfftfreq(n, 1.0 / sampling_rate).astype(jnp.float32)
    total = jnp.sum(spec, axis=-1) + _EPS
    centroid = jnp.sum(spec * freqs[None, :], axis=-1) / total

    signs = jnp.sign(chunks)
    zcr = jnp.sum(jnp.abs(jnp.diff(signs, axis=-1)) > 0, axis=-1) / denom

    energy = spec * spec
    cum = jnp.cumsum(energy, axis=-1)
    target = 0.85 * cum[:, -1:]
    rolloff_idx = jnp.argmax(cum >= target, axis=-1)
    rolloff = freqs[rolloff_idx]

    bandwidth = jnp.sqrt(
        jnp.sum(spec * jnp.square(freqs[None, :] - centroid[:, None]), axis=-1) / total
    )

    feats = jnp.stack([rms, centroid, zcr, rolloff, bandwidth], axis=-1)
    return feats / (jnp.max(jnp.abs(feats), axis=-1, keepdims=True) + _EPS)


def cosine_similarity01(a: np.ndarray, b: np.ndarray) -> float:
    """Cosine similarity mapped to [0, 1] (reference audio_deduplicator.py:183-207).

    NOTE: saturates near 1.0 for ANY pair of all-positive feature vectors —
    kept for reference parity, but the dedup gate uses relative_similarity."""
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < _EPS or nb < _EPS:
        return 0.0
    return float((np.dot(a, b) / (na * nb) + 1.0) / 2.0)


def relative_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """1 − mean relative per-dimension difference, in [0, 1].

    Unlike cosine on all-positive vectors (which saturates ≥0.93 for ANY two
    audio chunks), this separates cleanly: exact duplicates → 1.0, distinct
    speech chunks → ≤~0.85, speech vs silence → ~0.5."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(1.0 - np.mean(np.abs(a - b) / (np.abs(a) + np.abs(b) + 1e-6)))
