"""Whisper log-mel frontend as a fused Pallas TPU kernel.

Replaces the CTranslate2 / librosa log-mel pipeline the reference drives through
faster-whisper (SURVEY.md §2.3; reference `asr_components.py:267-289` is where
audio enters the native frontend). TPU-first design:

- framing is one XLA gather (hop 160, frame 400, reflect-padded center mode),
- the STFT is two MXU matmuls against real-DFT bases with the Hann window
  folded into the bases (``frames @ (w·cos)``),
- power, mel projection (a third matmul), and log compression are fused into a
  single Pallas kernel, tiled over frame blocks with 128-lane-aligned shapes.

The final Whisper normalization (clamp to global-max − 8, then ``(x+4)/4``)
is a cheap global reduction left to XLA after the kernel. Padded frames are
all-zero and produce exactly the log floor (−10), so they cannot perturb the
global max (real frames are ≥ the floor); padded mel columns are sliced off.

``log_mel_spectrogram_reference`` is a direct jnp implementation (rfft-based)
used for numerical parity tests against the kernel and against
``transformers.WhisperFeatureExtractor``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtime_whisper_asr_tpu.ops import mel as melmod

N_FFT = 400
HOP_LENGTH = 160
_LOG_FLOOR = 1e-10
_BLOCK_T = 256


def _num_frames(n_samples: int) -> int:
    # center-padded STFT yields 1 + n//hop frames; Whisper drops the last one.
    return n_samples // HOP_LENGTH


def _frame_audio(audio: jnp.ndarray) -> jnp.ndarray:
    """(n,) float32 -> (n//hop, N_FFT) frames, reflect-padded center mode."""
    n = audio.shape[0]
    pad = N_FFT // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = _num_frames(n)
    idx = jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    return padded[idx]


def log_mel_spectrogram_reference(audio, n_mels: int = 80) -> np.ndarray:
    """Numpy float64 Whisper log-mel oracle, shape (n_frames, n_mels).

    Host-side golden used only by parity tests (XLA's CPU rfft is slow to
    compile and f32; this is exact semantics at f64).
    """
    audio = np.asarray(audio, dtype=np.float64)
    pad = N_FFT // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = _num_frames(audio.shape[0])
    idx = np.arange(n_frames)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = padded[idx] * melmod.hann_window(N_FFT).astype(np.float64)
    spec = np.fft.rfft(frames, axis=-1)
    power = spec.real**2 + spec.imag**2
    mel = power @ melmod.mel_filterbank(n_mels, N_FFT).astype(np.float64).T
    log_spec = np.log10(np.maximum(mel, _LOG_FLOOR))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def _logmel_kernel(frames_ref, cosw_ref, sinw_ref, melt_ref, out_ref):
    f = frames_ref[:]
    re = jnp.dot(f, cosw_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, sinw_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, melt_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.maximum(mel, _LOG_FLOOR)) * np.float32(1.0 / np.log(10.0))


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def _logmel_pallas(audio: jnp.ndarray, n_mels: int, interpret: bool) -> jnp.ndarray:
    window, cos_p, sin_p, mel_t, (frame_pad, freq_pad, mel_pad) = (
        melmod.fused_frontend_matrices(n_mels, N_FFT)
    )
    # Fold the Hann window into the DFT bases: frames @ diag(w) @ C == frames @ (w·C).
    cosw = jnp.asarray(window[:, None] * cos_p)
    sinw = jnp.asarray(window[:, None] * sin_p)
    melt = jnp.asarray(mel_t)

    frames = _frame_audio(audio.astype(jnp.float32))
    n_frames = frames.shape[0]
    t_pad = ((n_frames + _BLOCK_T - 1) // _BLOCK_T) * _BLOCK_T
    frames = jnp.pad(frames, ((0, t_pad - n_frames), (0, frame_pad - N_FFT)))

    grid = (t_pad // _BLOCK_T,)
    out = pl.pallas_call(
        _logmel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_T, frame_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_pad, freq_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_pad, freq_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((freq_pad, mel_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_T, mel_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, mel_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * frame_pad * freq_pad * 2 + 2 * t_pad * freq_pad * mel_pad,
            bytes_accessed=4 * (t_pad * frame_pad + 2 * frame_pad * freq_pad + freq_pad * mel_pad + t_pad * mel_pad),
            transcendentals=t_pad * mel_pad,
        ),
        interpret=interpret,
    )(frames, cosw, sinw, melt)

    log_spec = out[:n_frames, :n_mels]
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """Fused-Pallas Whisper log-mel, shape (n_frames, n_mels), float32 in [~-1, 1.x].

    ``n_frames = len(audio) // 160``. Input length must be a multiple of 160 and
    static under jit (callers bucket/pad audio; see models.whisper.transcribe).
    Falls back to interpreter mode off-TPU so CPU tests exercise the same kernel.
    """
    interpret = jax.default_backend() != "tpu"
    return _logmel_pallas(audio, n_mels, interpret)
