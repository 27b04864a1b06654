"""On-device neural vocal separation: spectral-mask network in JAX.

The reference's neural separation is torch Demucs / TF Spleeter
(`vocal_separation.py:47-300`) — heavyweight source-separation models driven
per mic chunk. The TPU-native equivalent here is a compact spectral-masking
network (the Spleeter family's architecture class): STFT magnitude → conv
encoder/decoder over (time, freq) → sigmoid vocal mask → masked iSTFT. One
jitted call per (bucketed) chunk; weights random-init by default (no network
access) with npz load/save for trained weights — the band-pass separator
(pipeline.separation) remains the weight-free default.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 1024
HOP = 256
F_BINS = N_FFT // 2 + 1  # 513
_CH = (16, 32, 16)

_PACKAGED_WEIGHTS = os.path.join(
    os.path.dirname(__file__), "weights", "separation_nn.npz"
)


def init_separator_params(key: jax.Array, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 2 * len(_CH) + 2)
    params: dict = {}
    c_in = 1
    for i, c in enumerate(_CH):
        params[f"enc{i}_w"] = (jax.random.normal(keys[i], (3, 3, c_in, c)) * 0.1).astype(dtype)
        params[f"enc{i}_b"] = jnp.zeros((c,), dtype)
        c_in = c
    params["out_w"] = (jax.random.normal(keys[-1], (3, 3, c_in, 1)) * 0.1).astype(dtype)
    params["out_b"] = jnp.zeros((1,), dtype)
    return params


def _stft(audio: jnp.ndarray):
    window = jnp.asarray(np.hanning(N_FFT).astype(np.float32))
    pad = N_FFT // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - N_FFT) // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    return jnp.fft.rfft(x[idx] * window, axis=-1), window  # (T, F)


def _istft(spec: jnp.ndarray, window: jnp.ndarray, out_len: int):
    frames = jnp.fft.irfft(spec, N_FFT, axis=-1) * window
    n_frames = spec.shape[0]
    out = jnp.zeros(n_frames * HOP + N_FFT, jnp.float32)
    acc = jnp.zeros_like(out)
    pos = jnp.arange(n_frames) * HOP
    out = out.at[pos[:, None] + jnp.arange(N_FFT)[None, :]].add(frames)
    acc = acc.at[pos[:, None] + jnp.arange(N_FFT)[None, :]].add(window * window)
    out = out / jnp.maximum(acc, 1e-6)
    pad = N_FFT // 2
    return out[pad : pad + out_len]


@functools.partial(jax.jit, static_argnames=())
def separate_vocals(params: dict, audio: jnp.ndarray) -> jnp.ndarray:
    """(N,) float32 -> vocals (N,). Static per input length (callers bucket)."""
    spec, window = _stft(audio.astype(jnp.float32))
    mag = jnp.log1p(jnp.abs(spec))  # (T, F)
    x = mag[None, :, :, None]  # NHWC over (time, freq)
    dn = ("NHWC", "HWIO", "NHWC")
    for i in range(len(_CH)):
        x = jax.lax.conv_general_dilated(
            x, params[f"enc{i}_w"].astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn
        )
        x = jax.nn.relu(x + params[f"enc{i}_b"])
    x = jax.lax.conv_general_dilated(
        x, params["out_w"].astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn
    )
    mask = jax.nn.sigmoid(x[0, :, :, 0] + params["out_b"][0])  # (T, F)
    return _istft(spec * mask.astype(spec.dtype), window, audio.shape[0])


class NeuralSeparator:
    """pipeline.separation-compatible vocal separator (method name: neural)."""

    name = "neural"

    def __init__(self, params: dict | None = None, seed: int = 0):
        self.trained = False
        if params is None and os.path.exists(_PACKAGED_WEIGHTS):
            data = np.load(_PACKAGED_WEIGHTS)
            params = {k: jnp.asarray(data[k]) for k in data.files}
            self.trained = True
        self.params = params if params is not None else init_separator_params(
            jax.random.PRNGKey(seed)
        )
        self.stats = {"processed": 0, "errors": 0}
        self._buckets = [16384, 65536, 262144, 524288]

    def separate(self, audio: np.ndarray) -> np.ndarray:
        self.stats["processed"] += 1
        try:
            x = np.asarray(audio, np.float32)
            n = len(x)
            if n < N_FFT:
                return audio
            nb = next((b for b in self._buckets if n <= b), self._buckets[-1])
            padded = np.zeros(nb, np.float32)
            padded[:n] = x[:nb]
            out = np.asarray(separate_vocals(self.params, jnp.asarray(padded)))
            return out[:n]
        except Exception:
            self.stats["errors"] += 1
            return audio

    def save_npz(self, path: str):
        np.savez(path, **{k: np.asarray(v) for k, v in self.params.items()})

    @classmethod
    def load_npz(cls, path: str) -> "NeuralSeparator":
        data = np.load(path)
        return cls(params={k: jnp.asarray(data[k]) for k in data.files})

    def get_stats(self) -> dict:
        return self.stats
