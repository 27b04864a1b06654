"""Silero-class streaming VAD as a JAX model (on-device, batchable).

The reference drives the torch.hub Silero JIT model per 512-sample frame
(`asr_components.py:96`). This is the TPU-native equivalent architecture —
spectral frontend → depthwise conv stack → GRU cell → sigmoid head — expressed
functionally so a whole batch of frames is one jitted ``lax.scan`` (amortizing
the host↔device hop that per-frame calls would pay on a tunneled chip).

Weights are random-initialized by default (no network access to fetch Silero's
training); ``load_npz``/``save_npz`` allow dropping in trained weights. The
``stateful_prob_fn`` adapter carries the GRU state across calls so the model
plugs into streaming.VADIterator like the energy VAD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FRAME = 512
N_BANDS = 32
HIDDEN = 32


def init_vad_params(key: jax.Array, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # mel-ish triangular bands over the 257-bin magnitude spectrum
    edges = np.linspace(0, 257, N_BANDS + 2).astype(int)
    fb = np.zeros((257, N_BANDS), np.float32)
    for m in range(N_BANDS):
        lo, mid, hi = edges[m], edges[m + 1], edges[m + 2]
        if mid > lo:
            fb[lo:mid, m] = np.linspace(0, 1, mid - lo, endpoint=False)
        if hi > mid:
            fb[mid:hi, m] = np.linspace(1, 0, hi - mid, endpoint=False)
    return {
        "filterbank": jnp.asarray(fb, dtype),
        "conv_w": (jax.random.normal(k1, (3, N_BANDS, 64)) * 0.1).astype(dtype),
        "conv_b": jnp.zeros((64,), dtype),
        "proj_w": (jax.random.normal(k2, (64, HIDDEN)) * 0.1).astype(dtype),
        "proj_b": jnp.zeros((HIDDEN,), dtype),
        "gru_wx": (jax.random.normal(k3, (HIDDEN, 3 * HIDDEN)) * 0.1).astype(dtype),
        "gru_wh": (jax.random.normal(k4, (HIDDEN, 3 * HIDDEN)) * 0.1).astype(dtype),
        "gru_b": jnp.zeros((3 * HIDDEN,), dtype),
        "head_w": (jax.random.normal(k5, (HIDDEN, 1)) * 0.1).astype(dtype),
        "head_b": jnp.zeros((1,), dtype),
    }


def _frame_features(params: dict, frames: jnp.ndarray) -> jnp.ndarray:
    """(N, 512) audio frames -> (N, N_BANDS) log band energies."""
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))  # (N, 257)
    bands = spec @ params["filterbank"]
    return jnp.log(bands + 1e-6)


def _gru_cell(params: dict, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    gates = x @ params["gru_wx"] + h @ params["gru_wh"] + params["gru_b"]
    r, z, n = jnp.split(gates, 3, axis=-1)
    r, z = jax.nn.sigmoid(r), jax.nn.sigmoid(z)
    n = jnp.tanh(n * r + (1 - r) * (x @ params["gru_wx"][:, 2 * HIDDEN :]))
    return (1 - z) * n + z * h


@functools.partial(jax.jit, static_argnums=())
def vad_scan(params: dict, frames: jnp.ndarray, h0: jnp.ndarray):
    """(N,512) frames + (HIDDEN,) state -> ((N,) probs, new state). One device call."""
    feats = _frame_features(params, frames)  # (N, B)
    # temporal conv over the frame sequence (causal, width 3)
    padded = jnp.pad(feats[None], ((0, 0), (2, 0), (0, 0)))
    conv = jax.lax.conv_general_dilated(
        padded, params["conv_w"], (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
    )[0]
    x = jax.nn.relu(conv + params["conv_b"])
    x = jax.nn.relu(x @ params["proj_w"] + params["proj_b"])

    def step(h, xt):
        h = _gru_cell(params, h, xt)
        p = jax.nn.sigmoid(h @ params["head_w"] + params["head_b"])[0]
        return h, p

    h, probs = jax.lax.scan(step, h0, x)
    return probs, h


class SileroLikeVAD:
    """Stateful adapter: matches the ``prob_fn(frames)->probs`` interface."""

    def __init__(self, params: dict | None = None, seed: int = 0):
        self.params = params if params is not None else init_vad_params(jax.random.PRNGKey(seed))
        self.reset()

    def reset(self):
        self.h = jnp.zeros((HIDDEN,), jnp.float32)

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        probs, self.h = vad_scan(self.params, jnp.asarray(frames, jnp.float32), self.h)
        return np.asarray(probs)

    def save_npz(self, path: str):
        np.savez(path, **{k: np.asarray(v) for k, v in self.params.items()})

    @classmethod
    def load_npz(cls, path: str) -> "SileroLikeVAD":
        data = np.load(path)
        return cls(params={k: jnp.asarray(data[k]) for k in data.files})
