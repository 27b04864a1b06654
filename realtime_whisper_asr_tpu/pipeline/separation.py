"""Vocal-separation frontends: isolate speech before ASR.

Capability parity with `vocal_separation.py` (VocalSeparator base :18-44,
DemucsSeparator :47-222, SpleeterSeparator :225-300, SimpleFilterSeparator
:303-372, factory :375-409). TPU-first mapping (SURVEY.md §2.3):

- ``BandpassSeparator`` — the reference's shipped default (config
  ``method=filter``): 85–3400 Hz zero-phase band-pass as one jitted JAX FFT
  convolution (ops/dsp.py) instead of scipy filtfilt.
- ``DemucsSeparator`` — optional neural separation; gated on a local torch
  demucs being importable (no network). Degrades to passthrough otherwise.
- Every separator returns the ORIGINAL audio on any failure (reference
  :216-219) — separation must never kill the stream.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def overlap_windowed(fn, x: np.ndarray, block: int, overlap: int = 4096) -> np.ndarray:
    """Apply ``fn`` (same-length audio→audio) in ``block``-sized windows with
    linearly crossfaded ``overlap`` regions. Long offline inputs beyond a
    separator's largest jit bucket would otherwise mint a fresh multi-second
    XLA trace per distinct padded length and pay up to ~2× padding compute
    (CLAUDE.md: every jit input shape comes from a small bucket set); windows
    keep every device call inside the bucket set, and the crossfade hides the
    STFT edge effects at the joins."""
    n = len(x)
    step = block - overlap
    out = np.zeros(n, np.float32)
    acc = np.zeros(n, np.float32)
    ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
    for start in range(0, n, step):
        piece = np.asarray(fn(x[start : start + block]), np.float32)
        m = len(piece)
        w = np.ones(m, np.float32)
        if start > 0:
            w[: min(overlap, m)] = ramp[: min(overlap, m)]
        if start + m < n and m > overlap:
            w[-overlap:] *= ramp[::-1]
        out[start : start + m] += piece * w
        acc[start : start + m] += w
        if start + block >= n:
            break
    return out / np.maximum(acc, 1e-9)


class VocalSeparator:
    """Base: separate(chunk) -> vocals (same length/dtype)."""

    name = "none"

    def separate(self, audio: np.ndarray) -> np.ndarray:
        return audio

    def separate_stems(self, audio: np.ndarray) -> dict:
        """Two-stem split: {"vocals", "accompaniment"} (reference separators
        return a (vocals, background) pair — vocal_separation.py:195-213
        demucs, :280-293 spleeter 2stems). For mask/filter separators the
        accompaniment is the exact time-domain complement ``mix − vocals``:
        for an STFT-masked estimate ISTFT(S·m) the residual equals
        ISTFT(S·(1−m)) up to overlap-add reconstruction error, so no second
        network pass is needed."""
        x = np.asarray(audio, np.float32)
        vocals = np.asarray(self.separate(x), np.float32)
        return {"vocals": vocals, "accompaniment": x - vocals}

    def get_stats(self) -> dict:
        return getattr(self, "stats", {})


class BandpassSeparator(VocalSeparator):
    name = "filter"

    def __init__(self, low_hz: float = 85.0, high_hz: float = 3400.0, use_device: bool = True):
        self.low_hz = low_hz
        self.high_hz = high_hz
        self.use_device = use_device
        self.stats = {"processed": 0, "errors": 0}
        # bucket chunk lengths to keep the jitted op retrace-free
        self._buckets = [1024, 4096, 16384, 65536, 262144, 1048576]

    def separate(self, audio: np.ndarray) -> np.ndarray:
        self.stats["processed"] += 1
        try:
            x = np.asarray(audio, np.float32)
            n = len(x)
            if n < 64:
                return audio
            if self.use_device:
                import jax.numpy as jnp

                from realtime_whisper_asr_tpu.ops.dsp import bandpass_filter

                from realtime_whisper_asr_tpu.utils.transfer import device_get

                def one(seg: np.ndarray) -> np.ndarray:
                    m = len(seg)
                    nb = next(b for b in self._buckets if m <= b)
                    padded = np.zeros(nb, np.float32)
                    padded[:m] = seg
                    return device_get(
                        bandpass_filter(jnp.asarray(padded), self.low_hz, self.high_hz)
                    )[:m]

                if n <= self._buckets[-1]:
                    return one(x)
                # long offline files: windowed application keeps every device
                # call inside the bucket set (no per-length trace mint)
                return overlap_windowed(one, x, self._buckets[-1])
            # host fallback: frequency-domain brick-ish filter
            spec = np.fft.rfft(x)
            freqs = np.fft.rfftfreq(n, 1 / 16000)
            mask = ((freqs >= self.low_hz) & (freqs <= self.high_hz)).astype(np.float32)
            return np.fft.irfft(spec * mask, n).astype(np.float32)
        except Exception:
            self.stats["errors"] += 1
            logger.exception("bandpass separation failed; passing audio through")
            return audio


class DemucsSeparator(VocalSeparator):
    """Neural separation via a locally-installed demucs (torch). Optional."""

    name = "demucs"

    def __init__(self, model_name: str = "htdemucs", device: str = "cpu"):
        self.stats = {"processed": 0, "errors": 0, "available": False}
        self._model = None
        try:
            import torch  # noqa: F401
            from demucs.pretrained import get_model  # type: ignore

            self._model = get_model(model_name)
            self._model.to(device).eval()
            self._device = device
            self.stats["available"] = True
        except Exception:
            logger.warning("demucs unavailable; DemucsSeparator degrades to passthrough")

    @staticmethod
    def _resample(x: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
        """Demucs models are trained at their own samplerate (htdemucs:
        44100); feeding raw 16 kHz audio interprets it ~2.76x too slow and
        the 'vocals' stem is spectrally garbage. Shared io.wav resampler."""
        from realtime_whisper_asr_tpu.io.wav import resample_linear

        return resample_linear(np.asarray(x, np.float32), sr_from, sr_to)

    def _apply(self, audio: np.ndarray):
        """(stems tensor, model samplerate) at the MODEL's samplerate."""
        import torch
        from demucs.apply import apply_model  # type: ignore

        sr_model = int(getattr(self._model, "samplerate", 44100))
        up = self._resample(np.asarray(audio, np.float32), 16000, sr_model)
        wav = torch.from_numpy(up)[None].repeat(2, 1)[None]
        with torch.no_grad():
            stems = apply_model(self._model, wav.to(self._device))[0]
        return stems, sr_model

    def _back(self, stem: np.ndarray, sr_model: int, n_out: int) -> np.ndarray:
        out = self._resample(stem, sr_model, 16000)
        if len(out) < n_out:
            out = np.pad(out, (0, n_out - len(out)))
        return out[:n_out]

    def separate(self, audio: np.ndarray) -> np.ndarray:
        self.stats["processed"] += 1
        if self._model is None:
            return audio
        try:
            stems, sr_model = self._apply(audio)
            vocals_idx = self._model.sources.index("vocals")
            return self._back(stems[vocals_idx].mean(0).cpu().numpy(),
                              sr_model, len(audio))
        except Exception:
            self.stats["errors"] += 1
            return audio

    def separate_stems(self, audio: np.ndarray) -> dict:
        """All model stems by name (htdemucs: vocals/drums/bass/other —
        reference vocal_separation.py:195-213 sums the non-vocal stems into
        "background"; here each stem is kept, plus the summed accompaniment
        for 2-stem protocol parity). Passthrough complement when demucs is
        unavailable."""
        if self._model is None:
            return super().separate_stems(audio)
        try:
            stems, sr_model = self._apply(audio)
            out = {
                name: self._back(stems[i].mean(0).cpu().numpy(), sr_model, len(audio))
                for i, name in enumerate(self._model.sources)
            }
            acc = sum(v for k, v in out.items() if k != "vocals")
            out["accompaniment"] = np.asarray(acc, np.float32)
            return out
        except Exception:
            self.stats["errors"] += 1
            return super().separate_stems(audio)


def _pick(kw: dict, keys: tuple[str, ...]) -> dict:
    """Per-class kwarg filtering: callers (app.py) pass the whole config
    section; each separator takes only what it understands."""
    return {k: kw[k] for k in keys if k in kw}


def create_separator(method: Optional[str], **kw) -> Optional[VocalSeparator]:
    """Factory (reference vocal_separation.py:375-409): filter|demucs|neural|none."""
    if method in (None, "", "none", False):
        return None
    if method == "filter":
        return BandpassSeparator(**_pick(kw, ("low_hz", "high_hz", "use_device")))
    if method == "neural":
        from realtime_whisper_asr_tpu.models.separation_nn import NeuralSeparator

        weights = kw.get("weights")
        if weights:
            return NeuralSeparator.load_npz(weights,
                                            use_device=kw.get("use_device", True))
        return NeuralSeparator(
            **_pick(kw, ("params", "seed", "use_device", "variant"))
        )
    if method == "demucs":
        sep = DemucsSeparator(**_pick(kw, ("model_name", "device")))
        if not sep.stats["available"]:
            logger.warning("falling back to band-pass separator")
            return BandpassSeparator()
        return sep
    if method == "spleeter":
        # capability subsumed by the band-pass/demucs paths in this framework
        logger.warning("spleeter method maps to the band-pass separator here")
        return BandpassSeparator(**_pick(kw, ("low_hz", "high_hz", "use_device")))
    raise ValueError(f"unknown separation method {method!r}")
