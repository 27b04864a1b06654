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

    def _bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        # grow beyond the precomputed set (long offline files): next power of two
        size = self._buckets[-1]
        while size < n:
            size *= 2
        return size

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

                nb = self._bucket(n)
                padded = np.zeros(nb, np.float32)
                padded[:n] = x
                out = device_get(
                    bandpass_filter(jnp.asarray(padded), self.low_hz, self.high_hz)
                )[:n]
                return out
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
        """Linear-interpolation resample — demucs models are trained at
        their own samplerate (htdemucs: 44100); feeding raw 16 kHz audio
        interprets it ~2.76x too slow and the 'vocals' stem is spectrally
        garbage. Linear interp is adequate for the ≤8 kHz speech band."""
        if sr_from == sr_to or len(x) == 0:
            return np.asarray(x, np.float32)
        n_out = int(round(len(x) * sr_to / sr_from))
        return np.interp(
            np.linspace(0.0, len(x) - 1.0, n_out), np.arange(len(x)), x
        ).astype(np.float32)

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
