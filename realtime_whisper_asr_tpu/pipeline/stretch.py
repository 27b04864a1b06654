"""Speech-rate audio normalization (time-stretch) + adaptive decode params.

Capability parity with `speech_rate_audio_processor.py`: fast/slow speech is
time-stretched toward normal (bounds 0.8–1.2, :83-96) before ASR using the
JAX phase vocoder (ops/dsp.py), and decode params adapt to measured rate
(fast → larger beam, slightly higher temperature, :214-237).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class SpeechRateAudioProcessor:
    def __init__(self, min_rate: float = 0.8, max_rate: float = 1.2,
                 normal_cps: float = 10.0, min_samples: int = 4096):
        self.min_rate = min_rate
        self.max_rate = max_rate
        self.normal_cps = normal_cps
        self.min_samples = min_samples
        self.stats = {"processed": 0, "stretched": 0, "errors": 0}

    def stretch_rate_for(self, measured_cps: Optional[float]) -> float:
        """>1 compresses (fast output), <1 expands. Bounded."""
        if not measured_cps or measured_cps <= 0:
            return 1.0
        rate = measured_cps / self.normal_cps
        return float(np.clip(rate, self.min_rate, self.max_rate))

    def process(self, audio: np.ndarray, measured_cps: Optional[float]) -> np.ndarray:
        """Normalize speech rate; returns original audio on any failure
        (reference's graceful-fallback contract, :216-219 analog)."""
        self.stats["processed"] += 1
        rate = self.stretch_rate_for(measured_cps)
        if abs(rate - 1.0) < 0.05 or len(audio) < self.min_samples:
            return audio
        try:
            import jax.numpy as jnp

            from realtime_whisper_asr_tpu.ops.dsp import time_stretch
            from realtime_whisper_asr_tpu.utils.transfer import device_get

            out = device_get(time_stretch(jnp.asarray(audio, jnp.float32), float(round(rate, 2))))
            self.stats["stretched"] += 1
            return out
        except Exception:
            self.stats["errors"] += 1
            return audio


class AdaptiveWhisperParams:
    """Decode-param adaptation by speech rate (reference :170-253)."""

    def __init__(self, base_beam_size: int = 1, base_temperature: float = 0.0):
        self.base_beam_size = base_beam_size
        self.base_temperature = base_temperature

    def get_transcribe_kwargs(self, rate_class: str) -> dict:
        if rate_class == "fast":
            return {
                "beam_size": min(self.base_beam_size + 2, 8),
                "temperature": min(self.base_temperature + 0.1, 1.0),
            }
        if rate_class == "slow":
            return {"beam_size": self.base_beam_size, "temperature": self.base_temperature}
        return {"beam_size": self.base_beam_size, "temperature": self.base_temperature}
