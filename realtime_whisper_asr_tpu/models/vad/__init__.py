"""Streaming VAD models: DSP energy VAD (host) and conv-GRU VAD (JAX, on-device)."""

from realtime_whisper_asr_tpu.models.vad.energy import EnergyVAD
from realtime_whisper_asr_tpu.models.vad.silero_like import SileroLikeVAD
