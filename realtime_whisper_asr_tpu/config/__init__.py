"""JSON config system with per-language overrides."""

from realtime_whisper_asr_tpu.config.manager import ConfigManager, DEFAULT_CONFIG
