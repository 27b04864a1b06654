"""ConfigManager: JSON config with defaults-merge, validation, dotted paths,
and three-level precedence (language-specific > file > DEFAULT_CONFIG).

Parity with the reference config system (`config_manager.py:13-281`,
`config.json`): recursive default-merge (:94-132), range-clamping validation
with warnings (:134-182), dotted get/set (:184-226), and
``get_language_specific_config`` merging ``language_specific.<lang>`` blocks
over the base config (:252-281). The shipped per-language blocks cover the
same 18 languages the reference tunes.
"""

from __future__ import annotations

import copy
import json
import logging
import os
from typing import Any, Optional

logger = logging.getLogger(__name__)

DEFAULT_CONFIG: dict[str, Any] = {
    "model": {
        "size": "base",
        "checkpoint_dir": None,
        "dtype": "bfloat16",
        "quantization": None,  # None | "int8" (decoder weight-only)
        "beam_size": 1,
        "word_timestamps": True,
        # anti-hallucination guard: cap each window's transcript at
        # 8 + rate x window_seconds tokens (real speech ~3-4 tokens/s);
        # None disables. See asr.TPUWhisperASR.max_tokens_per_second.
        "max_tokens_per_second": None,
    },
    "streaming": {
        "agreement_n": 2,
        "prefix_policy": "agree2",  # agree2 | last (SimulStreaming-style)
        "buffer_trimming_way": "segment",  # segment | sentence
        "buffer_trimming_sec": 15.0,
        "dynamic_buffer": False,
        "prompt_chars": 300,
        "online_chunk_size": 0.5,
        "min_chunk_seconds": 1.0,
    },
    "vad": {
        "enable": True,
        "backend": "silero_like",  # silero_like (trained, default) | energy
        "threshold": 0.5,
        "min_silence_duration_ms": 500,
        "speech_pad_ms": 100,
    },
    "skip_detector": {
        "enable": True,
        "similarity_threshold": 0.85,
        "time_window_s": 10.0,
        "min_length": 2,
        "containment_threshold": 0.8,
    },
    "audio_deduplication": {
        # relative-similarity thresholds: exact repeats (stuck mic buffers)
        # score 1.0, distinct speech chunks <=~0.85 (see ops.features)
        "enable": True,
        "similarity_threshold": 0.98,
        "duplicate_threshold": 0.995,
        "time_window_s": 5.0,
        "history_size": 100,
    },
    "vocal_separation": {
        "enable": False,
        "method": "filter",  # filter | neural | demucs | none
        "low_hz": 85.0,
        "high_hz": 3400.0,
        # filter/neural: run the separation network on the accelerator (True)
        # or on host BLAS (False — wins on tunneled backends where every
        # device round-trip pays ~30 ms)
        "use_device": True,
        # neural: packaged model variant — default (quality, +13.5 dB held-out)
        # | small/fast (~2.6x fewer MACs, the degraded-CPU / many-stream pick);
        # reference parity with the Demucs model family + VRAM-based pick
        # (vocal_separation.py:98-129, 一键实时识别麦克风.py:766-883)
        "variant": "default",
    },
    "speech_rate_adaptive": {
        "enable": True,
        "initial_silence_ms": 500,
        "min_silence_ms": 200,
        "max_silence_ms": 1000,
        "step_ms": 100,
        "update_interval_s": 2.0,
        "slow_cps": 5.0,
        "fast_cps": 15.0,
    },
    "asr_optimization": {
        "time_stretch_enable": False,
        "adaptive_params_enable": False,
        "normal_cps": 10.0,
    },
    "translation": {
        "enable": False,
        "interval_s": 10.0,
        "target_language": "zh",
    },
    "language_detection": {
        # auto-language streaming: re-detect at utterance boundaries and
        # hot-swap via app.change_language (reference rebuilds the processor
        # on manual language change, 一键…py:2194-2347; this automates it)
        "enable": False,
        "min_prob": 0.5,
        "consecutive": 2,  # switch only after N agreeing detections
        "min_audio_s": 1.0,  # skip detection on very short utterances
        "max_audio_s": 8.0,  # detect on at most the last N seconds
    },
    "diarization": {
        # streaming speaker-turn hooks: embed each finished utterance (VAC
        # voice→nonvoice boundary) and track speakers online; framework
        # extension beyond the reference (docs/ROADMAP.md)
        "enable": False,
        "threshold": None,  # None = the trained EER threshold shipped with the weights
        "max_speakers": 8,
        "min_audio_s": 0.6,  # skip embedding on very short utterances
        "max_audio_s": 10.0,
        "label_results": True,  # prefix recognized text with [S<n>]
    },
    "logging": {
        "enable": False,
        "dir": "logs",
        "console_log_enabled": False,
    },
    "performance": {
        "monitor_enable": True,
        "display_interval_s": 5.0,
        "hard_ratio": 0.4,
        "soft_ratio": 0.6,
    },
    "fallback": {
        # degraded mode: when no TPU is available at startup (absent or held
        # by another process), downgrade ≥small models to base+int8 with a
        # visible warning instead of crashing / crawling (reference GPU→CPU
        # fallback, 一键实时识别麦克风.py:1138-1175)
        "auto_downgrade": True,
    },
    "language_specific": {
        # per-language tuning (reference config.json:110-727 covers the same set)
        lang: {}
        for lang in ["zh", "en", "ja", "ko", "es", "fr", "de", "ru", "it", "pt",
                     "ar", "hi", "th", "vi", "id", "nl", "pl", "tr"]
    },
}

# built-in per-language overrides (same spirit as the reference's blocks:
# CJK text repeats differently → tighter similarity; fast-syllable languages
# get shorter silence)
DEFAULT_CONFIG["language_specific"]["zh"] = {
    # reference config.json zh block: agreement_n=3, vad_threshold=0.6,
    # min_silence 400 ms (mapped onto this schema's streaming/vad sections)
    "skip_detector": {"similarity_threshold": 0.90, "min_length": 2},
    "speech_rate_adaptive": {"fast_cps": 8.0, "slow_cps": 2.5},
    "streaming": {"agreement_n": 3},
    "vad": {"threshold": 0.6, "min_silence_duration_ms": 400},
}
DEFAULT_CONFIG["language_specific"]["ja"] = {
    "skip_detector": {"similarity_threshold": 0.90},
    "speech_rate_adaptive": {"fast_cps": 9.0, "slow_cps": 3.0},
}
DEFAULT_CONFIG["language_specific"]["ko"] = {
    "skip_detector": {"similarity_threshold": 0.88},
    "speech_rate_adaptive": {"fast_cps": 9.0, "slow_cps": 3.0},
}
DEFAULT_CONFIG["language_specific"]["en"] = {
    "speech_rate_adaptive": {"fast_cps": 15.0, "slow_cps": 5.0},
}

# validation ranges: dotted path -> (min, max)
_VALIDATION: dict[str, tuple[float, float]] = {
    "streaming.agreement_n": (2, 6),
    "streaming.buffer_trimming_sec": (3.0, 60.0),
    "streaming.prompt_chars": (0, 1000),
    "vad.threshold": (0.05, 0.95),
    "vad.min_silence_duration_ms": (50, 5000),
    "vad.speech_pad_ms": (0, 1000),
    "skip_detector.similarity_threshold": (0.5, 1.0),
    "skip_detector.time_window_s": (1.0, 120.0),
    "audio_deduplication.similarity_threshold": (0.5, 1.0),
    "audio_deduplication.duplicate_threshold": (0.5, 1.0),
    "speech_rate_adaptive.min_silence_ms": (50, 2000),
    "speech_rate_adaptive.max_silence_ms": (100, 5000),
    "translation.interval_s": (1.0, 120.0),
    "language_detection.min_prob": (0.0, 1.0),
    "language_detection.consecutive": (1, 10),
    "diarization.max_speakers": (1, 64),
    "diarization.min_audio_s": (0.1, 10.0),
    "model.beam_size": (1, 10),
}


def _deep_merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


class ConfigManager:
    def __init__(self, config_path: str = "config.json", autoload: bool = True):
        self.config_path = config_path
        self.config = copy.deepcopy(DEFAULT_CONFIG)
        if autoload:
            self.load_config()

    # ------------------------------------------------------------------ io

    def load_config(self) -> dict:
        if os.path.exists(self.config_path):
            try:
                with open(self.config_path, encoding="utf-8") as f:
                    user = json.load(f)
                user = {k: v for k, v in user.items() if not k.startswith("_comment")}
                self.config = _deep_merge(DEFAULT_CONFIG, user)
                logger.info("loaded config from %s", self.config_path)
            except (json.JSONDecodeError, OSError) as e:
                logger.warning("failed to load %s (%s); using defaults", self.config_path, e)
                self.config = copy.deepcopy(DEFAULT_CONFIG)
        self._validate()
        return self.config

    def save_config(self) -> bool:
        try:
            with open(self.config_path, "w", encoding="utf-8") as f:
                json.dump(self.config, f, ensure_ascii=False, indent=2)
            return True
        except OSError as e:
            logger.warning("failed to save config: %s", e)
            return False

    # -------------------------------------------------------------- validation

    def _validate(self):
        for path, (lo, hi) in _VALIDATION.items():
            val = self.get(path)
            if val is None or not isinstance(val, (int, float)):
                continue
            if val < lo or val > hi:
                clamped = min(max(val, lo), hi)
                logger.warning("config %s=%r out of [%s, %s]; clamped to %r",
                               path, val, lo, hi, clamped)
                self.set(path, clamped)
        # cross-field sanity
        mn = self.get("speech_rate_adaptive.min_silence_ms")
        mx = self.get("speech_rate_adaptive.max_silence_ms")
        if mn is not None and mx is not None and mn > mx:
            logger.warning("min_silence_ms > max_silence_ms; swapping")
            self.set("speech_rate_adaptive.min_silence_ms", mx)
            self.set("speech_rate_adaptive.max_silence_ms", mn)

    # ------------------------------------------------------------ dotted paths

    def get(self, path: str, default: Any = None) -> Any:
        node = self.config
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self.config
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    # --------------------------------------------------------- language merge

    def get_language_specific_config(self, language: str) -> dict:
        """base config with language_specific.<lang> merged on top."""
        overrides = self.get(f"language_specific.{language}", {}) or {}
        merged = _deep_merge(self.config, overrides)
        merged.pop("language_specific", None)
        return merged
