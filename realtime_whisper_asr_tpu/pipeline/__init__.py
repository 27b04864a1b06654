"""Pipeline stages around the ASR core (SURVEY.md §1 L2 + post-filters).

Each stage is optional and config-driven: vocal separation → audio-dedup gate
→ VAC → ASR → timestamp validation → skip detector → sinks.
"""

from realtime_whisper_asr_tpu.pipeline.skip_detector import SkipDetector
from realtime_whisper_asr_tpu.pipeline.dedup_audio import AudioDeduplicator
from realtime_whisper_asr_tpu.pipeline.speech_rate import (
    SpeechRateDetector,
    AdaptiveSilenceController,
    SpeechRateAdaptiveProcessor,
)
from realtime_whisper_asr_tpu.pipeline.stretch import SpeechRateAudioProcessor, AdaptiveWhisperParams
from realtime_whisper_asr_tpu.pipeline.separation import (
    VocalSeparator,
    BandpassSeparator,
    DemucsSeparator,
    create_separator,
)
