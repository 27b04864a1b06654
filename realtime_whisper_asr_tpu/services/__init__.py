"""Side services (SURVEY.md §1 L4): async output, translation, perf, logging."""

from realtime_whisper_asr_tpu.services.async_output import AsyncOutput
from realtime_whisper_asr_tpu.services.translation import TranslationManager
from realtime_whisper_asr_tpu.services.perf_monitor import PerformanceMonitor
from realtime_whisper_asr_tpu.services.perf_display import PerformanceDisplay
from realtime_whisper_asr_tpu.services.log_manager import LogManager
