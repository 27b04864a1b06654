"""Host-side utilities: compile cache, clocks, time helpers, hardware detect."""

from realtime_whisper_asr_tpu.utils.compile_cache import enable_persistent_compile_cache
from realtime_whisper_asr_tpu.utils.transfer import device_get
from realtime_whisper_asr_tpu.utils.warmup import start_background_warmup, wait_for_warmup
