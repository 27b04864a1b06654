"""Native (C) host-side kernels, built on demand and loaded via ctypes.

The TPU does the model math; these cover host hot loops where pure Python is
too slow on the streaming path (DTW alignment, median filtering). Build is
lazy, cached next to the sources, and every consumer has a pure-Python
fallback, so a missing compiler degrades gracefully.
"""

from realtime_whisper_asr_tpu.native.build import get_lib
