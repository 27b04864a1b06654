"""TPU-native realtime Whisper streaming ASR framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of
``nameearly/realtime-whisper-asr`` (see SURVEY.md): streaming microphone speech
recognition with VAD chunking, LocalAgreement-n hypothesis stabilization,
text/audio deduplication, speech-rate adaptation, vocal separation, API
translation, device recovery, performance monitoring, and per-language config.

The compute core is TPU-first:
- fused Pallas log-mel frontend (``ops.logmel``)
- pure-JAX Whisper encoder/decoder with KV-cached incremental decoding
  (``models.whisper``)
- on-device VAD and dedup feature extraction (``models.vad``, ``ops.features``)
- ``jax.sharding``/``shard_map`` parallelism (``parallel``)

Host-side Python stays thin: audio I/O, the streaming online protocol
(bit-compatible with whisper_streaming semantics), and services.
"""

__version__ = "0.1.0"

SAMPLING_RATE = 16000
