"""Host streaming core: the online ASR protocol.

Deterministic, dependency-light re-implementation of the whisper_streaming
semantics the reference builds on (SURVEY.md §2.2 contract): HypothesisBuffer
with LocalAgreement-n, OnlineASRProcessor with buffer trimming + prompt carry,
and the VAD-controlled (VAC) wrapper with dynamically adjustable silence.
"""

from realtime_whisper_asr_tpu.streaming.hypothesis import HypothesisBuffer
from realtime_whisper_asr_tpu.streaming.online import OnlineASRProcessor
from realtime_whisper_asr_tpu.streaming.vac import VADIterator, VACOnlineASRProcessor
