"""Multi-stream serving: N concurrent sessions over one shared TPU model.

The reference serves exactly one microphone (SURVEY.md §2.4); this is the
production-serving extension the TPU's headroom makes natural (large-v3-turbo
streams at RTF ≈ 0.06, so one chip can carry ~15 realtime streams). Design:

- ONE ``TPUWhisperASR`` (weights loaded once) shared by all streams; each
  stream owns its host pipeline (VAC/online processor, skip detector, rate
  adaptation) and a per-stream device audio buffer inside the ASR
  (``set_active_stream``), so switching streams costs nothing beyond its own
  window state.
- cooperative round-robin: ``step()`` runs at most one transcription tick for
  the next stream that has enough buffered voice; callers drive it from their
  event loop, or ``serve_forever`` runs it on a thread.
- per-stream backpressure via PerformanceMonitor: when the chip falls behind,
  the server skips recognition ticks for the noisiest streams first (the
  reference's load-shedding predicates, `performance_monitor.py:177-251`,
  applied per stream).
"""

from __future__ import annotations

import dataclasses
import itertools
import logging
import threading
import time
from collections import deque
from typing import Callable, Optional

import numpy as np

from realtime_whisper_asr_tpu.pipeline import SkipDetector
from realtime_whisper_asr_tpu.services import PerformanceMonitor
from realtime_whisper_asr_tpu.streaming import (
    OnlineASRProcessor,
    VACOnlineASRProcessor,
    VADIterator,
)

logger = logging.getLogger(__name__)

SR = 16000


@dataclasses.dataclass
class StreamResult:
    stream_id: int
    begin: float
    end: float
    text: str


class _Stream:
    def __init__(self, sid: int, processor, skip_detector, clock):
        self.sid = sid
        self.processor = processor
        self.skip_detector = skip_detector
        self.clock = clock
        self.pending_audio: deque[np.ndarray] = deque()
        self.buffered_samples = 0
        self.results: deque[StreamResult] = deque()
        self.closed = False
        self.ticks = 0
        self.skipped_ticks = 0
        self.consecutive_sheds = 0


class StreamServer:
    def __init__(
        self,
        asr,
        vad_factory: Optional[Callable[[], object]] = None,
        online_chunk_size: float = 1.0,
        agreement_n: int = 2,
        prefix_policy: str = "agree2",
        min_silence_duration_ms: int = 500,
        use_vad: bool = True,
        max_consecutive_sheds: int = 3,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.max_consecutive_sheds = max_consecutive_sheds
        self.asr = asr
        self.clock = clock
        self.use_vad = use_vad
        self.online_chunk_size = online_chunk_size
        self.agreement_n = agreement_n
        self.prefix_policy = prefix_policy
        self.min_silence_duration_ms = min_silence_duration_ms
        if vad_factory is None:
            from realtime_whisper_asr_tpu.models.vad import EnergyVAD

            vad_factory = EnergyVAD
        self.vad_factory = vad_factory
        self.streams: dict[int, _Stream] = {}
        self.monitor = PerformanceMonitor()
        self._ids = itertools.count(1)
        self._rr: deque[int] = deque()  # round-robin order
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # ----------------------------------------------------------------- streams

    def create_stream(self, language: Optional[str] = None) -> int:
        online = OnlineASRProcessor(
            self.asr,
            agreement_n=self.agreement_n,
            prefix_policy=self.prefix_policy,
            clock=self.clock,
        )
        if self.use_vad:
            processor = VACOnlineASRProcessor(
                online,
                VADIterator(self.vad_factory(),
                            min_silence_duration_ms=self.min_silence_duration_ms),
                online_chunk_size=self.online_chunk_size,
            )
        else:
            processor = online
        sid = next(self._ids)
        with self._lock:
            self.streams[sid] = _Stream(sid, processor, SkipDetector(clock=self.clock),
                                        self.clock)
            self._rr.append(sid)
        logger.info("stream %d created (language=%s)", sid, language)
        return sid

    def feed(self, stream_id: int, chunk: np.ndarray) -> None:
        s = self.streams[stream_id]
        if s.closed:
            raise ValueError(f"stream {stream_id} is closed")
        with self._lock:
            s.pending_audio.append(np.asarray(chunk, np.float32))
            s.buffered_samples += len(chunk)

    def poll(self, stream_id: int) -> list[StreamResult]:
        s = self.streams[stream_id]
        with self._lock:
            out = list(s.results)
            s.results.clear()
        return out

    def close_stream(self, stream_id: int) -> list[StreamResult]:
        """Final flush; returns any remaining results."""
        s = self.streams[stream_id]
        self._drain_into_processor(s)
        if hasattr(self.asr, "set_active_stream"):
            self.asr.set_active_stream(stream_id)
        beg, end, text = s.processor.finish()
        self._emit(s, beg, end, text)
        s.closed = True
        with self._lock:
            if stream_id in self._rr:
                self._rr.remove(stream_id)
        if hasattr(self.asr, "drop_stream"):
            self.asr.drop_stream(stream_id)
        return self.poll(stream_id)

    # -------------------------------------------------------------- scheduling

    def _drain_into_processor(self, s: _Stream) -> None:
        while True:
            with self._lock:
                if not s.pending_audio:
                    return
                chunk = s.pending_audio.popleft()
                s.buffered_samples -= len(chunk)
            s.processor.insert_audio_chunk(chunk)

    def _emit(self, s: _Stream, beg, end, text) -> None:
        if not text:
            return
        skip, _ = s.skip_detector.should_skip(text, self.clock())
        if skip:
            return
        with self._lock:
            s.results.append(StreamResult(s.sid, beg, end, text))

    def step(self) -> bool:
        """Run ONE tick for the next ready stream; True if work was done."""
        with self._lock:
            order = list(self._rr)
        for sid in order:
            s = self.streams.get(sid)
            if s is None or s.closed:
                continue
            if s.buffered_samples < 1:
                continue
            with self._lock:
                self._rr.remove(sid)
                self._rr.append(sid)
            self._drain_into_processor(s)
            skip, why = self.monitor.should_skip_recognition(1.0)
            # probe-through: never shed indefinitely, or the monitor's window
            # never refreshes and shedding becomes a deadlock (fast post-warmup
            # ticks must get a chance to repair the speed ratio)
            if skip and s.consecutive_sheds < self.max_consecutive_sheds:
                s.skipped_ticks += 1
                s.consecutive_sheds += 1
                logger.debug("shedding load on stream %d: %s", sid, why)
                return True
            s.consecutive_sheds = 0
            if hasattr(self.asr, "set_active_stream"):
                self.asr.set_active_stream(sid)
            t0 = self.clock()
            beg, end, text = s.processor.process_iter()
            dt = self.clock() - t0
            s.ticks += 1
            if text and beg is not None and end is not None:
                self.monitor.record_recognition(max(end - beg, 1e-3), max(dt, 1e-6))
            self._emit(s, beg, end, text)
            return True
        return False

    def serve_forever(self, idle_sleep: float = 0.01) -> None:
        while not self._stop.is_set():
            if not self.step():
                time.sleep(idle_sleep)

    def start(self) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._stop.clear()
            self._thread = threading.Thread(target=self.serve_forever, daemon=True,
                                            name="rtwa-server")
            self._thread.start()

    def stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)

    def get_stats(self) -> dict:
        with self._lock:
            return {
                "streams": len([s for s in self.streams.values() if not s.closed]),
                "total_streams": len(self.streams),
                "monitor": self.monitor.get_status(),
                "per_stream": {
                    sid: {"ticks": s.ticks, "shed": s.skipped_ticks,
                          "pending_s": s.buffered_samples / SR}
                    for sid, s in self.streams.items()
                },
            }
