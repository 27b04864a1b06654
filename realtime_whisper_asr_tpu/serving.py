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
    #: speaker label ("S1", ...) when the server runs with diarize=True.
    #: Mid-utterance results carry a provisional classification of the
    #: utterance in progress (SpeakerTurnController.live_label); utterance
    #: finals carry the exact assignment made at the VAD boundary.
    speaker: Optional[str] = None


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
        self.audio_since_tick = 0.0  # seconds drained but not yet transcribed
        self.language: Optional[str] = None
        self.inflight = False  # a dispatched tick awaits finalize
        self.diarizer = None  # per-stream SpeakerTurnController when diarize=True
        self._prev_vac_status: Optional[str] = None
        self._prev_utt_ends = 0  # consumed VAC end-event count (diarizer)


def _hbm_safe_batch(cfg, param_bytes: int, hbm_bytes: Optional[int],
                    kv_quant: bool = False) -> Optional[int]:
    """Largest per-dispatch decode batch whose working set fits device HBM,
    or None when the device's HBM size is unknown (CPU tests, hosts without
    memory_stats).

    The pipelined scheduler keeps up to TWO dispatched tick groups alive on
    the device at once (step() dispatches round N+1 before finalizing round
    N), and each batch row of a dispatched tick holds bf16 cross-attention KV
    for the full encoder context plus self-KV and encoder transients.
    Measured round 4 on a 16 GB v5e: batch 16 serves large-v3 int8-all fine;
    batch 32 RESOURCE_EXHAUSTEDs every tick — two concurrent groups' cross-KV
    alone is 2 × 32 × 246 MB ≈ 15.7 GB. The reference never hits this wall
    (CTranslate2 serves one stream per process); a TPU server must budget it.
    """
    if not hbm_bytes or cfg is None:
        return None
    d = cfg.n_text_state
    # int8-kv halves the dominant per-row cost — cross-KV rows are int8 plus
    # f32 per-row scales (1/Dh of the row bytes) instead of bf16. This is the
    # quantization tier that actually RAISES the serving batch ceiling: weight
    # tiers (int8-all / int4) shrink the shared params, which buys ~1 batch
    # row at 16 GB, while the per-row KV working set is untouched.
    kv_byte = (1.0 + 4.0 / (d // cfg.n_text_head)) if kv_quant else 2.0
    cross_kv = int(2 * cfg.n_text_layer * cfg.n_audio_ctx * d * kv_byte)
    self_kv = int(2 * cfg.n_text_layer * 256 * d * kv_byte)  # conservative decode ctx
    enc_transient = 4 * cfg.n_audio_ctx * d * 2
    per_row = cross_kv + self_kv + enc_transient
    # 15% HBM held back for XLA workspace/fragmentation + a flat 3 GiB for
    # program buffers; calibrated against round-4 measurements on 16 GB v5e,
    # large-v3 int8-all: 2×16 live rows serve fine, 2×17 RESOURCE_EXHAUSTEDs
    # in the batched encode — the formula must land exactly at 16 there
    budget = int(hbm_bytes * 0.85) - int(param_bytes) - 3 * 2**30
    return max(1, budget // (2 * per_row))


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
        max_batch: int = 8,
        diarize: bool = False,
        separator=None,
        clock: Callable[[], float] = time.monotonic,
    ):
        #: HBM-derived ceiling on the per-dispatch batch (None = unknown HBM).
        #: Oversized max_batch requests are CLAMPED, not honored-then-OOM: the
        #: scheduler still serves every stream by splitting each round into
        #: cap-sized groups, trading a little aggregate latency for not losing
        #: 100% of ticks to RESOURCE_EXHAUSTED resets (measured round 4:
        #: 32 streams × large-v3 on v5e decoded 0 ticks before this clamp).
        self.device_batch_cap = None
        try:
            cfg = getattr(asr, "cfg", None)
            params = getattr(asr, "params", None)
            if cfg is not None and params is not None:
                import jax

                from realtime_whisper_asr_tpu.utils.hardware import detect_hardware

                pbytes = sum(
                    l.size * l.dtype.itemsize for l in jax.tree.leaves(params)
                )
                self.device_batch_cap = _hbm_safe_batch(
                    cfg, pbytes, detect_hardware().get("hbm_bytes"),
                    kv_quant=getattr(asr, "quantization", None) == "int8-kv",
                )
        except Exception:  # sizing is best-effort; never block serving
            logger.exception("HBM batch sizing failed; max_batch unclamped")
        if self.device_batch_cap is not None and max_batch > self.device_batch_cap:
            logger.warning(
                "max_batch %d exceeds the HBM-safe decode batch %d for this "
                "model/device; clamping (streams beyond the cap are served in "
                "additional per-round groups)",
                max_batch, self.device_batch_cap,
            )
            max_batch = self.device_batch_cap
        self.max_batch = max_batch
        self.max_consecutive_sheds = max_consecutive_sheds
        self.asr = asr
        # streams created with language=None must not inherit whatever language
        # the previously active stream set on the shared ASR
        self._default_language = getattr(asr, "original_language", None)
        self.clock = clock
        self.use_vad = use_vad
        self.online_chunk_size = online_chunk_size
        self.agreement_n = agreement_n
        self.prefix_policy = prefix_policy
        self.min_silence_duration_ms = min_silence_duration_ms
        if vad_factory is None:
            from realtime_whisper_asr_tpu.models.vad import EnergyVAD, SileroLikeVAD

            # trained spectral VAD when packaged weights exist (they ship with
            # the repo); energy heuristic as the weight-free fallback. Load
            # the packaged npz ONCE and share the (read-only) params — the
            # per-stream instances keep their own LSTM state, and every
            # TCP/WS connection would otherwise re-read the weights from disk
            probe = SileroLikeVAD()
            if probe.trained:
                cached_params = probe.params
                vad_factory = lambda: SileroLikeVAD(params=cached_params)  # noqa: E731
            else:
                vad_factory = EnergyVAD
        self.vad_factory = vad_factory
        #: optional vocal-separation frontend applied to every fed chunk (the
        #: reference separates per mic chunk in its loop, 一键…py:1474-1482;
        #: the app does it per session — this is the serving equivalent). Runs
        #: in feed(), i.e. on the CALLER's thread: per-connection threads
        #: separate in parallel and never contend with the device tick.
        #: Separators are stateless apart from a stats dict, so one shared
        #: instance serves all streams; prefer a host-path separator
        #: (use_device=False) so feed() never touches the accelerator.
        #: Trained neural separators fuse into the shared ASR's jitted
        #: logmel+encode program instead (zero host cost per stream, batched
        #: on-device with the tick's encode — see asr.set_separation_frontend);
        #: feed() then passes audio through untouched.
        self.fused_separation = False
        if (
            separator is not None
            and getattr(separator, "name", "") == "neural"
            and getattr(separator, "trained", False)
            and hasattr(asr, "set_separation_frontend")
        ):
            asr.set_separation_frontend(separator.params)
            self.fused_separation = True
            separator = None
        self.separator = separator
        # one shared (stateless) speaker embedder; per-stream trackers
        self._speaker_embedder = None
        if diarize and use_vad:
            from realtime_whisper_asr_tpu.models.speaker import SpeakerEmbedder

            self._speaker_embedder = SpeakerEmbedder()
        self.streams: dict[int, _Stream] = {}
        self.monitor = PerformanceMonitor()
        self._ids = itertools.count(1)
        self._rr: deque[int] = deque()  # round-robin order
        self._lock = threading.Lock()  # guards queues/results/rr/stream maps
        self._asr_lock = threading.Lock()  # serializes shared-ASR access
        #: dispatched-but-not-finalized tick groups (guarded by _asr_lock):
        #: step() dispatches this round's groups BEFORE finalizing last
        #: round's, so group N+1's upload/encode/decode queue behind group N's
        #: decode on the device and N's result transfer (~30 ms of tunnel
        #: latency here) overlaps N+1's device work instead of serializing
        #: the scheduler.
        self._inflight: list[dict] = []
        #: tick groups lost to a swallowed transcribe/dispatch/finalize
        #: exception (the group is reset and keeps serving). Surfaced in
        #: get_stats so a systematically failing backend is visible to
        #: operators and benches, not just the log (a round-3 bench bug hid
        #: 24/24 failed rounds behind these handlers).
        self.group_failures = 0
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
        # route this processor's upload prefetches to its own device ring
        # (the shared ASR's "active stream" only tracks the ticking stream)
        online.stream_key = sid
        stream = _Stream(sid, processor, SkipDetector(clock=self.clock), self.clock)
        stream.language = language
        if self._speaker_embedder is not None:
            from realtime_whisper_asr_tpu.models.speaker import (
                SpeakerTracker,
                SpeakerTurnController,
            )

            stream.diarizer = SpeakerTurnController(
                SpeakerTracker(embedder=self._speaker_embedder)
            )
        with self._lock:
            self.streams[sid] = stream
            self._rr.append(sid)
        logger.info("stream %d created (language=%s)", sid, language)
        return sid

    def _get_open(self, stream_id: int) -> _Stream:
        s = self.streams.get(stream_id)
        if s is None or s.closed:
            raise ValueError(f"stream {stream_id} is closed or unknown")
        return s

    def feed(self, stream_id: int, chunk: np.ndarray) -> None:
        if self.separator is not None:
            # outside the lock: separation is the expensive part of feed and
            # must not serialize other connections' feeds / step()'s drain
            chunk = self.separator.separate(np.asarray(chunk, np.float32))
        with self._lock:
            s = self._get_open(stream_id)
            s.pending_audio.append(np.asarray(chunk, np.float32))
            s.buffered_samples += len(chunk)

    def poll(self, stream_id: int) -> list[StreamResult]:
        with self._lock:
            s = self.streams.get(stream_id)
            if s is None:
                return []
            out = list(s.results)
            s.results.clear()
        return out

    def close_stream(self, stream_id: int) -> list[StreamResult]:
        """Final flush (transcribes any remaining audio); returns remaining
        results and forgets the stream."""
        with self._lock:
            s = self._get_open(stream_id)
            s.closed = True  # feed() rejects from here on
            if stream_id in self._rr:
                self._rr.remove(stream_id)
        with self._asr_lock:
            # a dispatched tick may still be in flight for this (or any)
            # stream — settle it before the final flush
            self._flush_inflight_locked()
            self._drain_into_processor(s)
            self._activate(s)
            # run a final transcription tick over whatever audio remains —
            # finish() only flushes already-hypothesized words. Loop because
            # VAC may hold a STAGED utterance (_pending: end+start inside the
            # client's last chunk): each finish() hands one over; a single
            # pass would silently drop its transcript.
            inner = getattr(s.processor, "online", s.processor)
            for _ in range(8):  # staged utterances hand over one per finish()
                if len(getattr(inner, "audio_buffer", ())) > 0:
                    beg, end, text = inner.process_iter()
                    if hasattr(s.processor, "current_online_chunk_buffer_size"):
                        # this WAS the head tick — don't let VAC.finish()
                        # re-run the same buffer (it gates on this counter)
                        s.processor.current_online_chunk_buffer_size = 0
                    self._emit(s, beg, end, text)
                had_pending = bool(getattr(s.processor, "_pending", None))
                beg, end, text = s.processor.finish()
                self._emit(s, beg, end, text)
                if not had_pending:
                    break
            if hasattr(self.asr, "drop_stream"):
                self.asr.drop_stream(stream_id)
        out = self.poll(stream_id)
        with self._lock:
            self.streams.pop(stream_id, None)  # no leaks on stream churn
        return out

    # -------------------------------------------------------------- scheduling

    def _activate(self, s: _Stream) -> None:
        if hasattr(self.asr, "set_active_stream"):
            self.asr.set_active_stream(s.sid)
        if hasattr(self.asr, "original_language"):
            self.asr.original_language = (
                s.language if s.language is not None else self._default_language
            )

    def _drain_into_processor(self, s: _Stream) -> None:
        while True:
            with self._lock:
                if not s.pending_audio:
                    return
                chunk = s.pending_audio.popleft()
                s.buffered_samples -= len(chunk)
            s.audio_since_tick += len(chunk) / SR
            s.processor.insert_audio_chunk(chunk)
            if s.diarizer is not None:
                status = getattr(s.processor, "status", None)
                s.diarizer.observe_chunk(chunk, voiced=(status == "voice"))
                ends = getattr(s.processor, "utterance_ends", None)
                if ends is not None:
                    # count VAC end EVENTS: a before/after status compare
                    # misses an end+start pair inside one chunk (status stays
                    # 'voice' while an utterance boundary passed). A counter
                    # below the watermark means the processor was re-inited
                    # (error reset) — resync without inventing events.
                    if ends < s._prev_utt_ends:
                        s._prev_utt_ends = ends
                    for _ in range(ends - s._prev_utt_ends):
                        s.diarizer.on_utterance_end()
                    s._prev_utt_ends = ends
                elif s._prev_vac_status == "voice" and status == "nonvoice":
                    s.diarizer.on_utterance_end()
                s._prev_vac_status = status

    def _emit(self, s: _Stream, beg, end, text) -> None:
        if not text:
            return
        skip, _ = s.skip_detector.should_skip(text, self.clock())
        if skip:
            return
        # live_label: provisional classification of the utterance in progress
        # so results carry their OWN utterance's speaker (not the previous
        # one); exact at utterance finals (on_utterance_end runs during drain,
        # before the final text is emitted)
        speaker = s.diarizer.live_label() if s.diarizer is not None else None
        with self._lock:
            s.results.append(StreamResult(s.sid, beg, end, text, speaker=speaker))

    def _collect_ready(self) -> list[_Stream]:
        """Pick up to max_batch ready streams in round-robin order."""
        with self._lock:
            order = list(self._rr)
        out: list[_Stream] = []
        for sid in order:
            with self._lock:
                s = self.streams.get(sid)
                # readiness = pending audio OR audio already drained into the
                # processor by a shed tick that still awaits transcription;
                # a stream with a dispatched tick in flight is not re-ticked
                if s is None or s.closed or s.inflight or (
                    s.buffered_samples < 1 and s.audio_since_tick <= 0
                ):
                    continue
                # rotate under the lock; a concurrent close may have removed it
                try:
                    self._rr.remove(sid)
                    self._rr.append(sid)
                except ValueError:
                    continue
            out.append(s)
            if len(out) >= self.max_batch:
                break
        return out

    def _tick_single(self, s: _Stream) -> None:
        self._activate(s)
        t0 = self.clock()
        beg, end, text = s.processor.process_iter()
        dt = self.clock() - t0
        s.ticks += 1
        # every real tick updates the window, with the audio actually
        # processed since the last tick (not the committed-word span)
        self.monitor.record_recognition(max(s.audio_since_tick, 1e-3), max(dt, 1e-6))
        s.audio_since_tick = 0.0
        self._emit(s, beg, end, text)

    def _reset_group(self, group: list[_Stream]) -> None:
        for s in group:
            s.inflight = False
            inner = getattr(s.processor, "online", s.processor)
            inner.init(offset=inner.buffer_time_offset
                       + len(inner.audio_buffer) / SR)

    def _tick_batch(self, group: list[_Stream]) -> None:
        """ONE batched transcribe across same-language streams: the decode
        loop is weight-bandwidth-bound at batch 1, so B streams share one
        weight pass (+ one upload/download) instead of B of each."""
        self._activate(group[0])  # language is uniform within the group
        reqs = []
        for s in group:
            r = s.processor.prepare_request()
            r["key"] = s.sid
            reqs.append(r)
        t0 = self.clock()
        try:
            results = self.asr.transcribe_batch(reqs)
        except Exception:
            logger.exception("batched transcribe failed; resetting group")
            self.group_failures += 1
            self._reset_group(group)
            return
        self._apply_batch(group, results, self.clock() - t0)

    def _dispatch_batch(self, group: list[_Stream]) -> Optional[dict]:
        """Pipelined first half of _tick_batch: plan + upload + encode +
        enqueue the decode, without blocking on results. Returns an in-flight
        record for _finalize_batch, or None if dispatch failed."""
        self._activate(group[0])
        reqs = []
        for s in group:
            r = s.processor.prepare_request()
            r["key"] = s.sid
            reqs.append(r)
        t0 = self.clock()
        try:
            st = self.asr.transcribe_batch_dispatch(reqs)
        except Exception:
            logger.exception("batched dispatch failed; resetting group")
            self.group_failures += 1
            self._reset_group(group)
            return None
        for s in group:
            s.inflight = True
        return {"group": group, "state": st, "t0": t0}

    def _finalize_batch(self, pending: dict) -> None:
        group = pending["group"]
        try:
            results = self.asr.transcribe_batch_finalize(pending["state"])
        except Exception:
            logger.exception("batched finalize failed; resetting group")
            self.group_failures += 1
            self._reset_group(group)
            return
        for s in group:
            s.inflight = False
        self._apply_batch(group, results, self.clock() - pending["t0"])

    def _apply_batch(self, group: list[_Stream], results, dt: float) -> None:
        # dt spans dispatch→finalize; under pipelining it includes overlap
        # with neighboring groups, so the per-stream share is a conservative
        # (over-)estimate for the load-shedding monitor
        share = dt / max(len(group), 1)
        for s, res in zip(group, results):
            beg, end, text = s.processor.apply_result(res, dt)
            s.ticks += 1
            self.monitor.record_recognition(max(s.audio_since_tick, 1e-3), max(share, 1e-6))
            s.audio_since_tick = 0.0
            self._emit(s, beg, end, text)

    def step(self) -> bool:
        """Run one scheduling round: drain + shed-check the ready streams,
        batch the same-language regular ticks into one transcribe, run the
        rest (utterance finals, odd languages) individually.

        Pipelining: this round's batch groups are DISPATCHED (upload + encode
        + decode enqueued, no blocking), then LAST round's in-flight groups
        are finalized — so each group's result transfer overlaps the next
        group's device work. Results for a group surface one ``step()`` later;
        callers drive ``step()`` in a loop (serve_forever / ``while step()``),
        so the added latency is one scheduling iteration, not one tick."""
        candidates = self._collect_ready()
        with self._asr_lock:
            if not candidates and not self._inflight:
                return False
            did_work = False
            pipelined = hasattr(self.asr, "transcribe_batch_dispatch")
            batchable: list[_Stream] = []
            singles: list[_Stream] = []
            for s in candidates:
                with self._lock:
                    if s.closed:
                        continue
                self._drain_into_processor(s)
                skip, why = self.monitor.should_skip_recognition(max(s.audio_since_tick, 0.1))
                # probe-through: never shed indefinitely, or the monitor's
                # window never refreshes and shedding becomes a deadlock
                if skip and s.consecutive_sheds < self.max_consecutive_sheds:
                    s.skipped_ticks += 1
                    s.consecutive_sheds += 1
                    logger.debug("shedding load on stream %d: %s", s.sid, why)
                    did_work = True
                    continue
                s.consecutive_sheds = 0
                proc = s.processor
                if (
                    hasattr(self.asr, "transcribe_batch")
                    and hasattr(proc, "wants_tick")
                    and hasattr(proc, "prepare_request")
                ):
                    if proc.wants_tick():
                        batchable.append(s)
                    elif getattr(proc, "is_currently_final", False) or not hasattr(
                        proc, "is_currently_final"
                    ):
                        singles.append(s)
                    # else: VAC gate not met — nothing to do this round
                else:
                    singles.append(s)
            # group batchable streams by language (DecodeOptions are shared
            # across a batch); stragglers run individually (un-pipelined mode)
            new_inflight: list[dict] = []
            while batchable:
                lang = batchable[0].language
                group = [s for s in batchable if s.language == lang]
                batchable = [s for s in batchable if s.language != lang]
                if pipelined:
                    pending = self._dispatch_batch(group)
                    if pending is not None:
                        new_inflight.append(pending)
                    did_work = True
                elif len(group) == 1:
                    singles.extend(group)
                else:
                    self._tick_batch(group)
                    did_work = True
            for s in singles:
                self._tick_single(s)
                did_work = True
            # finalize LAST round's dispatches (their transfers overlapped
            # this round's dispatch + singles work)
            for pending in self._inflight:
                self._finalize_batch(pending)
                did_work = True
            self._inflight = new_inflight
        return did_work

    def _flush_inflight_locked(self) -> None:
        """Finalize every in-flight group now (callers hold _asr_lock)."""
        for pending in self._inflight:
            self._finalize_batch(pending)
        self._inflight = []

    def serve_forever(self, idle_sleep: float = 0.01) -> None:
        # realtime streams deliver ~1 chunk/s each; a lightly loaded server
        # idles between arrivals and the tunnel's TCP window collapses —
        # idle keep-alive pings keep the next tick's upload at full rate
        # (asr.start_idle_keepalive; no-op on non-TPU backends)
        if hasattr(self.asr, "start_idle_keepalive"):
            self.asr.start_idle_keepalive()
        try:
            while not self._stop.is_set():
                if not self.step():
                    time.sleep(idle_sleep)
        finally:
            if hasattr(self.asr, "stop_idle_keepalive"):
                self.asr.stop_idle_keepalive()

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
        with self._asr_lock:
            self._flush_inflight_locked()

    def get_stats(self) -> dict:
        with self._lock:
            return {
                "streams": len([s for s in self.streams.values() if not s.closed]),
                "total_streams": len(self.streams),
                "group_failures": self.group_failures,
                "max_batch": self.max_batch,
                "device_batch_cap": self.device_batch_cap,
                "separator": (self.separator.get_stats() if self.separator
                              else {"fused": True} if self.fused_separation
                              else None),
                "monitor": self.monitor.get_status(),
                "per_stream": {
                    sid: {"ticks": s.ticks, "shed": s.skipped_ticks,
                          "pending_s": s.buffered_samples / SR}
                    for sid, s in self.streams.items()
                },
            }
