"""TPU Whisper ASR backend: the framework's implementation of the ASR protocol.

This is the native replacement for the reference's CustomFasterWhisperASR →
CTranslate2 stack (reference `asr_components.py:182-311`). The protocol it
exposes is the whisper_streaming backend contract consumed by the online
processors (SURVEY.md §1 L3→L1):

    transcribe(audio, init_prompt="") -> segments
    ts_words(segments) -> [(beg, end, word)]
    segments_end_ts(segments) -> [end, ...]
    set_translate_task(); use_vad(); attribute ``sep``

plus ``detect_language(audio)``. Compute path: fused Pallas log-mel →
jit-compiled encoder on the static 30 s window → KV-cached greedy/beam decode
with DTW word timestamps. All shapes static; no retraces across calls.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from realtime_whisper_asr_tpu.models import whisper as W
from realtime_whisper_asr_tpu.models.whisper import decode as D
from realtime_whisper_asr_tpu.models.whisper import timestamps as TS
from realtime_whisper_asr_tpu.models.whisper.tokenizer import Tokenizer, get_tokenizer

logger = logging.getLogger(__name__)

SAMPLING_RATE = 16000
WINDOW_SECONDS = 30.0
WINDOW_SAMPLES = int(WINDOW_SECONDS * SAMPLING_RATE)


def _words_to_samples(words: jnp.ndarray) -> jnp.ndarray:
    """f32 transfer words -> float samples. Audio rides the host→device link
    as s16 PCM bitcast into f32 words (2 samples/word): mic input is s16
    anyway, and halving the payload matters at the ~35 MB/s this backend's
    tunnel moves (a full 34 s window drops 2.2 MB → 1.1 MB)."""
    i16 = jax.lax.bitcast_convert_type(words, jnp.int16)  # (n, 2)
    return i16.reshape(-1).astype(jnp.float32) / 32768.0


def _samples_to_words(audio: np.ndarray) -> np.ndarray:
    """Host half of the s16-bitcast transfer encoding (even length required)."""
    q = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
    return q.view(np.float32)


def _buf_write(buf: jnp.ndarray, words: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(buf, _words_to_samples(words), (pos,))


def _buf_place(words: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Fresh CAP-sized ring from a bucketed payload (full-replace path)."""
    samples = _words_to_samples(words)
    if samples.shape[0] >= cap:
        return samples[:cap]
    return jnp.concatenate([samples, jnp.zeros(cap - samples.shape[0], jnp.float32)])


def _buf_shift_write(
    buf: jnp.ndarray, words: jnp.ndarray, k: jnp.ndarray, n_remain: jnp.ndarray,
) -> jnp.ndarray:
    """Drop the first ``k`` samples device-side (front trim: the retained
    audio is already on the chip — re-uploading it is the single biggest
    avoidable transfer), then append the new suffix at ``n_remain``."""
    idx = jnp.arange(buf.shape[0])
    src = jnp.take(buf, jnp.minimum(idx + k, buf.shape[0] - 1), axis=0)
    shifted = jnp.where(idx < n_remain, src, 0.0)
    return jax.lax.dynamic_update_slice(shifted, _words_to_samples(words), (n_remain,))


@functools.partial(jax.jit, static_argnames=("kinds", "lens", "cap", "aux_size"))
def _apply_plans_jit(up, bufs, kinds, lens, cap, aux_size):
    """Apply every stream's upload plan against the blob in ONE jitted program
    (ring writes/shifts/replaces + the aux slice). Eagerly these were 2-4
    dispatches per stream per tick; one program also lets XLA schedule them
    together. ``kinds``/``lens`` are static (plan shapes are bucketed); the
    per-row write positions and shift amounts ride as f32 words at the END of
    the blob itself (exact below 2^23; a separate jnp.asarray would be a
    second transfer)."""
    n = len(kinds)
    meta_off = sum(lens) + aux_size
    new_bufs = []
    off = 0
    for i, (kind, ln) in enumerate(zip(kinds, lens)):
        seg = jax.lax.slice(up, (off,), (off + ln,))
        pos = up[meta_off + i].astype(jnp.int32)
        shift = up[meta_off + n + i].astype(jnp.int32)
        if kind == "full":
            nb = _buf_place(seg, cap)
        elif kind == "shift":
            nb = _buf_shift_write(bufs[i], seg, shift, pos)
        elif ln:
            nb = _buf_write(bufs[i], seg, pos)
        else:  # grow with nothing new (prefetched): buffer already current
            nb = bufs[i]
        new_bufs.append(nb)
        off += ln
    aux = jax.lax.slice(up, (off,), (off + aux_size,))
    return tuple(new_bufs), aux


@functools.partial(jax.jit, static_argnames=("kind", "ln", "cap"))
def _apply_plan_row_jit(up, buf, off, pos, shift, kind, ln, cap):
    """One stream's upload plan against the shared device blob.

    The B>1 serving path applies plans row-by-row with THIS function instead
    of the fused ``_apply_plans_jit``: the fused program's static signature is
    the whole (kinds, lens) tuple, so a 16-stream group churning through
    joins/trims at different ticks would mint a fresh multi-second XLA compile
    per distinct per-position pattern. Here the signature is one row's
    (kind, len-bucket) — ≤ ~a dozen programs ever, shared by every row of
    every group. Row offset/write-position/shift ride as traced scalars; the
    blob is already device-resident, so the extra per-row dispatches are
    ~12 µs async each, not transfers."""
    pos = up[pos].astype(jnp.int32)  # meta indices resolved in-program: the
    shift = up[shift].astype(jnp.int32)  # caller passes blob positions, not values
    seg = jax.lax.dynamic_slice(up, (off,), (ln,)) if ln else up[:0]
    if kind == "full":
        return _buf_place(seg, cap)
    if kind == "shift":
        return _buf_shift_write(buf, seg, shift, pos)
    if ln:
        return _buf_write(buf, seg, pos)
    return buf


@functools.partial(jax.jit, static_argnames=("aux_size",))
def _slice_aux_jit(up, start, aux_size):
    return jax.lax.dynamic_slice(up, (start,), (aux_size,))


@dataclasses.dataclass
class Word:
    start: float
    end: float
    word: str
    probability: float = 1.0


@dataclasses.dataclass
class Segment:
    start: float
    end: float
    text: str
    words: list[Word]
    avg_logprob: float = 0.0
    no_speech_prob: float = 0.0


class TranscriptionResult(list):
    """A list of Segments that also carries the raw token ids of the window —
    the online processor feeds these back as the stable prefix of the next
    incremental re-decode (streaming/online.py)."""

    tokens: list[int]

    def __init__(self, segments, tokens=None):
        super().__init__(segments)
        self.tokens = tokens or []


class TPUWhisperASR:
    """Whisper backend on TPU. ``sep=""`` — words carry their leading space."""

    sep = ""
    supports_prefix = True  # incremental re-decode via forced token prefix

    def __init__(
        self,
        model_size: str = "tiny",
        language: Optional[str] = "en",
        checkpoint_dir: Optional[str] = None,
        params=None,
        cfg: Optional[W.WhisperConfig] = None,
        tokenizer: Optional[Tokenizer] = None,
        dtype=jnp.bfloat16,
        beam_size: int = 1,
        seed: int = 0,
        word_timestamps: bool = True,
        quantization: Optional[str] = None,  # None | "int8" (decoder weight-only)
    ):
        from realtime_whisper_asr_tpu.utils.warmup import start_background_warmup

        start_background_warmup()  # absorb the axon first-transfer cost early
        if checkpoint_dir is not None:
            from realtime_whisper_asr_tpu.models.whisper.checkpoint import (
                is_native_checkpoint,
                load_checkpoint,
            )

            if is_native_checkpoint(checkpoint_dir):
                self.cfg, self.params = load_checkpoint(checkpoint_dir, dtype)
            else:
                self.cfg, self.params = W.load_checkpoint_dir(checkpoint_dir, dtype)
        elif params is not None:
            self.cfg, self.params = cfg, params
        else:
            self.cfg = cfg or W.get_config(model_size)
            logger.warning(
                "no checkpoint provided; initializing %s with random weights", self.cfg.name
            )
            self.params = W.init_params(self.cfg, jax.random.PRNGKey(seed), dtype)
        # a native checkpoint may carry pre-quantized weights (see
        # tools/convert_checkpoint.py --quantize): detect them so inference
        # reports the artifact's quantization and the transforms below stay
        # no-ops (all quantize_* are idempotent) instead of a silent mismatch
        from realtime_whisper_asr_tpu.models.whisper.quant import detect_quantization

        pre_quant = detect_quantization(self.params) if checkpoint_dir is not None else None
        if pre_quant is not None:
            logger.info("checkpoint carries pre-quantized weights (%s)", pre_quant)
            if quantization in (None, "", "none"):
                quantization = pre_quant
            else:
                # a pre-quantized artifact cannot be weakened: the f32 weights
                # are gone, so e.g. int8-all prequant + requested "int8" would
                # RUN int8-all while reporting int8. Report what actually runs.
                rank = {"int8": 1, "int8-all": 2, "int8-kv": 2,
                        "int4": 3, "int4-all": 4}
                if rank.get(pre_quant, 0) > rank.get(quantization, 0):
                    logger.warning(
                        "checkpoint is pre-quantized %s; requested %r cannot "
                        "weaken it — running (and reporting) %s",
                        pre_quant, quantization, pre_quant,
                    )
                    quantization = pre_quant
        if quantization == "int8":
            from realtime_whisper_asr_tpu.models.whisper.quant import quantize_decoder

            self.params = quantize_decoder(self.params)
        elif quantization in ("int8-all", "int8-kv"):
            from realtime_whisper_asr_tpu.models.whisper.quant import quantize_all

            self.params = quantize_all(self.params)
        elif quantization == "int4":
            # int4-g128 decoder blocks (nibble-packed) + int8 logits head:
            # half the int8 tier's HBM residency and checkpoint size at
            # measured step-time parity — the multi-stream capacity tier
            # beyond the reference's CTranslate2 int8 (asr_components.py:264)
            from realtime_whisper_asr_tpu.models.whisper.quant import (
                quantize_decoder_int4,
            )

            self.params = quantize_decoder_int4(self.params)
        elif quantization == "int4-all":
            from realtime_whisper_asr_tpu.models.whisper.quant import quantize_all_int4

            self.params = quantize_all_int4(self.params)
        elif quantization not in (None, "", "none"):
            raise ValueError(f"unknown quantization {quantization!r}")
        self.quantization = quantization if quantization not in ("", "none") else None
        #: "int8-kv" additionally stores decode KV caches as int8 rows +
        #: per-row scales. Measured on v5e at batch 1 this LOSES: the per-step
        #: dynamic quantization (VPU) costs more than the halved KV HBM read
        #: saves (decode 1.73 → 2.49 ms/token), so it is a separate opt-in —
        #: the KV read scales with batch while weights don't, so it can win
        #: at high serving batch sizes.
        self._kv_quant = quantization == "int8-kv"
        # inference-time QKV fusion: one matmul instead of three per layer on
        # the latency-bound batch-1 decode step (training/sharding keep the
        # canonical unfused layout; see parallel/sharding.py)
        from realtime_whisper_asr_tpu.models.whisper.quant import fuse_qkv

        self.params = fuse_qkv(self.params)
        self.tokenizer = tokenizer or get_tokenizer(self.cfg, checkpoint_dir)
        #: (L, H) f32 weights for DTW cross-attention capture; loaded from the
        #: checkpoint's generation_config.json alignment_heads when available
        #: (HF convention), else the top-half-layers default in decode.py
        self.alignment_heads = self._load_alignment_heads(checkpoint_dir)
        self.original_language = language if self.cfg.is_multilingual else None
        self.task = "transcribe"
        self.beam_size = beam_size
        self.word_timestamps = word_timestamps
        self.transcribe_kargs: dict = {}
        #: anti-hallucination guard: cap the transcript per window at
        #: ``8 + rate × window_seconds`` tokens. Real speech lands at ~3-4
        #: tokens/s (whisper's 224-token cap for a 30 s window is ~7.5/s), so
        #: a degenerate repetition loop on a short window is cut off early
        #: instead of running to max_new_tokens; None disables. Rides in the
        #: aux bundle as the exact runtime cap (no retraces beyond the static
        #: {16,48,96,224} loop buckets).
        self.max_tokens_per_second: Optional[float] = None
        self.adaptive_params = None  # optional AdaptiveWhisperParams (pipeline.stretch)
        self._vad_flag = False  # protocol parity; VAD is the VAC processor's job
        self._encode = jax.jit(W.encode, static_argnames=("cfg",))

        # ring-slice + Pallas log-mel + stack + encode as ONE jitted program:
        # run eagerly these were 4-6 separate dispatches per tick, each paying
        # host-dispatch latency on a tunneled backend, and XLA couldn't
        # schedule mel against the encoder prologue. ``sep``/``sep_dil``: the
        # optional fused vocal-separation frontend (set_separation_frontend) —
        # the mask net runs on each stream's decode window INSIDE this
        # program, so separation costs zero host CPU and zero extra transfers
        # (the reference runs Demucs per-chunk on the host hot loop,
        # vocal_separation.py:187-213; TPU-first this is an encode prologue)
        def _logmel_encode_impl(params, cfg, bufs, nb, sep, sep_dil):
            from realtime_whisper_asr_tpu.ops import log_mel_spectrogram

            windows = [jax.lax.slice(b, (0,), (nb,)) for b in bufs]
            if sep is not None:
                from realtime_whisper_asr_tpu.models.separation_nn import (
                    separate_vocals,
                )

                windows = [separate_vocals(sep, w, dil=sep_dil) for w in windows]
            mels = [log_mel_spectrogram(w, n_mels=cfg.n_mels) for w in windows]
            mel = jnp.stack(mels).astype(self.params_dtype)
            return W.encode(params, cfg, mel)

        self._logmel_encode = jax.jit(
            _logmel_encode_impl, static_argnames=("cfg", "nb", "sep_dil")
        )
        #: fused separation frontend: (device params, static dilations) or None
        self._sep_frontend = None
        # device-resident rolling audio buffers, one per stream (multi-stream
        # serving shares one model; each stream keeps its own window mirror)
        self._buffers: dict = {}
        self._active_stream = None
        self._sample_seed = seed
        #: whisper's quality-retry ladder (compression ratio / avg logprob
        #: gates, then re-decode at rising temperature). Off by default for
        #: deterministic streaming; enable for offline quality parity with
        #: faster-whisper's temperature=[0, .2, .4, .6, .8, 1] default.
        self.temperature_fallback = False
        self.compression_ratio_threshold = 2.4
        self.logprob_threshold = -1.0
        #: sequential >30 s windowing carries each window's decoded text as
        #: the next window's prompt (faster-whisper's
        #: condition_on_previous_text=True, reference asr_components.py:286).
        #: Streaming ticks are single-window; their context carry is the
        #: online processor's 300-char prompt (streaming/online.py).
        self.condition_on_previous_text = True
        #: optional utils.profiling.PhaseTimer — when set, _transcribe_window
        #: blocks at phase boundaries (upload/encode/decode/download/host) for
        #: an auditable latency breakdown. Diagnostic mode: the blocking
        #: serializes work the async dispatch otherwise overlaps.
        self.phase_timer = None
        #: decode-throughput counters (tokens/s, MFU estimation in bench.py)
        self.counters = {"new_tokens": 0, "ticks": 0, "encoded_frames": 0,
                         "h2d_transfers": 0, "h2d_bytes": 0}
        # idle keep-alive (start_idle_keepalive): tiny h2d pings while the
        # session sleeps between realtime chunks
        self._keepalive_thread = None
        self._keepalive_stop = None
        self._last_h2d_t = 0.0
        try:
            self._extra_suppress = tuple(self.tokenizer.non_speech_ids())
        except AttributeError:
            self._extra_suppress = ()

    # ------------------------------------------------------------------ utils

    #: encoder window buckets (seconds). Streaming buffers are ≤ ~16 s after
    #: trimming, so most ticks encode the 8 s or 16 s bucket instead of the
    #: full 30 s pad — 2–4× less encoder/cross-KV work, one extra trace each.
    WINDOW_BUCKETS_S = (8.0, 16.0, 30.0)
    #: upload chunk buckets (samples): the per-tick NEW audio suffix
    _CHUNK_BUCKETS = (16000, 64000, WINDOW_SAMPLES)
    _CAP = WINDOW_SAMPLES + 64000  # device ring capacity (window + append slack)

    def _find_shift(self, mirror: np.ndarray, audio: np.ndarray) -> Optional[int]:
        """Find k > 0 with mirror[k:] == audio[:len(mirror)-k] (front trim).

        Any verified k is correct (content equality is the only requirement),
        so periodic audio with several candidates is fine. Bounded work: an
        8-sample signature scan + at most a few full verifications.
        """
        n_old = len(mirror)
        if n_old < 16 or len(audio) < 8:
            return None
        from numpy.lib.stride_tricks import sliding_window_view

        sig = audio[:8]
        wins = sliding_window_view(mirror, 8)
        cand = np.flatnonzero((wins == sig).all(axis=1))
        checked = 0
        for k in cand:
            k = int(k)
            if k == 0:
                continue
            m = n_old - k
            if len(audio) < m or len(audio) - m > self._CHUNK_BUCKETS[-1]:
                continue
            if np.array_equal(audio[:m], mirror[k:]):
                return k
            checked += 1
            if checked >= 4:
                break
        return None

    def _plan_upload(self, key, audio: np.ndarray) -> dict:
        """Decide grow / shift / full upload for one stream's buffer.

        - grow: the previous window is a prefix — upload only the bucketed
          new suffix;
        - shift: the previous window was front-trimmed (buffer trimming,
          streaming/online.py) — the retained audio is already on the chip;
          shift it device-side and upload only the new suffix;
        - full: anything else (stream reset, utterance re-init).

        Payloads are s16-bitcast f32 words (2 samples/word); see
        _words_to_samples. The plan dict carries the host mirror (original
        f32) for the next tick's equality checks.
        """
        audio = np.asarray(audio, np.float32)[: self._CAP - 64000]
        dev_buf, mirror = self._buffers.get(key, (None, np.zeros(0, np.float32)))
        n_old = len(mirror)

        def _suffix_plan(kind: str, n_keep: int, shift_k: int = 0):
            new = audio[n_keep:]
            if kind == "grow" and not len(new):
                # buffer already resident (a prefetch_audio upload landed it):
                # nothing rides the blob and no device write happens
                return {"kind": kind, "words": np.zeros(0, np.float32),
                        "pos": n_keep, "shift_k": 0, "n_new": 0, "mirror": audio}
            cb = next((b for b in self._CHUNK_BUCKETS if len(new) <= b), None)
            # dynamic_update_slice clamps out-of-range starts, which would
            # silently misplace the write — full upload instead
            if cb is None or n_keep + cb > self._CAP:
                return None
            payload = np.zeros(cb, np.float32)
            payload[: len(new)] = new
            return {"kind": kind, "words": _samples_to_words(payload),
                    "pos": n_keep, "shift_k": shift_k, "n_new": len(new),
                    "mirror": audio}

        if dev_buf is not None and len(audio) >= n_old and np.array_equal(audio[:n_old], mirror):
            plan = _suffix_plan("grow", n_old)
            if plan is not None:
                return plan
        if dev_buf is not None:
            k = self._find_shift(mirror, audio)
            if k is not None:
                plan = _suffix_plan("shift", n_old - k, shift_k=k)
                if plan is not None:
                    return plan
        # full replace: pad to the smallest chunk bucket that fits (utterance
        # re-inits carry ~1-2 s of audio; always shipping the 34 s CAP would
        # waste ~1 MB of tunnel time per utterance start). The device side
        # writes the bucketed payload into a zeroed CAP ring.
        fb = next((b for b in self._CHUNK_BUCKETS if len(audio) <= b), self._CAP)
        full = np.zeros(min(fb, self._CAP), np.float32)
        full[: len(audio)] = audio
        return {"kind": "full", "words": _samples_to_words(full), "pos": None,
                "shift_k": 0, "n_new": len(audio), "mirror": audio}

    def _sync_many(self, keys, audios, aux_rows: np.ndarray) -> jnp.ndarray:
        """ONE bundled host→device upload for B streams + all aux rows.

        Streaming buffers grow by appending (or shift device-side after a
        trim); only each stream's new suffix — as s16-bitcast words — rides in
        the blob, followed by the (B, AUX_LEN) aux matrix. Each separate
        transfer costs ~30 ms of tunnel latency, so the batched tick pays
        exactly one upload regardless of B. Device-side slices + ring writes
        are async dispatches (cheap on this backend).
        """
        plans = [self._plan_upload(k, a) for k, a in zip(keys, audios)]
        aux_dev = self._upload_and_apply(keys, plans, aux_rows)
        return aux_dev.reshape(aux_rows.shape)

    _EMPTY_BUF = None  # cached dummy for rows whose plan ignores the old buf

    def _upload_and_apply(self, keys, plans: list[dict], aux_rows) -> jnp.ndarray:
        """ONE transfer (plans' words + aux rows) + ONE jitted apply program."""
        aux_flat = (np.zeros(0, np.float32) if aux_rows is None
                    else np.ascontiguousarray(aux_rows, np.float32).reshape(-1))
        meta = np.asarray(
            [p["pos"] or 0 for p in plans] + [p["shift_k"] for p in plans],
            np.float32,
        )
        self._last_h2d_t = time.monotonic()
        blob = np.concatenate([p["words"] for p in plans] + [aux_flat, meta])
        if len(plans) > 1 and blob.size:
            # the blob's SHAPE is part of every per-row program's jit key —
            # unpadded, each distinct sum-of-row-buckets total (streams
            # joining/trimming in different mixes) re-traced all B row
            # programs mid-serving. Pad to a power-of-two bucket: ≤ ~12
            # distinct shapes ever, and the row programs never read past
            # meta, so the tail is inert. (The B==1 fused path's shape is
            # already pinned by its static (kinds, lens) key.)
            target = 1024
            while target < blob.size:
                target *= 2
            if target != blob.size:
                blob = np.concatenate(
                    [blob, np.zeros(target - blob.size, np.float32)])
        up = jnp.asarray(blob)
        self.counters["h2d_transfers"] += 1
        self.counters["h2d_bytes"] += blob.nbytes
        if TPUWhisperASR._EMPTY_BUF is None:
            TPUWhisperASR._EMPTY_BUF = jnp.zeros(self._CAP, jnp.float32)
        kinds = tuple(p["kind"] for p in plans)
        lens = tuple(len(p["words"]) for p in plans)
        bufs = tuple(
            self._buffers[k][0] if p["kind"] != "full" else TPUWhisperASR._EMPTY_BUF
            for k, p in zip(keys, plans)
        )
        if len(plans) == 1:
            # single stream: the fused program's signature space is tiny
            # (4 kinds × ~4 len buckets) and it keeps the tick at one dispatch
            new_bufs, aux_dev = _apply_plans_jit(
                up, bufs, kinds=kinds, lens=lens, cap=self._CAP, aux_size=aux_flat.size,
            )
        else:
            # B>1 serving group: per-row programs — the fused signature over
            # the whole (kinds, lens) tuple retraces combinatorially as
            # streams join/trim at different ticks (see _apply_plan_row_jit)
            n = len(plans)
            meta_off = sum(lens) + aux_flat.size
            new_bufs, off = [], 0
            for i, (kind, ln, buf) in enumerate(zip(kinds, lens, bufs)):
                new_bufs.append(
                    _apply_plan_row_jit(up, buf, off, meta_off + i, meta_off + n + i,
                                        kind=kind, ln=ln, cap=self._CAP)
                )
                off += ln
            aux_dev = _slice_aux_jit(up, sum(lens), aux_size=aux_flat.size)
        for k, nb, plan in zip(keys, new_bufs, plans):
            self._buffers[k] = (nb, plan["mirror"].copy())
        return aux_dev

    def prefetch_audio(self, audio: np.ndarray, key=None) -> bool:
        """Upload a stream's current buffer NOW, off the tick critical path.

        Called at audio-insert time (streaming/online.py) while the pipeline
        is otherwise idle between ticks: the upload (async dispatch + tunnel
        transit) overlaps dead time, so the next tick's bundled upload
        degenerates to the ~1.6 KB aux row (round-2 VERDICT #2a / ROADMAP #2
        "serving upload prefetch" — worth ~the upload data time per tick).
        Returns True when an upload was dispatched, False when the buffer was
        already resident. Safe to call any number of times between ticks; the
        grow/shift/full planner makes each call incremental."""
        key = self._active_stream if key is None else key
        audio = np.asarray(audio, np.float32)
        plan = self._plan_upload(key, audio)
        if plan["kind"] == "grow" and plan["n_new"] == 0:
            return False
        self._upload_and_apply([key], [plan], None)
        return True

    def _sync_audio_and_aux(self, audio: np.ndarray, aux_np: np.ndarray):
        """Single-stream tick: one bundled upload (see _sync_many)."""
        return self._sync_many(
            [self._active_stream], [audio], aux_np.reshape(1, -1)
        ).reshape(-1)

    def set_active_stream(self, key) -> None:
        """Select which per-stream device buffer transcribe() grows."""
        self._active_stream = key

    def drop_stream(self, key) -> None:
        self._buffers.pop(key, None)

    # ----------------------------------------------------------- keep-alive

    def start_idle_keepalive(self, interval_s: Optional[float] = None) -> bool:
        """Ping the device with a tiny async upload whenever the host→device
        path has been idle for ``interval_s``.

        Why: a realtime session sleeps ~1 s between chunks. On a tunneled
        (TCP-relayed) backend that idle gap lets the transport's congestion
        window collapse (RFC 2861 slow-start-after-idle), so the first upload
        of the next tick pays extra round trips — measured as the paced-mode
        upload tax (+14 ms/tick in BENCH_r04 headline_paced_phases: upload
        16.9 ms paced vs 2.5 ms as-fast; tools/microbench_idle_dispatch.py
        isolates it). A 512-byte ping every ~250 ms of idleness keeps the
        window open for ~4 ms/s of overhead. On non-tunneled backends the
        pings are harmless dispatch noise. The reference has no analog (its
        GPU is host-local); this is rig-transport engineering, not model work.

        ``interval_s`` defaults from ``RWA_KEEPALIVE_MS`` (100; ``0`` disables
        and makes this a no-op, the A/B control). 100 ms measured round 4:
        paced RTF 0.0595 vs 0.0718 at the original 250 ms — pings must beat
        the transport's RTO (~200 ms) or the idle window still collapses
        between them; at 100 ms paced equals the as-fast loop (+1%).
        Idempotent; returns whether the pump is running.
        ``stop_idle_keepalive()`` joins the thread.
        """
        if interval_s is None:
            env = os.environ.get("RWA_KEEPALIVE_MS")
            if env is None:
                # default on TUNNELED transports only: on a direct-attached
                # chip the pings buy nothing and just burn host CPU
                # (VERDICT r4 #4); RWA_KEEPALIVE_MS forces either way
                from realtime_whisper_asr_tpu.utils.hardware import (
                    is_tunneled_backend,
                )

                if not is_tunneled_backend():
                    return False
            try:
                interval_s = float(env if env is not None else "100") / 1e3
            except ValueError:
                interval_s = 0.1
        if interval_s <= 0:
            return False
        if self._keepalive_thread is not None and self._keepalive_thread.is_alive():
            return True
        import threading

        stop = threading.Event()
        counters = self.counters

        def _pump():
            seq = 0
            # ping payload size: RFC 2861 congestion-window validation DECAYS
            # cwnd for application-limited senders, so a 512 B ping only
            # prevents the full reset-to-initial-cwnd; RWA_KEEPALIVE_KB can
            # size pings near the tick upload (~34 KB) to hold the window at
            # transfer scale (A/B'd in the round-4 paced sweep)
            try:
                kb = float(os.environ.get("RWA_KEEPALIVE_KB", "0.5"))
            except ValueError:
                kb = 0.5
            n = max(128, (int(kb * 1024) // 4) // 128 * 128)
            scratch = np.zeros(n, np.float32)  # 128-aligned: fast-path size
            while not stop.wait(interval_s / 2):
                if time.monotonic() - self._last_h2d_t < interval_s:
                    continue
                seq += 1
                scratch[0] = seq  # defeat any value-dedup in the runtime
                try:
                    jax.device_put(scratch)  # async; result dropped on purpose
                except Exception:
                    logger.exception("idle keepalive ping failed; stopping pump")
                    return
                self._last_h2d_t = time.monotonic()
                counters["keepalive_h2d"] = counters.get("keepalive_h2d", 0) + 1

        self._keepalive_stop = stop
        self._keepalive_thread = threading.Thread(
            target=_pump, name="rwa-keepalive", daemon=True
        )
        self._keepalive_thread.start()
        return True

    def stop_idle_keepalive(self) -> None:
        if self._keepalive_stop is not None:
            self._keepalive_stop.set()
        t = self._keepalive_thread
        if t is not None and t.is_alive():
            t.join(timeout=2.0)
        self._keepalive_thread = None
        self._keepalive_stop = None

    def _window_bucket(self, n_samples: int) -> int:
        for b in self.WINDOW_BUCKETS_S:
            nb = int(b * SAMPLING_RATE)
            if n_samples <= nb:
                return nb
        return nb

    def _encode_from_buf(self, n_samples: int) -> jnp.ndarray:
        return self._encode_many([self._active_stream], [n_samples])

    def _encode_many(self, keys, n_samples_list) -> jnp.ndarray:
        """Encode B streams' windows in ONE batched encoder call.

        All rows share the largest window bucket in the group (ring tails
        beyond each stream's audio are zero by the upload invariant, and the
        batched encode amortizes weight reads across rows on the MXU).
        """
        nb = max(self._window_bucket(n) for n in n_samples_list)
        from realtime_whisper_asr_tpu.models.whisper.model import encoder_flops

        self.counters["encode_flops"] = self.counters.get("encode_flops", 0) + len(
            keys
        ) * encoder_flops(self.cfg, nb // (2 * 160))
        bufs = tuple(self._buffers[k][0] for k in keys)
        sep, sep_dil = self._sep_frontend or (None, None)
        return self._logmel_encode(self.params, self.cfg, bufs, nb, sep,
                                   sep_dil=sep_dil)

    def set_separation_frontend(self, sep_params) -> None:
        """Fuse a trained spectral-mask separator (models/separation_nn) into
        the jitted logmel+encode program: every decode window is separated
        on-device as an encode prologue. TPU-first replacement for the
        reference's per-chunk host-loop Demucs call
        (vocal_separation.py:187-213, 一键实时识别麦克风.py:1474-1482) — zero
        host CPU, zero extra transfers, and full-window separation has no
        chunk-boundary STFT artifacts. ``None`` removes the frontend. NOTE:
        host-side stages that read raw audio (VAD gate, dedup features) see
        the UNseparated signal in this mode; use the host separator path
        (vocal_separation.fuse_encode=false) to preserve the reference's
        separate-before-everything ordering."""
        if sep_params is None:
            self._sep_frontend = None
            return
        from realtime_whisper_asr_tpu.models.separation_nn import arch_of

        dil, _ = arch_of(sep_params)
        self._sep_frontend = (
            {k: jnp.asarray(v) for k, v in sep_params.items()},
            tuple(tuple(d) for d in dil),
        )

    def _load_alignment_heads(self, checkpoint_dir) -> Optional[np.ndarray]:
        if not checkpoint_dir:
            return None
        import json
        import os

        path = os.path.join(checkpoint_dir, "generation_config.json")
        try:
            with open(path) as f:
                heads = json.load(f).get("alignment_heads")
            if not heads:
                return None
            mask = np.zeros((self.cfg.n_text_layer, self.cfg.n_text_head), np.float32)
            for layer, head in heads:
                mask[layer, head] = 1.0
            return mask
        except (OSError, ValueError, KeyError, IndexError):
            return None

    def _pad_window(self, audio: np.ndarray) -> np.ndarray:
        """Pad to the smallest bucket that fits (static shapes, no retraces)."""
        if len(audio) > WINDOW_SAMPLES:
            audio = audio[:WINDOW_SAMPLES]
        for b in self.WINDOW_BUCKETS_S:
            nb = int(b * SAMPLING_RATE)
            if len(audio) <= nb:
                out = np.zeros(nb, np.float32)
                out[: len(audio)] = audio
                return out
        return np.asarray(audio, np.float32)

    def _encode_window(self, audio: np.ndarray) -> jnp.ndarray:
        from realtime_whisper_asr_tpu.ops import log_mel_spectrogram

        mel = log_mel_spectrogram(jnp.asarray(self._pad_window(audio)), n_mels=self.cfg.n_mels)
        return self._encode(self.params, self.cfg, mel.astype(self.params_dtype)[None])

    @property
    def params_dtype(self):
        return jax.tree.leaves(self.params)[0].dtype

    # --------------------------------------------------------------- protocol

    def transcribe(
        self,
        audio: np.ndarray,
        init_prompt: str = "",
        prefix_ids: Optional[list[int]] = None,
        draft_ids: Optional[list[int]] = None,
    ) -> TranscriptionResult:
        """Transcribe up to 30 s of 16 kHz float32 mono audio into segments.

        The streaming processors always call with a ≤30 s buffer (the reference
        trims at 15 s by default); longer input is windowed sequentially.
        ``prefix_ids`` (stable tokens from the previous tick, incl. timestamp
        tokens) are force-decoded in one prefill pass so only the new tail
        costs autoregressive steps; ``draft_ids`` (the previous hypothesis's
        tail beyond that prefix) are verified in the same pass and accepted
        wholesale where the model agrees (lossless self-speculative decode).
        """
        audio = np.asarray(audio, np.float32)
        if len(audio) <= WINDOW_SAMPLES:
            return self._transcribe_window(audio, init_prompt, 0.0, prefix_ids, draft_ids)
        # sequential >30 s windowing with cross-window conditioning: each
        # window's decoded text rides as the next window's prompt (the
        # reference passes condition_on_previous_text=True to faster-whisper,
        # asr_components.py:286; build_initial_tokens caps the carry at
        # n_text_ctx//2-1 tokens, shedding the oldest first)
        segments: list[Segment] = []
        carry: list[int] = list(self.tokenizer.encode(init_prompt)) if init_prompt else []
        offset = 0
        while offset < len(audio):
            window = audio[offset : offset + WINDOW_SAMPLES]
            segs = self._transcribe_window(
                window, init_prompt, offset / SAMPLING_RATE, None,
                prompt_ids=carry if self.condition_on_previous_text else None,
            )
            segments.extend(segs)
            if self.condition_on_previous_text:
                # segs.tokens is the SAMPLED region only (decode rows start
                # past the prompt/sot prefill — _unpack_packed_rows), so this
                # never re-appends the carried context; < eot also drops
                # timestamp/special tokens. max(0, ...): a bare negative slice
                # over-deleted whenever cap/2 < len < cap (kept cap-len
                # tokens instead of all of them)
                carry.extend(t for t in segs.tokens if t < self.cfg.eot)
                del carry[: max(0, len(carry) - (self.cfg.n_text_ctx // 2 - 1))]
            if segs and segs[-1].end * SAMPLING_RATE > offset + 1:
                offset = int(segs[-1].end * SAMPLING_RATE)
            else:
                offset += WINDOW_SAMPLES
        return TranscriptionResult(segments)

    def _make_opts(self) -> D.DecodeOptions:
        kargs = dict(self.transcribe_kargs)
        if self.adaptive_params is not None:
            # speech-rate-adaptive decode params (reference asr_components.py:
            # 267-275 wires AdaptiveWhisperParams the same way)
            try:
                kargs.update(self.adaptive_params.get_transcribe_kwargs(
                    getattr(self.adaptive_params, "rate_class", "normal")))
            except Exception:
                pass
        return D.DecodeOptions(
            task=self.task,
            language=self.original_language,
            beam_size=kargs.pop("beam_size", self.beam_size),
            timestamps=True,
            word_timestamps=self.word_timestamps,
            **kargs,
        )

    def _density_cap(self, max_new_cap: int, n_prefix: int, window_samples: int) -> int:
        """Fold the per-second transcript cap into the DYNAMIC max_new_cap that
        rides in the aux bundle. Deliberately not folded into opts: opts is a
        static jit argument, so a per-tick max_total_tokens would mint a new
        trace (and a fresh compile) for every distinct window length."""
        if self.max_tokens_per_second is None:
            return max_new_cap
        total = int(8 + self.max_tokens_per_second * window_samples / SAMPLING_RATE)
        return max(1, min(max_new_cap, total - n_prefix))

    def transcribe_batch(self, items: list[dict]) -> list[TranscriptionResult]:
        """Batched multi-stream tick: B streams, ONE upload + ONE batched
        encode + ONE batched decode + ONE download (serving capacity lever —
        incremental decode is weight-bandwidth-bound, so B streams cost
        barely more device time than one).

        ``items``: list of ``{"key", "audio", "init_prompt"?, "prefix_ids"?}``.
        Callers group items by language/task (DecodeOptions are shared across
        the batch). B is padded to a power of two (duplicating the last row)
        so batch sizes don't multiply traces; pad rows are dropped on return.
        """
        if len(items) == 1:
            it = items[0]
            self.set_active_stream(it["key"])
            return [
                self.transcribe(
                    it["audio"], it.get("init_prompt") or "", it.get("prefix_ids"),
                    it.get("draft_ids"),
                )
            ]
        return self.transcribe_batch_finalize(self.transcribe_batch_dispatch(items))

    def transcribe_batch_dispatch(self, items: list[dict]) -> dict:
        """Non-blocking half of transcribe_batch: plan + upload + encode +
        enqueue the decode loop, returning a handle. JAX dispatch is async, so
        the scheduler can prepare the NEXT group's tick (host planning, upload)
        while this group's decode runs on the chip; the handle's result
        transfer happens in ``transcribe_batch_finalize``. At B=1 this hits the
        exact traces of the single-stream path (no trace multiplication)."""
        n_real = len(items)
        padded = list(items)
        while padded and (len(padded) & (len(padded) - 1)):
            padded.append(padded[-1])
        opts = self._make_opts()
        keys, audios, requests = [], [], []
        for it in padded:
            prompt = it.get("init_prompt") or ""
            requests.append({
                "prompt_tokens": self.tokenizer.encode(prompt) if prompt else None,
                "prefix_tokens": it.get("prefix_ids"),
                "draft_tokens": it.get("draft_ids"),
                "seed": self._sample_seed,
            })
            audios.append(np.asarray(it["audio"], np.float32))
            keys.append(it["key"])
        planned = D.plan_batch_aux(self.cfg, opts, requests)
        if self.max_tokens_per_second is not None:
            # per-row density cap via the dynamic aux field (see _density_cap)
            for row, aud in zip(planned[0], audios):
                row["aux"][D.AUX_TOK + 4] = self._density_cap(
                    int(row["aux"][D.AUX_TOK + 4]), int(row["aux"][D.AUX_TOK]),
                    len(aud),
                )
        aux_rows = np.stack([r["aux"] for r in planned[0]])
        pt = self.phase_timer
        if pt is not None:
            pt.mark()
        aux_dev = self._sync_many(keys, audios, aux_rows)
        if pt is not None:
            jax.block_until_ready(aux_dev)
            pt.lap("upload")
        xa = self._encode_many(keys, [len(a) for a in audios])
        if pt is not None:
            jax.block_until_ready(xa)
            pt.lap("encode")
        if opts.beam_size > 1:
            # batched beam (vmapped per-stream loops) — beam_size is a
            # first-class serving knob, not a single-stream-only mode
            from realtime_whisper_asr_tpu.models.whisper.beam import (
                beam_decode_batch_dispatch,
            )

            handle = beam_decode_batch_dispatch(
                self.params, self.cfg, xa, opts, requests,
                extra_suppress=self._extra_suppress,
                alignment_heads=self.alignment_heads,
                aux_device=aux_dev, phase_timer=pt, planned=planned,
                kv_quant=self._kv_quant,
            )
            handle["beam"] = True
        else:
            handle = D.greedy_decode_batch_dispatch(
                self.params, self.cfg, xa, opts, requests,
                extra_suppress=self._extra_suppress,
                alignment_heads=self.alignment_heads,
                aux_device=aux_dev, phase_timer=pt, planned=planned,
                kv_quant=self._kv_quant,
            )
        return {"handle": handle, "items": items, "requests": requests,
                "n_real": n_real}

    def transcribe_batch_finalize(self, st: dict) -> list[TranscriptionResult]:
        """Blocking half of transcribe_batch: collect + parse the dispatched
        group's results (one device→host transfer)."""
        items, requests, n_real = st["items"], st["requests"], st["n_real"]
        if st["handle"].get("beam"):
            from realtime_whisper_asr_tpu.models.whisper.beam import (
                beam_decode_batch_finalize,
            )

            results = beam_decode_batch_finalize(st["handle"])
        else:
            results = D.greedy_decode_batch_finalize(st["handle"])
        out: list[TranscriptionResult] = []
        for it, res, req in zip(items[:n_real], results[:n_real], requests[:n_real]):
            n_frames = min(len(it["audio"]) // (2 * 160), self.cfg.n_audio_ctx)
            segs = self._parse_segments(res, n_frames, 0.0)
            ids = res.tokens[0][: res.lengths[0]].tolist()
            if ids and ids[-1] == self.cfg.eot:
                ids = ids[:-1]
            out.append(TranscriptionResult(segs, tokens=ids))
            self.counters["ticks"] += 1
            self.counters["new_tokens"] += int(res.lengths[0]) - len(req["prefix_tokens"] or [])
        pt = self.phase_timer
        if pt is not None:
            pt.lap("host_parse")
        return out

    def transcribe_dispatch(
        self,
        audio: np.ndarray,
        init_prompt: str = "",
        prefix_ids: Optional[list[int]] = None,
        draft_ids: Optional[list[int]] = None,
        key=None,
        device_draft: Optional[dict] = None,
    ) -> dict:
        """Non-blocking half of ``transcribe`` for ≤30 s windows: plan + upload
        + encode + enqueue the decode loop, returning a handle for
        ``transcribe_finalize``. ``device_draft`` (async-pipelined streaming):
        ``{"packed", "offset", "max_new", "row_len"}`` referencing the previous
        tick's device-resident result — spliced into the draft slots on device.

        This is the single-stream face of the dispatch/finalize pair that
        powers the streaming pipeline (OnlineASRProcessor(pipeline=True)):
        the tick loop dispatches tick N and THEN finalizes tick N-1, so the
        ~26-31 ms tunnel round trip of N-1's result download travels while
        N's decode runs on the chip instead of serializing in front of it.
        Shares ``_transcribe_window``'s planning code exactly (same buckets,
        same traces, token-identical results — the batched path's prompt
        re-bucketing left-pads the prefill and is NOT position-preserving, so
        it is deliberately not used here). Falls back to a synchronous call
        (result wrapped in the handle) for >30 s windows, which are
        sequentially windowed by construction.
        """
        audio = np.asarray(audio, np.float32)
        if len(audio) > WINDOW_SAMPLES:
            return {"sync_result": self.transcribe(audio, init_prompt, prefix_ids, draft_ids)}
        prev = self._active_stream
        if key is not None and key != prev:
            self.set_active_stream(key)
        try:
            return self._transcribe_window_dispatch(
                audio, init_prompt, 0.0, prefix_ids, draft_ids,
                device_draft=device_draft,
            )
        finally:
            if key is not None and key != prev:
                self._active_stream = prev

    def transcribe_finalize(self, st: dict) -> TranscriptionResult:
        """Blocking half of ``transcribe_dispatch`` (one device→host
        transfer + host parse)."""
        if "sync_result" in st:
            return st["sync_result"]
        return self._transcribe_window_finalize(st)

    def _transcribe_window(
        self,
        audio: np.ndarray,
        init_prompt: str,
        time_offset: float,
        prefix_ids: Optional[list[int]] = None,
        draft_ids: Optional[list[int]] = None,
        prompt_ids: Optional[list[int]] = None,  # overrides init_prompt (carry)
    ) -> TranscriptionResult:
        return self._transcribe_window_finalize(
            self._transcribe_window_dispatch(
                audio, init_prompt, time_offset, prefix_ids, draft_ids, prompt_ids
            )
        )

    def _transcribe_window_dispatch(
        self,
        audio: np.ndarray,
        init_prompt: str,
        time_offset: float,
        prefix_ids: Optional[list[int]] = None,
        draft_ids: Optional[list[int]] = None,
        prompt_ids: Optional[list[int]] = None,  # overrides init_prompt (carry)
        device_draft: Optional[dict] = None,  # async-pipeline device-side draft
    ) -> dict:
        """Non-blocking half of ``_transcribe_window``: plan + ONE bundled
        upload + encode + enqueue the decode loop. Identical planning (and
        traces) to the synchronous path — the pipelined streaming loop relies
        on this for token-exactness with the non-pipelined loop."""
        t0 = time.perf_counter()
        opts = self._make_opts()
        if prompt_ids is None:
            prompt_ids = self.tokenizer.encode(init_prompt) if init_prompt else None
        if opts.beam_size > 1:
            draft_ids = None  # beam path has no speculative fast path
        # host-side token planning, then ONE bundled upload (audio suffix + aux)
        init, sot_index, n_prefix = D.build_initial_tokens(
            self.cfg, opts, prompt_ids, prefix_ids
        )
        ts_in_prefix = [int(t) for t in init[len(init) - n_prefix :] if t >= self.cfg.timestamp_begin]
        _, max_new_cap = D.plan_decode_budget(self.cfg, opts, int(init.shape[0]), n_prefix)
        max_new_cap = self._density_cap(max_new_cap, n_prefix, len(audio))
        aux_np = D.pack_aux(
            init, n_prefix, sot_index, ts_in_prefix[-1] if ts_in_prefix else -1,
            seed=self._sample_seed, max_new_cap=max_new_cap,
            draft=np.asarray(draft_ids or [], np.int32),
            temperature=opts.temperature,
        )
        pt = self.phase_timer
        if pt is not None:
            pt.mark()
        aux_dev = self._sync_audio_and_aux(audio, aux_np)
        if device_draft is not None and opts.beam_size == 1:
            # async-pipelined streaming: splice the PREVIOUS tick's
            # device-resident sampled tokens into this tick's draft slots
            # (patch_aux_device_draft) — no host round trip touches the draft
            aux2d = aux_dev.reshape(1, D.AUX_LEN) if aux_dev.ndim == 1 else aux_dev
            aux_dev = D.patch_aux_device_draft(
                aux2d, device_draft["packed"], device_draft["offset"],
                prev_max_new=device_draft["max_new"],
                prev_row_len=device_draft["row_len"], eot=self.cfg.eot,
                force=device_draft.get("force", False),
                safety=device_draft.get("safety", 4),
            )
            draft_ids = None  # the device draft replaces any host draft
        if pt is not None:
            # ONE representative block: the ring write consumes the same
            # uploaded blob as aux, so it covers the whole upload chain —
            # blocking each array separately would bill one extra ~30 ms
            # round-trip to "upload" on this backend
            jax.block_until_ready(self._buffers[self._active_stream][0])
            pt.lap("upload")
        xa = self._encode_from_buf(len(audio))
        if pt is not None:
            jax.block_until_ready(xa)
            pt.lap("encode")
        if opts.beam_size > 1:
            from realtime_whisper_asr_tpu.models.whisper.beam import beam_decode_dispatch

            handle = beam_decode_dispatch(
                self.params, self.cfg, xa, opts,
                prompt_tokens=prompt_ids, prefix_tokens=prefix_ids,
                extra_suppress=self._extra_suppress, aux_device=aux_dev,
                alignment_heads=self.alignment_heads,
                kv_quant=self._kv_quant,
                **({"phase_timer": pt} if pt is not None else {}),
            )
        else:
            handle = D.greedy_decode_dispatch(
                self.params, self.cfg, xa, opts,
                prompt_tokens=prompt_ids, prefix_tokens=prefix_ids,
                extra_suppress=self._extra_suppress, aux_device=aux_dev,
                alignment_heads=self.alignment_heads,
                kv_quant=self._kv_quant,
                draft_tokens=draft_ids,
                force_draft_bucket=device_draft is not None,
                **({"phase_timer": pt} if pt is not None else {}),
            )
        return {
            "decode_handle": handle, "beam": opts.beam_size > 1,
            "xa": xa, "opts": opts, "prompt_ids": prompt_ids,
            "prefix_ids": prefix_ids, "audio_len": len(audio),
            "time_offset": time_offset, "t0": t0,
        }

    def _transcribe_window_finalize(self, st: dict) -> TranscriptionResult:
        """Blocking half of ``_transcribe_window``: ONE result download, then
        counters, optional quality-retry ladder, and segment parsing."""
        opts, prefix_ids = st["opts"], st["prefix_ids"]
        if st["beam"]:
            from realtime_whisper_asr_tpu.models.whisper.beam import beam_decode_finalize

            result = beam_decode_finalize(st["decode_handle"])
        else:
            result = D.greedy_decode_finalize(st["decode_handle"])
        self.counters["ticks"] += 1
        self.counters["new_tokens"] += int(result.lengths[0]) - (len(prefix_ids or []))
        self.counters["encoded_frames"] += min(st["audio_len"] // (2 * 160), self.cfg.n_audio_ctx)
        if self.temperature_fallback and opts.temperature == 0.0:
            result = self._quality_retry(result, st["xa"], opts, st["prompt_ids"], prefix_ids)
        n_frames = min(st["audio_len"] // (2 * 160), self.cfg.n_audio_ctx)
        segs = self._parse_segments(result, n_frames, st["time_offset"])
        logger.debug(
            "transcribe window %.1fs in %.0f ms -> %d segments",
            st["audio_len"] / SAMPLING_RATE, 1e3 * (time.perf_counter() - st["t0"]),
            len(segs),
        )
        ids = result.tokens[0][: result.lengths[0]].tolist()
        if ids and ids[-1] == self.cfg.eot:
            ids = ids[:-1]
        pt = self.phase_timer
        if pt is not None:
            pt.lap("host_parse")
        return TranscriptionResult(segs, tokens=ids)

    def _parse_segments(
        self, result: D.DecodeResult, n_frames: int, time_offset: float
    ) -> list[Segment]:
        cfg = self.cfg
        ids = result.tokens[0][: result.lengths[0]].tolist()
        if ids and ids[-1] == cfg.eot:
            ids = ids[:-1]
        # word times via DTW over captured cross-attention
        words: list[tuple[float, float, str]] = []
        word_token_counts: list[int] = []
        if self.word_timestamps and result.xattn is not None and ids:
            words, word_token_counts = TS.word_timestamps(
                ids, result.xattn[0][: len(ids)], self.tokenizer, n_frames, time_offset,
                return_token_counts=True, language=self.original_language,
            )
        # split into segments at timestamp-token pairs
        segments: list[Segment] = []
        ts0 = cfg.timestamp_begin
        cur_text: list[int] = []
        seg_start = time_offset
        last_end = time_offset
        widx = 0
        tok_consumed = 0  # text tokens already assigned to earlier segments
        for tok in ids:
            if tok >= ts0:
                t = time_offset + cfg.timestamp_to_seconds(tok)
                if cur_text:
                    # assign words whose tokens fall inside this segment's text
                    # tokens (words may span multiple tokens — count tokens,
                    # not words)
                    seg_words = []
                    seg_token_budget = sum(1 for i in cur_text if i < cfg.eot)
                    used = 0
                    while widx < len(words) and used < seg_token_budget:
                        b, e, wtext = words[widx]
                        used += word_token_counts[widx] if widx < len(word_token_counts) else 1
                        seg_words.append(Word(b, e, wtext))
                        widx += 1
                    tok_consumed += seg_token_budget
                    segments.append(
                        Segment(
                            start=seg_start,
                            end=max(t, seg_start),
                            text=self.tokenizer.decode(cur_text),
                            words=seg_words,
                            avg_logprob=float(result.avg_logprob[0]),
                            no_speech_prob=float(result.no_speech_prob[0]),
                        )
                    )
                    cur_text = []
                seg_start = t
                last_end = t
            elif tok < cfg.eot:
                cur_text.append(tok)
        if cur_text:
            seg_words = [Word(b, e, w) for b, e, w in words[widx:]]
            end = seg_words[-1].end if seg_words else last_end + 2.0
            end = max(end, seg_start)  # timestamp sanity (cf. reference 一键…py:1524-1541)
            segments.append(
                Segment(
                    start=seg_start,
                    end=end,
                    text=self.tokenizer.decode(cur_text),
                    words=seg_words,
                    avg_logprob=float(result.avg_logprob[0]),
                    no_speech_prob=float(result.no_speech_prob[0]),
                )
            )
        return segments

    def _quality_retry(self, result, xa, opts, prompt_ids, prefix_ids):
        """Re-decode at rising temperature when the greedy pass looks degenerate
        (repetition → high zlib compression ratio; low avg logprob)."""
        import zlib

        def bad(res) -> bool:
            ids = res.tokens[0][: res.lengths[0]].tolist()
            text = self.tokenizer.decode(ids).encode("utf-8")
            if len(text) > 16:
                ratio = len(text) / max(len(zlib.compress(text)), 1)
                if ratio > self.compression_ratio_threshold:
                    return True
            return float(res.avg_logprob[0]) < self.logprob_threshold

        if not bad(result):
            return result
        for t in (0.2, 0.4, 0.6, 0.8, 1.0):
            self._sample_seed += 1
            retry_opts = dataclasses.replace(opts, temperature=t)
            retry = D.greedy_decode(
                self.params, self.cfg, xa, retry_opts,
                prompt_tokens=prompt_ids, prefix_tokens=prefix_ids,
                extra_suppress=self._extra_suppress, seed=self._sample_seed,
                alignment_heads=self.alignment_heads, kv_quant=self._kv_quant,
            )
            if not bad(retry):
                return retry
            result = retry
        return result

    def ts_words(self, segments: Sequence[Segment]) -> list[tuple[float, float, str]]:
        out = []
        for seg in segments:
            if seg.no_speech_prob > 0.9 and seg.avg_logprob < -1.0:
                continue
            for w in seg.words:
                out.append((w.start, w.end, w.word))
        return out

    def segments_end_ts(self, segments: Sequence[Segment]) -> list[float]:
        return [s.end for s in segments]

    def set_translate_task(self):
        self.task = "translate"

    def use_vad(self):
        self._vad_flag = True

    # ------------------------------------------------------------ extra API

    def transcribe_with_fallback(self, audio: np.ndarray, init_prompt: str = ""):
        """Offline-quality path: greedy + the temperature-retry ladder."""
        prev = self.temperature_fallback
        self.temperature_fallback = True
        try:
            return self.transcribe(audio, init_prompt)
        finally:
            self.temperature_fallback = prev

    def detect_language(self, audio: np.ndarray) -> tuple[str, float]:
        """(language, probability) from one decoder step at SOT."""
        cfg = self.cfg
        if not cfg.is_multilingual:
            return "en", 1.0
        xa = self._encode_window(np.asarray(audio, np.float32))
        cache = W.init_cache(self.params, cfg, xa)
        logits, _, _ = W.decode_step(
            self.params, cfg, jnp.asarray([cfg.sot], jnp.int32), jnp.int32(0), cache
        )
        lang_ids = np.arange(cfg.sot + 1, cfg.sot + 1 + cfg.num_languages)
        # normalize over language tokens only (whisper's detect_language semantics)
        lang_probs = np.asarray(jax.nn.softmax(logits[0, lang_ids].astype(jnp.float32)))
        best = int(np.argmax(lang_probs))
        return W.LANGUAGES[best], float(lang_probs[best])


#: protocol-name aliases for reference-parity imports: both reference backends
#: (faster-whisper's word_timestamps and whisper-timestamped's DTW) map to the
#: same TPU implementation — word times here ARE cross-attention DTW.
FasterWhisperASR = TPUWhisperASR
WhisperTimestampedASR = TPUWhisperASR
