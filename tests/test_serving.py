"""Multi-stream server tests: fair scheduling, isolation, flush, shedding."""

import numpy as np

from realtime_whisper_asr_tpu.serving import StreamServer
from tests.test_streaming import ScriptedProbs, TimecodedFakeASR, make_words, timecoded_audio

SR = 16000


class PerStreamFakeASR(TimecodedFakeASR):
    """Shared backend serving different ground truth per active stream."""

    supports_prefix = False

    def __init__(self, words_by_stream):
        super().__init__([], unstable_tail=False)
        self.words_by_stream = words_by_stream
        self.active = None

    def set_active_stream(self, key):
        self.active = key

    def drop_stream(self, key):
        pass

    def transcribe(self, audio, init_prompt="", **kw):
        self.words = self.words_by_stream[self.active]
        return super().transcribe(audio, init_prompt)


def test_two_streams_isolated_outputs():
    words_a = [(0.5, 0.9, " alpha1"), (1.0, 1.4, " alpha2"), (2.0, 2.4, " alpha3")]
    words_b = [(0.5, 0.9, " beta1"), (1.2, 1.6, " beta2"), (2.1, 2.5, " beta3")]
    asr = None
    server = None

    def build(sid_words):
        return PerStreamFakeASR(sid_words)

    # stream ids are assigned 1, 2 in creation order
    asr = build({1: words_a, 2: words_b})
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5)
    a = server.create_stream()
    b = server.create_stream()
    t = 0.0
    outs = {a: [], b: []}
    for _ in range(5):
        server.feed(a, timecoded_audio(t, t + 1.0))
        server.feed(b, timecoded_audio(t, t + 1.0))
        t += 1.0
        while server.step():
            pass
        for sid in (a, b):
            outs[sid].extend(server.poll(sid))
    outs[a].extend(server.close_stream(a))
    outs[b].extend(server.close_stream(b))
    text_a = "".join(r.text for r in outs[a])
    text_b = "".join(r.text for r in outs[b])
    assert "alpha1" in text_a and "alpha3" in text_a
    assert "beta1" in text_b and "beta3" in text_b
    assert "beta" not in text_a and "alpha" not in text_b
    st = server.get_stats()
    # closed streams are forgotten entirely (no leak on stream churn)
    assert st["total_streams"] == 0 and st["streams"] == 0


def test_round_robin_fairness():
    words = {i: make_words(8) for i in (1, 2, 3)}
    server = StreamServer(PerStreamFakeASR(words), use_vad=False, online_chunk_size=0.5)
    sids = [server.create_stream() for _ in range(3)]
    for t in range(6):
        for sid in sids:
            server.feed(sid, timecoded_audio(float(t), float(t + 1)))
        while server.step():
            pass
    stats = server.get_stats()["per_stream"]
    ticks = [stats[sid]["ticks"] for sid in sids]
    assert max(ticks) - min(ticks) <= 1, f"unfair: {ticks}"


def test_load_shedding_kicks_in():
    words = {1: make_words(10)}
    server = StreamServer(PerStreamFakeASR(words), use_vad=False, online_chunk_size=0.5)
    sid = server.create_stream()
    # poison the monitor: pretend we're far behind realtime
    for _ in range(20):
        server.monitor.record_recognition(audio_seconds=1.0, processing_seconds=5.0)
    server.feed(sid, timecoded_audio(0.0, 2.0))
    assert server.step() is True  # tick consumed by shedding
    assert server.streams[sid].skipped_ticks == 1


def test_closed_stream_rejects_feed():
    server = StreamServer(PerStreamFakeASR({1: []}), use_vad=False)
    sid = server.create_stream()
    server.close_stream(sid)
    import pytest

    with pytest.raises(ValueError):
        server.feed(sid, np.zeros(100, np.float32))


def test_close_stream_transcribes_remaining_audio():
    """Audio fed after the last step() must still be transcribed at close."""
    words = {1: [(0.4, 0.8, " lastword")]}
    server = StreamServer(PerStreamFakeASR(words), use_vad=False)
    sid = server.create_stream()
    server.feed(sid, timecoded_audio(0.0, 2.0))
    out = server.close_stream(sid)  # no step() in between
    assert any("lastword" in r.text for r in out)


def test_shed_then_starve_recovers():
    """A shed tick drains audio; later steps must still transcribe it even if
    no new audio arrives."""
    words = {1: [(0.4, 0.8, " probe")]}
    server = StreamServer(PerStreamFakeASR(words), use_vad=False,
                          max_consecutive_sheds=2)
    sid = server.create_stream()
    for _ in range(20):
        server.monitor.record_recognition(1.0, 5.0)  # poisoned window
    server.feed(sid, timecoded_audio(0.0, 2.0))
    ran = 0
    for _ in range(6):  # sheds twice, then probe tick runs the transcription
        if server.step():
            ran += 1
    s = server.streams[sid]
    assert s.ticks >= 1, "probe-through never ran a real tick"
    assert s.audio_since_tick == 0.0


def test_concurrent_feed_and_close_no_crash():
    import threading

    words = {i: make_words(4) for i in range(1, 40)}
    server = StreamServer(PerStreamFakeASR(words), use_vad=False)
    errors = []

    def churn():
        try:
            for _ in range(12):
                sid = server.create_stream()
                server.feed(sid, timecoded_audio(0.0, 1.0))
                server.close_stream(sid)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    server.start()
    threads = [threading.Thread(target=churn) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.stop()
    assert not errors
    assert server.get_stats()["total_streams"] == 0


def test_tcp_server_end_to_end():
    """PCM in over a real socket, 'beg_ms end_ms text' lines out."""
    import socket
    import threading
    import time as _t

    from realtime_whisper_asr_tpu.serving_tcp import TCPTranscriptionServer

    words = {1: [(0.5, 0.9, " hello"), (1.2, 1.6, " network")]}
    stream_server = StreamServer(PerStreamFakeASR(words), use_vad=False,
                                 online_chunk_size=0.5)
    srv = TCPTranscriptionServer(("127.0.0.1", 0), stream_server)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    try:
        sock = socket.create_connection(("127.0.0.1", port), timeout=5)
        pcm = (np.clip(timecoded_audio(0.0, 3.0), -1, 1) * 32768).astype(np.int16)
        sock.sendall(pcm.tobytes())
        _t.sleep(0.5)
        sock.shutdown(socket.SHUT_WR)
        sock.settimeout(5)
        data = b""
        try:
            while True:
                part = sock.recv(4096)
                if not part:
                    break
                data += part
        except socket.timeout:
            pass
        text = data.decode("utf-8")
        assert "hello" in text and "network" in text, text
        for line in text.strip().splitlines():
            beg, end, *_ = line.split(" ", 2)
            assert int(beg) <= int(end)
    finally:
        srv.shutdown()
        t.join(timeout=5)


def test_default_language_restored_for_unspecified_streams():
    """A stream created with language=None must not inherit another stream's
    language from the shared ASR (advisor finding)."""
    asr = PerStreamFakeASR({1: make_words(3), 2: make_words(3)})
    asr.original_language = "en"
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5)
    a = server.create_stream(language="zh")
    b = server.create_stream()  # no language: should see the ASR default
    seen = {}
    orig_transcribe = asr.transcribe

    def spy(audio, init_prompt="", **kw):
        seen[asr.active] = asr.original_language
        return orig_transcribe(audio, init_prompt, **kw)

    asr.transcribe = spy
    for t in (0.0, 1.0, 2.0):
        server.feed(a, timecoded_audio(t, t + 1.0))
        server.feed(b, timecoded_audio(t, t + 1.0))
        while server.step():
            pass
    assert seen[a] == "zh"
    assert seen[b] == "en"


class BatchingFakeASR(PerStreamFakeASR):
    """Fake backend with the batched-tick API: records batch sizes."""

    def __init__(self, words_by_stream):
        super().__init__(words_by_stream)
        self.batch_sizes = []

    def transcribe_batch(self, items):
        self.batch_sizes.append(len(items))
        out = []
        for it in items:
            self.active = it["key"]
            out.append(self.transcribe(it["audio"], it.get("init_prompt") or ""))
        return out


def _run_two_streams(asr, **server_kw):
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5, **server_kw)
    a = server.create_stream()
    b = server.create_stream()
    outs = {a: [], b: []}
    for t in (0.0, 1.0, 2.0, 3.0):
        server.feed(a, timecoded_audio(t, t + 1.0))
        server.feed(b, timecoded_audio(t, t + 1.0))
        while server.step():
            pass
        for sid in (a, b):
            outs[sid].extend(server.poll(sid))
    outs[a].extend(server.close_stream(a))
    outs[b].extend(server.close_stream(b))
    return outs, (a, b)


def test_batched_step_groups_same_language_streams():
    words_a = [(0.5, 0.9, " alpha1"), (1.2, 1.6, " alpha2"), (2.2, 2.6, " alpha3")]
    words_b = [(0.5, 0.9, " beta1"), (1.2, 1.6, " beta2"), (2.2, 2.6, " beta3")]
    asr = BatchingFakeASR({1: words_a, 2: words_b})
    outs, (a, b) = _run_two_streams(asr)
    assert any(n >= 2 for n in asr.batch_sizes), asr.batch_sizes
    text_a = "".join(r.text for r in outs[a])
    text_b = "".join(r.text for r in outs[b])
    assert "alpha1" in text_a and "alpha3" in text_a and "beta" not in text_a
    assert "beta1" in text_b and "beta3" in text_b and "alpha" not in text_b


def test_batched_outputs_match_sequential_serving():
    """The batched scheduler must produce the same committed text as the
    sequential one (the fake backend is bucket-free, so parity is exact)."""
    words_a = [(0.5, 0.9, " alpha1"), (1.2, 1.6, " alpha2"), (2.2, 2.6, " alpha3")]
    words_b = [(0.5, 0.9, " beta1"), (1.2, 1.6, " beta2"), (2.2, 2.6, " beta3")]
    batched_outs, (a1, b1) = _run_two_streams(BatchingFakeASR({1: words_a, 2: words_b}))
    seq_outs, (a2, b2) = _run_two_streams(PerStreamFakeASR({1: words_a, 2: words_b}))
    assert "".join(r.text for r in batched_outs[a1]) == "".join(r.text for r in seq_outs[a2])
    assert "".join(r.text for r in batched_outs[b1]) == "".join(r.text for r in seq_outs[b2])


def test_batching_respects_language_groups():
    """Streams with different languages never share a batch (DecodeOptions
    are per-batch; the reference rebuilds per language)."""
    asr = BatchingFakeASR({1: make_words(3), 2: make_words(3)})
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5)
    a = server.create_stream(language="en")
    b = server.create_stream(language="zh")
    for t in (0.0, 1.0, 2.0):
        server.feed(a, timecoded_audio(t, t + 1.0))
        server.feed(b, timecoded_audio(t, t + 1.0))
        while server.step():
            pass
    assert all(n == 1 for n in asr.batch_sizes), asr.batch_sizes


class PipelinedFakeASR(BatchingFakeASR):
    """Fake backend with the dispatch/finalize API: records event order to
    prove the scheduler overlaps (dispatch N+1 lands before finalize N)."""

    def __init__(self, words_by_stream):
        super().__init__(words_by_stream)
        self.events = []

    def transcribe_batch_dispatch(self, items):
        self.events.append(("dispatch", tuple(it["key"] for it in items)))
        return {"items": items}

    def transcribe_batch_finalize(self, st):
        items = st["items"]
        self.events.append(("finalize", tuple(it["key"] for it in items)))
        return self.transcribe_batch(items)


def test_pipelined_outputs_match_sequential_serving():
    """The pipelined (dispatch/finalize) scheduler must commit the same text
    as the sequential one — results just surface one step() later."""
    words_a = [(0.5, 0.9, " alpha1"), (1.2, 1.6, " alpha2"), (2.2, 2.6, " alpha3")]
    words_b = [(0.5, 0.9, " beta1"), (1.2, 1.6, " beta2"), (2.2, 2.6, " beta3")]
    pipe_outs, (a1, b1) = _run_two_streams(PipelinedFakeASR({1: words_a, 2: words_b}))
    seq_outs, (a2, b2) = _run_two_streams(PerStreamFakeASR({1: words_a, 2: words_b}))
    assert "".join(r.text for r in pipe_outs[a1]) == "".join(r.text for r in seq_outs[a2])
    assert "".join(r.text for r in pipe_outs[b1]) == "".join(r.text for r in seq_outs[b2])


def test_pipelined_dispatch_overlaps_finalize():
    """Overlap property: with two language groups in one scheduling round,
    BOTH dispatches land before either finalize — group 2's upload/encode/
    decode are enqueued while group 1's results are still in flight. (One
    group alone stays serial by design: a stream never has two ticks in
    flight, since apply_result(N) must precede prepare_request(N+1).)"""
    words = {1: make_words(6), 2: make_words(6)}
    asr = PipelinedFakeASR(words)
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5)
    a = server.create_stream(language="en")
    b = server.create_stream(language="zh")
    for t in (0.0, 1.0, 2.0, 3.0):
        server.feed(a, timecoded_audio(t, t + 1.0))
        server.feed(b, timecoded_audio(t, t + 1.0))
        while server.step():
            pass
    overlapped = False
    open_groups = 0
    for ev, keys in asr.events:
        if ev == "dispatch":
            open_groups += 1
            if open_groups >= 2:
                overlapped = True
        else:
            open_groups -= 1
    assert overlapped, asr.events
    # drain: close must settle any in-flight tick before the final flush
    server.close_stream(a)
    server.close_stream(b)
    assert sum(1 for e in asr.events if e[0] == "dispatch") == sum(
        1 for e in asr.events if e[0] == "finalize"
    )


def test_pipelined_no_double_tick_while_inflight():
    """A stream with a dispatched tick in flight is not re-ticked until the
    finalize lands (no concurrent mutation of one stream's processor)."""
    asr = PipelinedFakeASR({1: make_words(6)})
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5)
    a = server.create_stream()
    server.feed(a, timecoded_audio(0.0, 1.0))
    server.step()  # dispatches tick 1
    server.feed(a, timecoded_audio(1.0, 2.0))
    server.step()  # must finalize tick 1; dispatch tick 2 only after
    for (ev1, k1), (ev2, k2) in zip(asr.events, asr.events[1:]):
        if ev1 == "dispatch" and k1 == (1,):
            assert not (ev2 == "dispatch" and k2 == (1,))
    server.close_stream(a)


def test_concurrent_churn_pipelined_backend():
    """Same churn stress against the PIPELINED backend: close_stream must
    settle in-flight dispatches (taken out under _asr_lock) while serve_forever
    keeps dispatching/finalizing on its own thread — no crashes, no leaks, and
    every dispatch is eventually finalized."""
    import threading

    words = {i: make_words(4) for i in range(1, 60)}
    asr = PipelinedFakeASR(words)
    server = StreamServer(asr, use_vad=False)
    errors = []

    def churn():
        try:
            for _ in range(12):
                sid = server.create_stream()
                server.feed(sid, timecoded_audio(0.0, 1.0))
                server.feed(sid, timecoded_audio(1.0, 2.0))
                server.close_stream(sid)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    server.start()
    threads = [threading.Thread(target=churn) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.stop()
    assert not errors
    assert server.get_stats()["total_streams"] == 0
    n_d = sum(1 for e in asr.events if e[0] == "dispatch")
    n_f = sum(1 for e in asr.events if e[0] == "finalize")
    assert n_d == n_f, (n_d, n_f)


def test_tcp_emit_prefixes_speaker_label():
    """TCP keeps the whisper_streaming 'beg end text' wire format; speaker
    labels ride as a [S<n>] text prefix."""
    from realtime_whisper_asr_tpu.serving import StreamResult
    from realtime_whisper_asr_tpu.serving_tcp import _Handler

    sent = []

    class Sock:
        def sendall(self, b):
            sent.append(bytes(b))

    _Handler._emit(Sock(), [
        StreamResult(1, 0.5, 1.25, " hello", speaker="S3"),
        StreamResult(1, 1.25, 2.0, " there"),
    ])
    lines = b"".join(sent).decode("utf-8").strip().splitlines()
    assert lines[0] == "500 1250 [S3] hello"
    assert lines[1] == "1250 2000 there"


class FlakyDispatchASR(PipelinedFakeASR):
    """Pipelined fake whose dispatch raises for the first N calls — models a
    backend bug (e.g. the round-3 bench KeyError) that serving's reset-group
    handler would otherwise swallow invisibly."""

    def __init__(self, words_by_stream, fail_first=2):
        super().__init__(words_by_stream)
        self.fail_first = fail_first
        self.dispatch_calls = 0

    def transcribe_batch_dispatch(self, items):
        self.dispatch_calls += 1
        if self.dispatch_calls <= self.fail_first:
            raise KeyError("h2d_transfers")  # the actual round-3 failure mode
        return super().transcribe_batch_dispatch(items)


def test_group_failures_counted_and_service_recovers():
    """A swallowed dispatch exception must (a) leave the server serving —
    later ticks commit text — and (b) be COUNTED in get_stats, so a
    systematically failing backend is observable (a bench that decoded zero
    ticks published plausible-looking aggregate numbers for half a round
    before this counter existed)."""
    words = [(0.5, 0.9, " alpha1"), (1.2, 1.6, " alpha2"), (2.2, 2.6, " alpha3")]
    asr = FlakyDispatchASR({1: words, 2: words}, fail_first=2)
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5)
    a = server.create_stream()
    b = server.create_stream()
    outs = []
    for t in (0.0, 1.0, 2.0, 3.0):
        server.feed(a, timecoded_audio(t, t + 1.0))
        server.feed(b, timecoded_audio(t, t + 1.0))
        while server.step():
            pass
        for sid in (a, b):
            outs.extend(server.poll(sid))
    outs.extend(server.close_stream(a))
    outs.extend(server.close_stream(b))
    text = "".join(r.text for r in outs)
    assert "alpha" in text  # recovered after the failures
    assert asr.dispatch_calls > 2
    assert server.get_stats()["group_failures"] == 2


def test_close_stream_flushes_staged_pending_utterance():
    """A client's final audio can contain utterance A's END followed by
    utterance B's START (VAC stages B in _pending until A's finish()). A
    single-finish close dropped B's transcript entirely; close_stream must
    loop until the staged utterance is flushed too."""
    words = {1: [(0.5, 0.9, " first"), (2.7, 3.1, " second")]}
    server = StreamServer(
        PerStreamFakeASR(words),
        use_vad=True,
        vad_factory=lambda: ScriptedProbs([(0.2, 1.2), (2.5, 3.6)]),
        min_silence_duration_ms=500,
        online_chunk_size=0.5,
    )
    sid = server.create_stream()
    # feed second-by-second, never step(): the drain inside close_stream then
    # replays A's start / A's end / B's start as separate inserts, so B is
    # STAGED in VAC._pending while A's final is still unconsumed
    for t in range(4):
        server.feed(sid, timecoded_audio(float(t), float(t) + 1.0))
    server.feed(sid, timecoded_audio(4.0, 4.5))
    out = server.close_stream(sid)
    text = "".join(r.text for r in out)
    assert "first" in text, out
    assert "second" in text, out  # the staged utterance must not be dropped


def test_diarizer_sees_utterance_end_inside_one_chunk():
    """End+start inside ONE drained chunk: post-chunk VAC status stays
    'voice', so the old before/after status compare never fired
    on_utterance_end — the event counter must."""

    class RecordingDiarizer:
        def __init__(self):
            self.ends = 0
            self.chunks = 0

        def observe_chunk(self, chunk, voiced):
            self.chunks += 1

        def on_utterance_end(self):
            self.ends += 1

        def live_label(self):
            return None

    words = {1: [(0.4, 0.8, " x")]}
    server = StreamServer(
        PerStreamFakeASR(words),
        use_vad=True,
        # A speaks 0-1.0s, 0.6s silence, B speaks from 1.6s: with 500 ms
        # min-silence, A's end AND B's start both land inside the single
        # 0-3 s chunk below
        vad_factory=lambda: ScriptedProbs([(0.0, 1.0), (1.6, 3.0)]),
        min_silence_duration_ms=500,
    )
    sid = server.create_stream()
    s = server.streams[sid]
    s.diarizer = RecordingDiarizer()
    server.feed(sid, timecoded_audio(0.0, 3.0))
    server._drain_into_processor(s)
    assert s.processor.status == "voice"  # same-chunk restart: status check blind
    assert s.diarizer.ends == 1, "end event inside the chunk must be surfaced"
    assert s.diarizer.chunks == 1


class _RecordingSeparator:
    """Passthrough separator that records what it saw (plumbing test)."""

    name = "recording"

    def __init__(self):
        self.stats = {"processed": 0, "errors": 0}

    def separate(self, audio):
        self.stats["processed"] += 1
        return audio

    def get_stats(self):
        return self.stats


def test_serving_separation_frontend():
    """A separator passed to StreamServer runs on every fed chunk (the
    reference separates per mic chunk, 一键…py:1474-1482) and must not
    perturb results when it is a passthrough."""
    words = [(0.5, 0.9, " one"), (1.0, 1.4, " two"), (2.0, 2.4, " three")]
    sep = _RecordingSeparator()
    server = StreamServer(PerStreamFakeASR({1: words}), use_vad=False,
                          online_chunk_size=0.5, separator=sep)
    sid = server.create_stream()
    t = 0.0
    outs = []
    for _ in range(4):
        server.feed(sid, timecoded_audio(t, t + 1.0))
        t += 1.0
        while server.step():
            pass
        outs.extend(server.poll(sid))
    outs.extend(server.close_stream(sid))
    assert sep.stats["processed"] == 4  # every fed chunk went through
    assert server.get_stats()["separator"]["processed"] == 4
    text = "".join(r.text for r in outs)
    assert "one" in text and "three" in text


def test_hbm_safe_batch_sizing():
    """The HBM-derived dispatch-batch ceiling: calibrated to the round-4
    measurement that batch 16 serves large-v3 int8-all on a 16 GB v5e while
    batch 32 RESOURCE_EXHAUSTEDs every tick (two pipelined groups' cross-KV
    alone ≈ 15.7 GB). The formula must admit the measured-safe 16, refuse 32,
    and stay out of the way when HBM is unknown."""
    from realtime_whisper_asr_tpu.models import whisper as W
    from realtime_whisper_asr_tpu.serving import _hbm_safe_batch

    cfg = W.get_config("large-v3")
    int8all_bytes = 1_600_000_000  # ≈ int8-all large-v3 (decoder 910 MB + enc)
    cap = _hbm_safe_batch(cfg, int8all_bytes, 16 * 2**30)
    assert cap is not None and 14 <= cap <= 20, cap
    assert cap >= 16  # the measured-safe batch must not be refused
    assert cap < 32  # the measured-OOM batch must be refused
    assert _hbm_safe_batch(cfg, int8all_bytes, None) is None
    assert _hbm_safe_batch(None, 0, 16 * 2**30) is None
    # int8-kv halves the per-row cross-KV working set — the quantization tier
    # that RAISES the dispatch ceiling (weight tiers only shrink shared params)
    cap_kv = _hbm_safe_batch(cfg, int8all_bytes, 16 * 2**30, kv_quant=True)
    assert cap_kv >= int(1.7 * cap), (cap, cap_kv)
    # tiny models on big HBM: effectively uncapped for sane stream counts
    assert _hbm_safe_batch(W.get_config("tiny"), 80_000_000, 16 * 2**30) > 64
    # pathological squeeze still returns a usable batch, never 0/negative
    assert _hbm_safe_batch(cfg, 15 * 2**30, 16 * 2**30) == 1


def test_server_clamps_oversized_max_batch(monkeypatch):
    """StreamServer must clamp an over-HBM max_batch at construction (and
    surface both numbers in get_stats) instead of dispatching groups that
    OOM on every tick. The fake ASR carries a real large-v3 config + a fake
    params tree; the device HBM probe is pinned to a 16 GB v5e."""
    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.models import whisper as W
    from realtime_whisper_asr_tpu.utils import hardware

    monkeypatch.setattr(hardware, "detect_hardware",
                        lambda: {"hbm_bytes": 16 * 2**30})

    words = [(0.5, 0.9, " one")]
    asr = PerStreamFakeASR({1: words})
    asr.cfg = W.get_config("large-v3")
    asr.params = {"w": jnp.zeros(1_600_000_000 // 4, jnp.float32)}
    server = StreamServer(asr, use_vad=False, max_batch=32)
    stats = server.get_stats()
    assert stats["device_batch_cap"] == server.max_batch
    assert 14 <= server.max_batch <= 20
    # within-cap requests are honored untouched
    server2 = StreamServer(asr, use_vad=False, max_batch=4)
    assert server2.max_batch == 4
