"""Host streaming core tests: HypothesisBuffer, OnlineASRProcessor, VAC, VAD.

Uses a TimecodedFakeASR: test audio encodes absolute time in its amplitude
(sample k of the session has value k/SR * 1e-3), so the fake backend can
recover the buffer's absolute window from content alone and serve ground-truth
words deterministically — making commits, trimming, and prompts exactly
predictable (the injectable-clock/fake-backend strategy of SURVEY.md §4).
"""

import numpy as np
import pytest

from realtime_whisper_asr_tpu.streaming import (
    HypothesisBuffer,
    OnlineASRProcessor,
    VACOnlineASRProcessor,
    VADIterator,
)
from realtime_whisper_asr_tpu.models.vad import EnergyVAD

SR = 16000


def timecoded_audio(t0: float, t1: float) -> np.ndarray:
    k = np.arange(int(t0 * SR), int(t1 * SR))
    return (k / SR * 1e-3).astype(np.float32)


class TimecodedFakeASR:
    """Serves ground-truth words inside the buffer window; optionally makes the
    last word 'unstable' (changes until it is >1 s inside the buffer end)."""

    sep = ""

    def __init__(self, words, unstable_tail=True):
        self.words = words  # [(beg, end, text)] absolute
        self.unstable_tail = unstable_tail
        self.prompts = []

    def transcribe(self, audio, init_prompt=""):
        self.prompts.append(init_prompt)
        if len(audio) == 0:
            return []
        t0 = float(audio[0]) * 1e3
        t1 = t0 + len(audio) / SR
        out = []
        for b, e, w in self.words:
            if b >= t0 - 1e-6 and e <= t1 + 1e-6:
                if self.unstable_tail and e > t1 - 1.0:
                    w = w + "?"  # unstable guess near the audio frontier
                out.append((b - t0, e - t0, w))
        return out

    def ts_words(self, segments):
        return segments

    def segments_end_ts(self, segments):
        return [e for b, e, w in segments]


class DispatchingFakeASR(TimecodedFakeASR):
    """TimecodedFakeASR + the two-phase dispatch/finalize protocol, so the
    software-pipelined tick loop (sync-emulated: the 'device' result is just
    computed eagerly) can be exercised without a device backend."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.dispatches = 0

    def transcribe_dispatch(self, audio, init_prompt="", prefix_ids=None,
                            draft_ids=None, key=None, device_draft=None):
        self.dispatches += 1
        return {"res": self.transcribe(audio, init_prompt=init_prompt)}

    def transcribe_finalize(self, st):
        return st["res"]


def test_set_pipeline_drains_inflight():
    """Switching pipelining modes mid-session drains the in-flight tick and
    hands its commit back to the caller (nothing is silently dropped)."""
    words = [(0.2, 0.6, " a"), (0.7, 1.1, " b"), (1.2, 1.6, " c")]
    asr = DispatchingFakeASR(words, unstable_tail=False)
    proc = OnlineASRProcessor(asr, pipeline="async")
    t = 0.0
    outs = []
    while t < 3.0:
        proc.insert_audio_chunk(timecoded_audio(t, t + 1.0))
        t += 1.0
        outs.append(proc.process_iter())
    assert proc._inflight is not None
    drained = proc.set_pipeline(False)
    assert proc._inflight is None and proc.pipeline is False
    text = "".join(txt for _, _, txt in outs + [drained, proc.finish()] if txt)
    assert "a" in text and "b" in text and "c" in text
    # switching to the same mode with nothing in flight is a no-op
    assert proc.set_pipeline(False) == (None, None, "")
    # an ASR without the dispatch protocol can never be switched into it
    proc2 = OnlineASRProcessor(TimecodedFakeASR(words))
    proc2.set_pipeline("async")
    assert proc2.pipeline is False


def make_words(n, start=0.25, dur=0.4, gap=0.1):
    t = start
    words = []
    for i in range(n):
        words.append((round(t, 2), round(t + dur, 2), f" word{i}"))
        t += dur + gap
    return words


# ---------------------------------------------------------------- hypothesis


def test_agreement2_commits_stable_prefix():
    hb = HypothesisBuffer(agreement_n=2)
    hb.insert([(0.0, 0.4, "a"), (0.5, 0.9, "b")], 0.0)
    assert hb.flush() == []  # first hypothesis: nothing to agree with
    hb.insert([(0.0, 0.4, "a"), (0.5, 0.9, "b"), (1.0, 1.4, "c")], 0.0)
    assert [w for _, _, w in hb.flush()] == ["a", "b"]
    hb.insert([(1.0, 1.4, "c"), (1.5, 1.9, "d")], 0.0)
    assert [w for _, _, w in hb.flush()] == ["c"]


def test_agreement2_disagreement_blocks_commit():
    hb = HypothesisBuffer(agreement_n=2)
    hb.insert([(0.0, 0.4, "a"), (0.5, 0.9, "x")], 0.0)
    hb.flush()
    hb.insert([(0.0, 0.4, "b"), (0.5, 0.9, "x")], 0.0)
    assert hb.flush() == []  # first word disagrees -> nothing commits


def test_ngram_dedup_on_insert():
    hb = HypothesisBuffer(agreement_n=2)
    for _ in range(2):
        hb.insert([(0.0, 0.4, "a"), (0.5, 0.9, "b")], 0.0)
        hb.flush()
    assert [w for _, _, w in hb.commited_in_buffer] == ["a", "b"]
    # new hypothesis re-hears the committed tail right at the boundary
    hb.insert([(0.45, 0.9, "a"), (0.5, 0.95, "b"), (1.0, 1.4, "c")], 0.0)
    assert [w for _, _, w in hb.new] == ["c"]


def test_agreement3_needs_three_consistent():
    hb = HypothesisBuffer(agreement_n=3)
    hb.insert([(0.0, 0.4, "a")], 0.0)
    assert hb.flush() == []
    hb.insert([(0.0, 0.4, "a"), (0.5, 0.9, "b")], 0.0)
    assert hb.flush() == []
    hb.insert([(0.0, 0.4, "a"), (0.5, 0.9, "b")], 0.0)
    out = hb.flush()
    assert [w for _, _, w in out] == ["a"]


# -------------------------------------------------------------------- online


def run_online(n_words=40, chunk_s=1.0, trimming=15.0, **kw):
    words = make_words(n_words)
    asr = TimecodedFakeASR(words)
    proc = OnlineASRProcessor(asr, buffer_trimming=("segment", trimming), **kw)
    total = words[-1][1] + 1.0
    committed = []
    t = 0.0
    while t < total:
        proc.insert_audio_chunk(timecoded_audio(t, min(t + chunk_s, total)))
        t += chunk_s
        b, e, txt = proc.process_iter()
        if txt:
            committed.append((b, e, txt))
    b, e, txt = proc.finish()
    if txt:
        committed.append((b, e, txt))
    return words, asr, proc, committed


def test_online_commits_everything_in_order():
    words, asr, proc, committed = run_online()
    text = "".join(t for _, _, t in committed)
    expect = "".join(w for _, _, w in words)
    # unstable-tail guesses must never be committed mid-stream; the final
    # flush() may carry a trailing unstable word
    assert text.replace("?", "") == expect
    mid = "".join(t for _, _, t in committed[:-1])
    assert "?" not in mid
    begs = [b for b, _, _ in committed]
    assert begs == sorted(begs)


def test_online_buffer_is_trimmed():
    words, asr, proc, _ = run_online(n_words=50, trimming=10.0)
    assert len(proc.audio_buffer) / SR < 20.0
    assert proc.buffer_time_offset > 0


def test_online_prompt_carries_committed_text():
    words, asr, proc, _ = run_online(n_words=50, trimming=10.0)
    nonempty = [p for p in asr.prompts if p]
    assert nonempty, "trimming must scroll committed text into the prompt"
    assert "word0" in nonempty[-1] or "word1" in nonempty[-1]
    assert len(nonempty[-1]) <= 310


def test_online_checkpoint_resume():
    words = make_words(30)
    asr = TimecodedFakeASR(words)
    proc = OnlineASRProcessor(asr)
    t = 0.0
    for _ in range(8):
        proc.insert_audio_chunk(timecoded_audio(t, t + 1.0))
        t += 1.0
        proc.process_iter()
    state = proc.state_dict()

    proc2 = OnlineASRProcessor(TimecodedFakeASR(words))
    proc2.load_state_dict(state)
    outs1, outs2 = [], []
    for p, acc in ((proc, outs1), (proc2, outs2)):
        tt = t
        for _ in range(8):
            p.insert_audio_chunk(timecoded_audio(tt, tt + 1.0))
            tt += 1.0
            acc.append(p.process_iter())
        acc.append(p.finish())
    assert outs1 == outs2


def test_online_error_resets_state():
    class FailingASR(TimecodedFakeASR):
        def __init__(self, words):
            super().__init__(words)
            self.fail_next = False

        def transcribe(self, audio, init_prompt=""):
            if self.fail_next:
                self.fail_next = False
                raise RuntimeError("simulated backend failure")
            return super().transcribe(audio, init_prompt)

    words = make_words(20)
    asr = FailingASR(words)
    proc = OnlineASRProcessor(asr)
    t = 0.0
    results = []
    for i in range(12):
        proc.insert_audio_chunk(timecoded_audio(t, t + 1.0))
        t += 1.0
        if i == 5:
            asr.fail_next = True
        results.append(proc.process_iter())
    # the failing iteration returns empty and the stream keeps going
    assert results[5] == (None, None, "")
    assert any(txt for _, _, txt in results[6:])


# ----------------------------------------------------------------------- vad


class ScriptedProbs:
    """prob_fn driven by a [(start_s, end_s)] voice script."""

    def __init__(self, spans):
        self.spans = spans
        self.pos = 0

    def __call__(self, frames):
        out = []
        for _ in frames:
            t = self.pos * 512 / SR
            out.append(1.0 if any(a <= t < b for a, b in self.spans) else 0.0)
            self.pos += 1
        return np.array(out, np.float32)


def test_vad_iterator_events_and_min_silence():
    vad = VADIterator(ScriptedProbs([(1.0, 3.0)]), min_silence_duration_ms=500, speech_pad_ms=0)
    events = []
    t = 0.0
    while t < 5.0:
        for ev in vad(np.zeros(int(0.1 * SR), np.float32)):
            events.append((round(t, 1), ev))
        t += 0.1
    assert len(events) == 2
    (t_start, ev_s), (t_end, ev_e) = events
    assert "start" in ev_s and abs(ev_s["start"] / SR - 1.0) < 0.1
    assert "end" in ev_e and abs(ev_e["end"] / SR - 3.0) < 0.1
    # end event is delayed by min_silence (0.5 s)
    assert 3.4 <= t_end <= 3.7


def test_vad_dynamic_min_silence():
    vad = VADIterator(ScriptedProbs([(0.5, 1.0), (1.3, 1.8)]), min_silence_duration_ms=500,
                      speech_pad_ms=0)
    vad.set_min_silence_duration_ms(100)
    events = []
    t = 0.0
    while t < 3.0:
        events.extend(vad(np.zeros(int(0.1 * SR), np.float32)))
        t += 0.1
    # with 100 ms silence, the 300 ms gap splits speech into two utterances
    starts = [e for e in events if "start" in e]
    ends = [e for e in events if "end" in e]
    assert len(starts) == 2 and len(ends) == 2


def test_vac_processor_routes_and_finalizes():
    words = [(1.2, 1.6, " hello"), (1.7, 2.1, " world")]
    asr = TimecodedFakeASR(words, unstable_tail=False)
    online = OnlineASRProcessor(asr)
    vad = VADIterator(ScriptedProbs([(1.0, 2.5)]), min_silence_duration_ms=300, speech_pad_ms=0)
    vac = VACOnlineASRProcessor(online, vad, online_chunk_size=0.5)
    outs = []
    t = 0.0
    while t < 4.0:
        vac.insert_audio_chunk(timecoded_audio(t, t + 0.1))
        t += 0.1
        outs.append(vac.process_iter())
    texts = "".join(txt for _, _, txt in outs if txt)
    assert "hello" in texts and "world" in texts
    assert vac.set_silence_duration(250) is True


def test_energy_vad_discriminates():
    vad = EnergyVAD()
    rng = np.random.default_rng(0)
    silence = (1e-4 * rng.standard_normal((40, 512))).astype(np.float32)
    p_sil = vad(silence)
    t = np.arange(40 * 512) / SR
    speech = (0.3 * np.sin(2 * np.pi * 700 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(
        np.float32
    ).reshape(40, 512)
    p_speech = vad(speech)
    assert p_sil[5:].max() < 0.4
    assert p_speech[2:].mean() > 0.6


def test_token_history_shift_on_trim():
    """Trimming re-bases hypothesis tokens so the incremental prefix survives."""

    class FakeCfg:
        timestamp_begin = 50365

    class FakeASR(TimecodedFakeASR):
        cfg = FakeCfg()
        supports_prefix = True

    ts0 = 50365
    asr = FakeASR([])
    proc = OnlineASRProcessor(asr)
    # two hypotheses: [<|1.00|> w100 w101 <|3.00|>] [<|3.00|> w102 ...]
    seq = [ts0 + 50, 100, 101, ts0 + 150, ts0 + 150, 102, ts0 + 200]
    proc._token_history = [list(seq), list(seq)]
    proc.audio_buffer = np.zeros(16000 * 5, np.float32)
    proc.chunk_at(3.0)  # cut exactly at the 3.00 s boundary
    assert len(proc._token_history) == 2
    # kept: the second segment, re-based to 0: [<|0.00|> w102 <|1.00|>]
    assert proc._token_history[0] == [ts0 + 0, 102, ts0 + 50]
    # stable prefix (minus safety tail) now feeds the next decode
    proc.prefix_safety_tokens = 0
    assert proc._stable_prefix() == [ts0 + 0, 102, ts0 + 50]


def test_token_history_cleared_on_unaligned_trim():
    class FakeCfg:
        timestamp_begin = 50365

    class FakeASR(TimecodedFakeASR):
        cfg = FakeCfg()
        supports_prefix = True

    asr = FakeASR([])
    proc = OnlineASRProcessor(asr)
    proc._token_history = [[50365 + 50, 100]]
    proc.audio_buffer = np.zeros(16000 * 5, np.float32)
    proc.chunk_at(3.333333)  # not a 20 ms multiple
    assert proc._token_history == []


def test_vac_end_then_start_in_one_chunk_preserves_both_utterances():
    """An utterance end AND the next start inside one insert must flush the old
    utterance before init wipes it, and keep the new utterance's onset."""
    words = [(0.5, 0.9, " first"), (2.6, 3.0, " second")]
    asr = TimecodedFakeASR(words, unstable_tail=False)
    online = OnlineASRProcessor(asr)
    # voice 0.3-1.2s, gap, voice 2.4-3.4s; min_silence 200ms -> with 1.4s-sized
    # inserts the end(~1.4) and start(~2.4) land inside one chunk
    vad = VADIterator(ScriptedProbs([(0.3, 1.2), (2.4, 3.4)]),
                      min_silence_duration_ms=200, speech_pad_ms=0)
    vac = VACOnlineASRProcessor(online, vad, online_chunk_size=0.4)
    outs = []
    t = 0.0
    while t < 4.2:
        vac.insert_audio_chunk(timecoded_audio(t, t + 1.4))
        t += 1.4
        outs.append(vac.process_iter())
    outs.append(vac.finish())
    text = "".join(txt for _, _, txt in outs if txt)
    assert "first" in text, f"old utterance lost: {outs}"
    assert "second" in text, f"new utterance onset lost: {outs}"


def make_sentence_words(n_sentences, words_per_sentence=4, start=0.25, dur=0.4, gap=0.1):
    """Timecoded words where every k-th word ends a sentence with a period."""
    t = start
    words = []
    for s in range(n_sentences):
        for i in range(words_per_sentence):
            text = f" s{s}w{i}"
            if i == words_per_sentence - 1:
                text += "."
            words.append((round(t, 2), round(t + dur, 2), text))
            t += dur + gap
    return words


def run_online_sentences(n_sentences=12, trimming=10.0, **kw):
    words = make_sentence_words(n_sentences)
    asr = TimecodedFakeASR(words)
    proc = OnlineASRProcessor(asr, buffer_trimming=("sentence", trimming), **kw)
    total = words[-1][1] + 1.0
    committed = []
    t = 0.0
    while t < total:
        proc.insert_audio_chunk(timecoded_audio(t, min(t + 1.0, total)))
        t += 1.0
        b, e, txt = proc.process_iter()
        if txt:
            committed.append((b, e, txt))
    b, e, txt = proc.finish()
    if txt:
        committed.append((b, e, txt))
    return words, asr, proc, committed


def test_sentence_trimming_bounds_buffer():
    """buffer_trimming=("sentence", n): the buffer is cut at completed-sentence
    boundaries (whisper_online contract, SURVEY §2.2)."""
    words, asr, proc, committed = run_online_sentences(n_sentences=12, trimming=10.0)
    assert len(proc.audio_buffer) / 16000 < 14.0  # trimmed during the run
    text = "".join(t for _, _, t in committed)
    for s in range(12):
        for i in range(4):
            assert f"s{s}w{i}" in text  # nothing lost across sentence trims
    assert text.count("s3w0") == 1  # and nothing duplicated


def test_sentence_trim_lands_on_sentence_end():
    words = make_sentence_words(12)
    asr = TimecodedFakeASR(words)
    proc = OnlineASRProcessor(asr, buffer_trimming=("sentence", 10.0))
    total = words[-1][1] + 1.0
    t = 0.0
    offsets = set()
    while t < total:
        proc.insert_audio_chunk(timecoded_audio(t, min(t + 1.0, total)))
        t += 1.0
        proc.process_iter()
        offsets.add(proc.buffer_time_offset)
    # every trim point must be the end of some sentence-final word
    sentence_ends = {e for b, e, txt in words if txt.endswith(".")}
    trims = offsets - {0.0}
    assert trims, "expected at least one sentence trim"
    # timecoded audio carries float32 noise into absolute word times
    for t_trim in trims:
        assert min(abs(t_trim - e) for e in sentence_ends) < 1e-3


def test_words_to_sentences_cjk_punctuation():
    asr = TimecodedFakeASR([])
    proc = OnlineASRProcessor(asr, buffer_trimming=("sentence", 10.0))
    ws = [(0.0, 0.5, "你好。"), (0.6, 1.0, "世界"), (1.1, 1.5, "了！"), (1.6, 2.0, "尾")]
    sents = proc.words_to_sentences(ws)
    assert [s[2] for s in sents] == ["你好。", "世界了！", "尾"]
    assert sents[0][1] == 0.5 and sents[1][0] == 0.6 and sents[1][1] == 1.5


def test_sentence_mode_without_punctuation_never_trims():
    """No sentence boundaries -> conservative: keep the buffer (matches the
    upstream behavior of requiring >=2 sentences)."""
    words, asr, proc, committed = run_online(n_words=30, trimming=8.0)
    proc2 = OnlineASRProcessor(asr, buffer_trimming=("sentence", 8.0))
    words2 = make_words(30)
    asr2 = TimecodedFakeASR(words2)
    proc2.asr = asr2
    t = 0.0
    total = words2[-1][1] + 1.0
    while t < total:
        proc2.insert_audio_chunk(timecoded_audio(t, min(t + 1.0, total)))
        t += 1.0
        proc2.process_iter()
    assert proc2.buffer_time_offset == 0.0  # never trimmed


def test_invalid_trimming_way_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        OnlineASRProcessor(TimecodedFakeASR([]), buffer_trimming=("paragraph", 10.0))


def test_prompt_tail_walk_matches_full_scan():
    """prompt() now walks back from the scroll point instead of copying the
    whole committed transcript (O(session) per tick); results must be
    byte-identical to the straightforward full-scan construction, for scroll
    points at the start / middle / end and prompts shorter than the limit."""
    proc = OnlineASRProcessor(TimecodedFakeASR([]), prompt_chars=60)

    def full_scan(commited, offset, sep, prompt_chars):
        k = len(commited)
        while k > 0 and commited[k - 1][1] > offset:
            k -= 1
        prompt_words = [t for _, _, t in commited[:k]]
        non_prompt = sep.join(t for _, _, t in commited[k:])
        out, length = [], 0
        while prompt_words and length < prompt_chars:
            w = prompt_words.pop(-1)
            length += len(w) + 1
            out.append(w)
        return sep.join(reversed(out)), non_prompt

    words = [(i * 0.5, i * 0.5 + 0.4, f"w{i}") for i in range(200)]
    for offset in (0.0, 3.1, 50.0, 99.9, 1e9):
        proc.commited = list(words)
        proc.buffer_time_offset = offset
        assert proc.prompt() == full_scan(words, offset, proc.asr.sep, 60)
    # short transcript (fewer words than prompt_chars allows)
    proc.commited = words[:3]
    proc.buffer_time_offset = 1e9
    assert proc.prompt() == full_scan(words[:3], 1e9, proc.asr.sep, 60)


def test_sentence_trim_tail_slice_equivalent():
    """chunk_completed_sentence scans only the in-buffer tail; the chosen trim
    point must match the full-transcript scan (sentence ends are per-word
    punctuation, so earlier words can't change boundary END times)."""
    proc = OnlineASRProcessor(TimecodedFakeASR([]),
                              buffer_trimming=("sentence", 2.0))
    import numpy as np

    # three completed sentences + a growing one, first one fully trimmed out
    w = [(0.0, 0.4, " a"), (0.5, 0.9, " b."),
         (1.0, 1.4, " c"), (1.5, 1.9, " d."),
         (2.0, 2.4, " e"), (2.5, 2.9, " f."),
         (3.0, 3.4, " g")]
    for offset in (0.0, 1.2, 2.2, 3.1):
        # full-scan reference: the pre-optimization implementation
        full = proc.words_to_sentences(w)
        expect = full[-2][1] if len(full) >= 2 else None
        proc.commited = list(w)
        proc.buffer_time_offset = offset
        proc.audio_buffer = np.zeros(int(16000 * (4.0 - offset)), "float32")
        proc.chunk_completed_sentence()
        if expect is not None and expect > offset:
            assert proc.buffer_time_offset == expect, offset
        else:  # trim point at/before the offset is a no-op either way
            assert proc.buffer_time_offset == offset


def test_vac_multiple_staged_utterances_all_transcribed():
    """One big insert can stage SEVERAL utterances while the previous final is
    unconsumed (start2/end2/start3 in a single chunk). Overwriting the single
    _pending slot silently dropped utterance 2; the FIFO must surface every
    staged utterance through successive process_iter/finish rounds."""
    words = [(0.4, 0.8, " one"), (2.4, 2.8, " two"), (4.4, 4.8, " three")]
    asr = TimecodedFakeASR(words, unstable_tail=False)
    online = OnlineASRProcessor(asr)
    vac = VACOnlineASRProcessor(
        online,
        VADIterator(ScriptedProbs([(0.2, 1.0), (2.2, 3.0), (4.2, 5.0)]),
                    min_silence_duration_ms=500, speech_pad_ms=0),
        online_chunk_size=0.5,
    )
    # feed utterance 1 in its own chunks so only IT reaches the online buffer
    vac.insert_audio_chunk(timecoded_audio(0.0, 1.0))
    vac.insert_audio_chunk(timecoded_audio(1.0, 2.0))  # u1 END fires (~1.5s)
    assert vac.is_currently_final
    # u2 AND u3 arrive before any process_iter: both must be staged
    vac.insert_audio_chunk(timecoded_audio(2.0, 6.0))
    assert len(vac._pending) == 2, "both staged utterances must be kept"
    assert vac._pending[0][2] is True, "u2 ended inside the big insert"
    texts = []
    for _ in range(6):
        b, e, t = vac.process_iter()
        if t:
            texts.append(t)
    b, e, t = vac.finish()
    if t:
        texts.append(t)
    joined = "".join(texts)
    assert "one" in joined, joined
    assert "two" in joined, joined  # dropped entirely by the old single slot
    assert "three" in joined, joined


def test_vac_finish_all_drains_staged_utterances():
    """finish_all: a session that ENDS while utterances are still staged must
    flush every one of them — one finish() hands over only one (the app's
    single final finish silently dropped the rest; round-3 review)."""
    words = [(0.4, 0.8, " one"), (2.4, 2.8, " two"), (4.4, 4.8, " three")]
    asr = TimecodedFakeASR(words, unstable_tail=False)
    online = OnlineASRProcessor(asr)
    vac = VACOnlineASRProcessor(
        online,
        VADIterator(ScriptedProbs([(0.2, 1.0), (2.2, 3.0), (4.2, 5.0)]),
                    min_silence_duration_ms=500, speech_pad_ms=0),
        online_chunk_size=0.5,
    )
    vac.insert_audio_chunk(timecoded_audio(0.0, 1.0))
    vac.insert_audio_chunk(timecoded_audio(1.0, 2.0))
    vac.insert_audio_chunk(timecoded_audio(2.0, 6.0))  # u2+u3 staged
    assert len(vac._pending) == 2
    # session ends NOW: no process_iter rounds ever run
    flushed = vac.finish_all()
    joined = "".join(t for _, _, t in flushed)
    assert "one" in joined and "two" in joined and "three" in joined, joined
    assert not vac._pending


def test_online_finish_all_single_flush():
    words = [(0.2, 0.6, " hello")]
    asr = TimecodedFakeASR(words, unstable_tail=False)
    online = OnlineASRProcessor(asr)
    online.insert_audio_chunk(timecoded_audio(0.0, 1.0))
    online.process_iter()  # hypothesize (agree2 commits nothing yet)
    out = online.finish_all()
    assert len(out) == 1 and "hello" in out[0][2]
