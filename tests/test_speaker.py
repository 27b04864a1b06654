"""Speaker embedding + online diarization tests.

The embedder ships trained weights (tools/train_speaker.py, synthetic-speaker
corpus in models/vad/synthetic.py); these tests lock (a) the embedding's
same-vs-different speaker separation margin over a raw-feature baseline,
(b) the online tracker's turn detection, and (c) the app-level speaker-turn
hooks at VAC utterance boundaries.
"""

import numpy as np
import pytest

from realtime_whisper_asr_tpu.models.speaker import (
    SpeakerEmbedder,
    SpeakerTracker,
    utterance_features,
)
from realtime_whisper_asr_tpu.models.vad.synthetic import (
    sample_speaker,
    synth_speaker_utterance,
)

SR = 16000


def _pair_auc(sims, same):
    sims, same = np.asarray(sims), np.asarray(same) > 0.5
    order = np.argsort(sims)
    ranks = np.empty(len(sims))
    ranks[order] = np.arange(1, len(sims) + 1)
    n_pos, n_neg = int(same.sum()), int((~same).sum())
    return (ranks[same].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


@pytest.fixture(scope="module")
def embedder():
    e = SpeakerEmbedder()
    assert e.trained, "packaged speaker weights missing"
    return e


def _speaker_embeddings(embedder, n_speakers=12, utts=3, seed=7):
    rng = np.random.default_rng(seed)
    embs, labels = [], []
    for s in range(n_speakers):
        spk = sample_speaker(rng)
        for _ in range(utts):
            a = synth_speaker_utterance(rng, spk, seconds=1.6)
            embs.append(embedder(a))
            labels.append(s)
    return np.stack(embs), np.asarray(labels)


def test_embedding_separates_speakers(embedder):
    """Trained embedding must beat raw-feature cosine at same-vs-different
    discrimination on held-out synthetic speakers (seed differs from
    training)."""
    embs, labels = _speaker_embeddings(embedder)
    sims, same = [], []
    for i in range(len(embs)):
        for j in range(i + 1, len(embs)):
            sims.append(float(np.dot(embs[i], embs[j])))
            same.append(labels[i] == labels[j])
    auc = _pair_auc(sims, same)
    assert auc > 0.85, auc

    # raw-feature baseline on the same pairs
    rng = np.random.default_rng(7)
    feats = []
    for s in range(12):
        spk = sample_speaker(rng)
        for _ in range(3):
            feats.append(utterance_features(synth_speaker_utterance(rng, spk, seconds=1.6)))
    f = np.stack(feats)
    f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-9)
    sims_b = [float(np.dot(f[i], f[j])) for i in range(len(f)) for j in range(i + 1, len(f))]
    auc_b = _pair_auc(sims_b, same)
    assert auc > auc_b, (auc, auc_b)


def test_tracker_two_speaker_conversation(embedder):
    """Alternating A/B utterances: the tracker must settle on exactly two
    speakers, keep each speaker's id stable, and count the turns."""
    rng = np.random.default_rng(11)
    a, b = sample_speaker(rng), sample_speaker(rng)
    tracker = SpeakerTracker(embedder=embedder)
    ids = []
    for turn in range(8):
        spk = a if turn % 2 == 0 else b
        sid, _ = tracker.assign(synth_speaker_utterance(rng, spk, seconds=1.8))
        ids.append(sid)
    a_ids = set(ids[0::2])
    b_ids = set(ids[1::2])
    assert len(a_ids) == 1 and len(b_ids) == 1, ids
    assert a_ids != b_ids, ids
    st = tracker.get_stats()
    assert st["speakers"] == 2
    assert st["turns"] == 7  # every alternation after the first assignment


def test_tracker_same_speaker_no_turns(embedder):
    rng = np.random.default_rng(13)
    spk = sample_speaker(rng)
    tracker = SpeakerTracker(embedder=embedder)
    for _ in range(5):
        sid, turn = tracker.assign(synth_speaker_utterance(rng, spk, seconds=1.5))
    st = tracker.get_stats()
    assert st["speakers"] == 1 and st["turns"] == 0, st


def test_tracker_max_speakers_cap(embedder):
    rng = np.random.default_rng(17)
    tracker = SpeakerTracker(embedder=embedder, max_speakers=2)
    for _ in range(6):
        tracker.assign(synth_speaker_utterance(rng, sample_speaker(rng), seconds=1.2))
    assert len(tracker.centroids) <= 2


def test_app_speaker_turn_hooks(embedder):
    """StreamingApp with diarization.enable: alternating speakers separated by
    silence produce 🗣 turn events and [S<n>]-labeled results."""
    from realtime_whisper_asr_tpu.app import StreamingApp
    from realtime_whisper_asr_tpu.config import ConfigManager
    from tests.test_streaming import TimecodedFakeASR, make_words

    rng = np.random.default_rng(19)
    a, b = sample_speaker(rng), sample_speaker(rng)
    gap = np.zeros(SR, np.float32)
    pieces = []
    for turn in range(4):
        spk = a if turn % 2 == 0 else b
        utt = synth_speaker_utterance(rng, spk, seconds=2.0)
        # keep the utterance fully voiced so the energy VAD segments cleanly
        env_fix = np.abs(utt) + 1e-6
        pieces += [utt * (0.5 / env_fix.max()), gap.copy()]
    audio = np.concatenate(pieces)

    cm = ConfigManager(autoload=False)
    cm.set("diarization.enable", True)
    cm.set("vad.min_silence_duration_ms", 300)
    # the audio-dedup gate (tuned for real speech) would swallow the
    # self-similar synthetic chunks before the VAD sees the silences — same
    # reason the bench scenarios disable it (bench.py)
    cm.set("audio_deduplication.enable", False)
    lines = []
    app = StreamingApp(
        config=cm,
        asr=TimecodedFakeASR(make_words(40), unstable_tail=False),
        output=lines.append,
    )
    assert app.diarizer is not None
    from realtime_whisper_asr_tpu.app import SessionStats

    stats = SessionStats()
    pos = 0
    chunk = SR // 2
    while pos < len(audio):
        app.process_chunk(audio[pos : pos + chunk], stats, app.clock())
        pos += chunk
    app.shutdown()
    st = app.diarizer.get_stats()
    assert st["utterances"] >= 3, st
    assert st["speakers"] >= 2, st
    assert any("🗣" in l for l in lines) or st["turns"] >= 1, (lines, st)


def test_live_label_attributes_results_to_own_utterance(embedder):
    """VERDICT r2 #6: feeding two alternating synthetic speakers, every
    emitted result's speaker label matches ITS utterance (provisional
    live_label mid-utterance; exact assignment at the VAD boundary) —
    labels must not trail one utterance behind."""
    from realtime_whisper_asr_tpu.serving import StreamServer
    from tests.test_streaming import TimecodedFakeASR, make_words

    rng = np.random.default_rng(31)
    a, b = sample_speaker(rng), sample_speaker(rng)
    utt_s, gap_s = 2.0, 1.0
    gap = (0.002 * rng.standard_normal(int(gap_s * SR))).astype(np.float32)
    pieces = []
    for turn in range(4):
        spk = a if turn % 2 == 0 else b
        utt = synth_speaker_utterance(rng, spk, seconds=utt_s)
        pieces += [utt * (0.5 / (np.abs(utt).max() + 1e-6)), gap.copy()]
    audio = np.concatenate(pieces)

    server = StreamServer(
        TimecodedFakeASR(make_words(40), unstable_tail=False),
        use_vad=True, diarize=True, online_chunk_size=0.5,
        min_silence_duration_ms=300,
    )
    sid = server.create_stream()
    results = []
    pos, chunk = 0, SR // 2
    while pos < len(audio):
        server.feed(sid, audio[pos : pos + chunk])
        pos += chunk
        while server.step():
            pass
        results.extend(server.poll(sid))
    results.extend(server.close_stream(sid))
    labeled = [r for r in results if r.speaker is not None]
    assert labeled, results
    period = utt_s + gap_s
    checked = 0
    for r in labeled:
        mid = (r.begin + r.end) / 2
        utt_idx = int(mid // period)
        # skip results whose span straddles a boundary (committed tail of the
        # previous utterance emitted after the next one started)
        if not (utt_idx * period <= r.begin and r.end <= utt_idx * period + utt_s + 0.3):
            continue
        expected = "S1" if utt_idx % 2 == 0 else "S2"
        assert r.speaker == expected, (r, expected, results)
        checked += 1
    # both speakers' utterances must actually be covered by the assertion
    assert checked >= 3, (checked, results)


def test_server_diarization_labels_results(embedder):
    """StreamServer(diarize=True): per-stream speaker trackers label results
    and detect turns across alternating speakers."""
    from realtime_whisper_asr_tpu.serving import StreamServer
    from tests.test_streaming import TimecodedFakeASR, make_words

    rng = np.random.default_rng(23)
    a, b = sample_speaker(rng), sample_speaker(rng)
    gap = (0.002 * rng.standard_normal(SR)).astype(np.float32)
    pieces = []
    for turn in range(4):
        spk = a if turn % 2 == 0 else b
        utt = synth_speaker_utterance(rng, spk, seconds=2.0)
        pieces += [utt * (0.5 / (np.abs(utt).max() + 1e-6)), gap.copy()]
    audio = np.concatenate(pieces)

    server = StreamServer(
        TimecodedFakeASR(make_words(40), unstable_tail=False),
        use_vad=True, diarize=True, online_chunk_size=0.5,
        min_silence_duration_ms=300,
    )
    sid = server.create_stream()
    results = []
    pos, chunk = 0, SR // 2
    while pos < len(audio):
        server.feed(sid, audio[pos : pos + chunk])
        pos += chunk
        while server.step():
            pass
        results.extend(server.poll(sid))
    results.extend(server.close_stream(sid))
    s_stats = None  # stream is forgotten after close; capture via results
    assert results, "no results"
    labels = {r.speaker for r in results}
    assert any(l is not None for l in labels), labels
