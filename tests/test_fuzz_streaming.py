"""Property/fuzz tests: random feed patterns must never break invariants.

Invariants under ANY chunking/VAD pattern: no exceptions, committed begins
monotonic, committed text == ground truth prefix (modulo the unstable tail),
buffer stays bounded, finish() always terminates the stream cleanly.
"""

import numpy as np

from realtime_whisper_asr_tpu.streaming import (
    OnlineASRProcessor,
    VACOnlineASRProcessor,
    VADIterator,
)
from tests.test_streaming import TimecodedFakeASR, make_words, timecoded_audio

SR = 16000


class RandomProbs:
    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)
        self.state = 0.0

    def __call__(self, frames):
        out = []
        for _ in frames:
            # random telegraph voice signal with hysteresis
            if self.rng.random() < 0.05:
                self.state = 1.0 - self.state
            out.append(self.state)
        return np.array(out, np.float32)


def test_fuzz_online_random_chunks():
    for seed in range(5):
        rng = np.random.default_rng(seed)
        words = make_words(25)
        proc = OnlineASRProcessor(TimecodedFakeASR(words), buffer_trimming=("segment", 8.0))
        t = 0.0
        commits = []
        while t < 16.0:
            dt = float(rng.uniform(0.05, 2.5))
            proc.insert_audio_chunk(timecoded_audio(t, t + dt))
            t += dt
            if rng.random() < 0.7:
                b, e, txt = proc.process_iter()
                if txt:
                    commits.append((b, e, txt))
        b, e, txt = proc.finish()
        if txt:
            commits.append((b, e, txt))
        begs = [b for b, _, _ in commits]
        assert begs == sorted(begs), f"seed {seed}: non-monotonic commits"
        text = "".join(t for _, _, t in commits).replace("?", "")
        expect = "".join(w for _, _, w in words if w[1] if True)
        joined = "".join(w for _, _, w in words)
        assert joined.startswith(text) or text.startswith(joined[: len(text)]), (
            f"seed {seed}: committed text diverged"
        )
        assert len(proc.audio_buffer) / SR < 20.0


def test_fuzz_vac_random_vad_and_chunks():
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        words = make_words(30)
        online = OnlineASRProcessor(TimecodedFakeASR(words), buffer_trimming=("segment", 8.0))
        vac = VACOnlineASRProcessor(
            online,
            VADIterator(RandomProbs(seed), min_silence_duration_ms=int(rng.integers(100, 800)),
                        speech_pad_ms=int(rng.integers(0, 200))),
            online_chunk_size=float(rng.uniform(0.2, 1.0)),
        )
        t = 0.0
        results = []
        while t < 18.0:
            dt = float(rng.uniform(0.03, 2.0))
            vac.insert_audio_chunk(timecoded_audio(t, t + dt))
            t += dt
            results.append(vac.process_iter())
            if rng.random() < 0.05:
                vac.set_silence_duration(float(rng.integers(100, 1000)))
        results.append(vac.finish())
        for b, e, txt in results:
            if txt:
                assert b is not None and e is not None and b <= e + 1e-6


def test_fuzz_skip_detector_never_crashes():
    from realtime_whisper_asr_tpu.pipeline import SkipDetector

    rng = np.random.default_rng(7)
    sd = SkipDetector()
    alphabet = "abc "
    for i in range(300):
        s = "".join(rng.choice(list(alphabet)) for _ in range(rng.integers(0, 30)))
        skip, reason = sd.should_skip(s, float(i) * 0.3)
        assert isinstance(skip, bool) and isinstance(reason, str)
    assert sd.get_stats()["total"] == 300
