"""Pipeline-stage tests: skip detector, audio dedup, speech rate, stretch,
separation, and the fused device feature op.

Skip-detector cases mirror the suite the reference documents but never ships
(使用说明-新功能.md §4: duplicate/partial/similarity/time-window/min-length/
stats/reset) — here they exist and run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from realtime_whisper_asr_tpu.ops import bandpass_filter, dedup_features, time_stretch
from realtime_whisper_asr_tpu.pipeline import (
    AudioDeduplicator,
    AdaptiveSilenceController,
    BandpassSeparator,
    SkipDetector,
    SpeechRateAudioProcessor,
    SpeechRateDetector,
    SpeechRateAdaptiveProcessor,
    create_separator,
)
from realtime_whisper_asr_tpu.pipeline.dedup_audio import _features_numpy
from realtime_whisper_asr_tpu.pipeline.speech_rate import gap_based_silence_ms

SR = 16000


# ------------------------------------------------------------- skip detector


def test_skip_exact_duplicate_inside_window():
    sd = SkipDetector(time_window_s=10.0)
    assert sd.should_skip("hello world", 0.0) == (False, "new")
    skip, reason = sd.should_skip("hello world", 3.0)
    assert skip and reason == "exact_duplicate"


def test_skip_expires_outside_window():
    sd = SkipDetector(time_window_s=10.0)
    sd.should_skip("hello world", 0.0)
    assert sd.should_skip("hello world", 11.0) == (False, "new")


def test_extension_replaces_and_passes():
    sd = SkipDetector()
    sd.should_skip("hello wor", 0.0)
    skip, reason = sd.should_skip("hello world and more", 1.0)
    assert not skip and reason == "extension"
    # the shorter old entry was replaced: re-sending it now is a partial match
    skip, reason = sd.should_skip("hello wor", 2.0)
    assert skip


def test_partial_containment():
    sd = SkipDetector(containment_threshold=0.8)
    sd.should_skip("the quick brown fox jumps", 0.0)
    skip, reason = sd.should_skip("quick brown fox jumps", 1.0)
    assert skip and reason == "partial_match"


def test_repetition_pattern():
    sd = SkipDetector()
    skip, reason = sd.should_skip("abcabcabcabc", 0.0)
    assert skip and reason == "repetition"
    skip, reason = sd.should_skip("yes yes yes yes yes", 1.0)
    assert skip and reason == "repetition"


def test_similarity_threshold():
    sd = SkipDetector(similarity_threshold=0.85)
    sd.should_skip("the meeting starts at nine tomorrow", 0.0)
    # trailing punctuation: superstring containment
    skip, reason = sd.should_skip("the meeting starts at nine tomorrow.", 1.0)
    assert skip and reason in ("similar", "partial_match")
    # in-place edit: pure similarity
    skip, reason = sd.should_skip("the meeting starts at nine tomorrows", 2.0)
    assert skip and reason in ("similar", "partial_match")
    # genuinely different text passes
    assert sd.should_skip("completely unrelated sentence here", 3.0)[0] is False


def test_min_length_and_stats_and_reset():
    sd = SkipDetector(min_length=2)
    assert sd.should_skip("a", 0.0) == (True, "too_short")
    sd.should_skip("some fresh text", 1.0)
    st = sd.get_stats()
    assert st["total"] == 2 and st["skipped"] == 1 and 0 < st["skip_rate"] < 1
    sd.reset()
    assert sd.get_stats()["total"] == 0 and sd.history == []


# --------------------------------------------------------------- audio dedup


def _tone(f, seconds=0.5, amp=0.3, seed=None):
    t = np.arange(int(seconds * SR)) / SR
    x = amp * np.sin(2 * np.pi * f * t)
    if seed is not None:
        x = x + 0.01 * np.random.default_rng(seed).standard_normal(t.shape)
    return x.astype(np.float32)


def test_device_features_match_numpy():
    chunk = _tone(440, seed=1)
    dev = np.asarray(dedup_features(jnp.asarray(chunk)[None])[0])
    host = _features_numpy(chunk)
    np.testing.assert_allclose(dev, host, atol=1e-3)


def test_dedup_skips_repeats_passes_novel():
    dd = AudioDeduplicator(similarity_threshold=0.95, time_window_s=5.0)
    a = _tone(440, seed=1)
    assert dd.should_skip(a, 0.0)[0] is False
    skip, reason = dd.should_skip(a, 1.0)
    assert skip and reason.startswith("duplicate")
    # clearly different audio passes
    b = (0.2 * np.random.default_rng(7).standard_normal(len(a))).astype(np.float32)
    assert dd.should_skip(b, 2.0)[0] is False
    st = dd.get_stats()
    assert st["total"] == 3 and st["skipped"] == 1


def test_dedup_window_expiry():
    dd = AudioDeduplicator(time_window_s=2.0)
    a = _tone(440)
    dd.should_skip(a, 0.0)
    assert dd.should_skip(a, 5.0)[0] is False  # expired


# --------------------------------------------------------------- speech rate


def test_rate_detector_classifies():
    # one timebase throughout: classify() also expires by the clock now, so
    # stamping samples at t=0 while the default wall clock reads "now" would
    # (correctly) expire everything
    det = SpeechRateDetector(clock=lambda: 0.0)
    for _ in range(3):
        det.add_result("abcdefghijklmnopqrst", 1.0, 0.0)  # 20 cps
    assert det.classify() == "fast"
    det2 = SpeechRateDetector(clock=lambda: 0.0)
    for _ in range(3):
        det2.add_result("abc", 1.0, 0.0)  # 3 cps
    assert det2.classify() == "slow"


def test_silence_controller_steps_and_decays():
    c = AdaptiveSilenceController(initial_ms=500, min_ms=200, max_ms=1000, step_ms=100)
    assert c.update("fast") == 400
    assert c.update("fast") == 300
    assert c.update("normal") == 350  # decay toward 500
    assert c.update("slow") == 450
    assert c.update("slow") == 550


def test_gap_heuristic_bands():
    assert 200 <= gap_based_silence_ms(1.0) <= 300
    assert 300 <= gap_based_silence_ms(3.0) <= 600
    assert 600 <= gap_based_silence_ms(8.0) <= 1000


def test_adaptive_processor_drives_vac():
    class FakeVAC:
        def __init__(self):
            self.ms = None

        def set_silence_duration(self, ms):
            self.ms = ms
            return True

    vac = FakeVAC()
    proc = SpeechRateAdaptiveProcessor(vac, update_interval_s=2.0, clock=lambda: 0.0)
    for i in range(4):
        proc.on_result("abcdefghijklmnopqrstuvwxyz" * 2, 0.0, 1.0, current_time=float(i * 3))
    assert vac.ms is not None and vac.ms < 500  # fast speech shrank silence


# ------------------------------------------------------ stretch & separation


def test_time_stretch_length_and_content():
    audio = _tone(440, seconds=1.0)
    out = np.asarray(time_stretch(jnp.asarray(audio), 1.25))
    assert abs(len(out) - len(audio) / 1.25) < 512
    # energy preserved to within a factor
    assert 0.3 < np.std(out) / np.std(audio) < 3.0
    # dominant frequency unchanged (pitch preservation)
    f_in = np.argmax(np.abs(np.fft.rfft(audio)))
    spec_out = np.abs(np.fft.rfft(out, len(audio)))
    f_out = np.argmax(spec_out)
    assert abs(f_in - f_out) <= 3


def test_time_stretch_slowdown_tail_no_click():
    """rate<1 must not spike at the very end of the output: unclamped frame
    fractions put a NEGATIVE weight on |stft[lo]| once lo saturates (phase-
    flipped energy, measured 1.74x input peak at rate 0.8); with the clamp +
    full-coverage tail frames the frozen-tail overshoot stays <= ~1.42x."""
    audio = _tone(440, seconds=1.0) * 0.3
    for rate in (0.8, 0.7):
        out = np.asarray(time_stretch(jnp.asarray(audio), rate))
        assert len(out) == int(len(audio) / rate)
        assert np.all(np.isfinite(out))
        assert np.abs(out).max() <= np.abs(audio).max() * 1.5


def test_stretch_processor_bounds_and_fallback():
    p = SpeechRateAudioProcessor()
    assert p.stretch_rate_for(None) == 1.0
    # NORMALIZING direction (reference stretch = 1/rate_ratio): fast speech
    # is slowed (rate < 1), slow speech sped up (rate > 1) — the inverted
    # measured/normal form amplified the deviation instead
    assert p.stretch_rate_for(30.0) == 0.8   # 3x too fast -> slow it (clamped)
    assert p.stretch_rate_for(2.0) == 1.2    # far too slow -> speed up (clamped)
    assert abs(p.stretch_rate_for(12.5) - 0.8) < 1e-9  # 10/12.5 quantized
    tiny = np.zeros(128, np.float32)
    # too short to stretch alone -> held in the accumulator (empty out), not
    # passed through raw (see test_stretch_accumulates_small_chunks)
    assert len(p.process(tiny, 30.0)) == 0
    assert len(p._inbuf) == 128


def test_bandpass_separator_attenuates_out_of_band():
    sep = BandpassSeparator(use_device=True)
    low = _tone(50, seconds=0.5)     # below band
    mid = _tone(800, seconds=0.5)    # in band
    out_low = sep.separate(low)
    out_mid = sep.separate(mid)
    assert np.std(out_low) < 0.15 * np.std(low)
    assert np.std(out_mid) > 0.5 * np.std(mid)
    assert len(out_low) == len(low)


def test_separator_factory():
    assert create_separator(None) is None
    assert create_separator("filter").name == "filter"
    sep = create_separator("demucs")  # no demucs installed -> bandpass fallback
    assert sep is not None


def test_neural_separator_shape_and_fallback():
    from realtime_whisper_asr_tpu.models.separation_nn import NeuralSeparator

    sep = create_separator("neural")
    assert isinstance(sep, NeuralSeparator)
    audio = _tone(440, seconds=0.7)
    out = sep.separate(audio)
    assert out.shape == audio.shape and out.dtype == np.float32
    assert np.isfinite(out).all()
    tiny = np.zeros(100, np.float32)
    assert sep.separate(tiny) is tiny  # shorter than one FFT frame -> passthrough


def test_neural_separator_weights_roundtrip(tmp_path):
    from realtime_whisper_asr_tpu.models.separation_nn import NeuralSeparator

    sep = NeuralSeparator(seed=3)
    p = str(tmp_path / "sep.npz")
    sep.save_npz(p)
    sep2 = NeuralSeparator.load_npz(p)
    a = _tone(600, seconds=0.5)
    np.testing.assert_allclose(sep.separate(a), sep2.separate(a), atol=1e-6)


def test_overlap_windowed_identity_and_gain():
    """The long-input window stitcher must reconstruct exactly under an
    identity/gain map (crossfade weights sum to 1 everywhere)."""
    import numpy as np

    from realtime_whisper_asr_tpu.pipeline.separation import overlap_windowed

    x = np.random.default_rng(0).standard_normal(50_000).astype(np.float32)
    out = overlap_windowed(lambda s: s, x, block=16384, overlap=4096)
    np.testing.assert_allclose(out, x, atol=1e-5)
    out2 = overlap_windowed(lambda s: 2.0 * s, x, block=16384, overlap=4096)
    np.testing.assert_allclose(out2, 2.0 * x, atol=1e-5)


def test_stretch_tracks_applied_rate():
    """applied_rate exposes what actually happened to the last chunk so the
    app can un-normalize result durations for the rate detector (feeding it
    post-stretch durations cancels the correction into oscillation)."""
    import numpy as np

    from realtime_whisper_asr_tpu.pipeline.stretch import SpeechRateAudioProcessor

    p = SpeechRateAudioProcessor()
    x = np.random.default_rng(1).standard_normal(16000).astype(np.float32) * 0.1
    p.process(x, measured_cps=10.0)  # normal rate -> passthrough
    assert p.applied_rate == 1.0
    out = p.process(x, measured_cps=14.0)  # fast speech -> rate < 1
    assert p.applied_rate < 1.0
    assert len(out) > len(x)  # slowed down = longer
    # recovered raw duration: stretched duration x applied_rate ~ original
    assert abs(len(out) * p.applied_rate - len(x)) / len(x) < 0.05
    p.process(x[:1000], measured_cps=14.0)  # below min_samples -> passthrough
    assert p.applied_rate == 1.0


def test_stretch_phase_carry_reduces_join_clicks():
    """Consecutive stretched chunks are phase-continuous: carrying the
    vocoder phase across calls must produce a smaller boundary discontinuity
    than restarting it per chunk (the independent-chunk click the round-3
    review flagged). Measured: join jump 4.9x the typical sample-to-sample
    delta uncarried vs ~3.7x carried on a two-tone probe."""
    import numpy as np

    from realtime_whisper_asr_tpu.pipeline.stretch import SpeechRateAudioProcessor

    t = np.arange(32768) / 16000
    sig = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.25 * np.sin(2 * np.pi * 447 * t)).astype(np.float32)
    c1, c2 = sig[:16384], sig[16384:]

    def join_ratio(carry):
        p = SpeechRateAudioProcessor()
        o1 = p.process(c1, 14.0)
        if not carry:
            p._phase = None  # simulate the per-chunk restart
        o2 = p.process(c2, 14.0)
        cat = np.concatenate([o1, o2])
        j = len(o1)
        d = np.abs(np.diff(cat))
        typ = np.median([d[k:k + 128].max() for k in range(1000, j - 2000, 997)])
        return d[j - 64:j + 64].max() / typ

    carried, restarted = join_ratio(True), join_ratio(False)
    assert carried < restarted, (carried, restarted)
    assert carried < 4.5, carried
    # passthrough breaks the synthetic timeline; the carry must reset
    p = SpeechRateAudioProcessor()
    p.process(c1, 14.0)
    assert p._phase is not None
    p.process(c1, 10.0)  # normal rate -> passthrough
    assert p._phase is None


def test_stretch_accumulates_small_chunks():
    """Chunks below min_samples are held and stretched as a block instead of
    silently passing through — at the CLI's default 0.25 s read (4000
    samples < min_samples 4096) the feature was inert and mixed raw and
    stretched audio in one timeline (round-3 review)."""
    import numpy as np

    from realtime_whisper_asr_tpu.pipeline.stretch import SpeechRateAudioProcessor

    p = SpeechRateAudioProcessor()
    rng = np.random.default_rng(2)
    chunks = [rng.standard_normal(4000).astype(np.float32) * 0.1 for _ in range(4)]
    outs = [p.process(c, measured_cps=14.0) for c in chunks]
    assert len(outs[0]) == 0  # first 0.25 s held (below the block size)
    total_in = sum(map(len, chunks)) - len(p._inbuf)  # any residue still held
    total_out = sum(map(len, outs))
    rate = p.stretch_rate_for(14.0)
    assert total_out > 0 and abs(total_out - total_in / rate) < 2048
    # a passthrough call flushes held audio in order, unstretched
    p2 = SpeechRateAudioProcessor()
    assert len(p2.process(chunks[0], measured_cps=14.0)) == 0
    flushed = p2.process(chunks[1], measured_cps=10.0)
    assert len(flushed) == 8000
    np.testing.assert_array_equal(flushed[:4000], chunks[0])


def test_speech_rate_window_expires_on_read():
    """chars_per_second()/classify() are consulted every chunk by the
    stretch/adaptive-params path; after a long pause the stale fast-speech
    window must expire at READ time, not only when the next add_result
    lands (round-3 review)."""
    from realtime_whisper_asr_tpu.pipeline.speech_rate import SpeechRateDetector

    t = [0.0]
    det = SpeechRateDetector(clock=lambda: t[0], max_age_s=30.0)
    det.add_result("x" * 40, 2.0, current_time=0.0)   # 20 cps: fast
    det.add_result("x" * 40, 2.0, current_time=1.0)
    assert det.classify() == "fast"
    t[0] = 300.0  # 5-minute pause; NO new result yet
    assert det.chars_per_second() is None
    assert det.classify() == "unknown"
