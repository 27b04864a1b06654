"""StreamServer over the REAL TPUWhisperASR backend (test-tiny, CPU).

The other serving tests use fake backends to isolate scheduler logic; this
locks the full integration: per-stream device ring buffers, bundled uploads,
batched + pipelined dispatch/finalize through the actual jitted decode, and
language grouping — the exact path the multi-stream TPU benches run.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from realtime_whisper_asr_tpu.asr import TPUWhisperASR
from realtime_whisper_asr_tpu.models import whisper as W
from realtime_whisper_asr_tpu.serving import StreamServer

SR = 16000


def _audio(seconds=1.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    return (0.3 * np.sin(2 * np.pi * 300 * t) + 0.1 * rng.standard_normal(t.shape)).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def asr():
    a = TPUWhisperASR(cfg=W.get_config("test-tiny"), model_size="test-tiny",
                      dtype=jnp.float32, word_timestamps=True)
    a.transcribe_kargs.update(max_new_tokens=12, max_total_tokens=12)
    return a


def _run(server, sids, seconds=4):
    outs = {sid: [] for sid in sids}
    for t in range(seconds):
        for i, sid in enumerate(sids):
            server.feed(sid, _audio(1.0, seed=100 * i + t))
        while server.step():
            pass
        for sid in sids:
            outs[sid].extend(server.poll(sid))
    for sid in sids:
        outs[sid].extend(server.close_stream(sid))
    return outs


def test_real_backend_batched_pipelined_streams(asr):
    """Two same-language streams ride ONE batched+pipelined decode group
    through the real jitted loop; both make progress and state stays
    per-stream (device ring buffers keyed by sid)."""
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5,
                          prefix_policy="last")
    sids = [server.create_stream(), server.create_stream()]
    outs = _run(server, sids)
    # random weights: assert mechanics, not transcript quality — every stream
    # got through the decode path and the server forgot them on close
    assert server.get_stats()["total_streams"] == 0
    for sid in sids:
        for r in outs[sid]:
            assert r.stream_id == sid
            assert r.end >= r.begin >= 0.0


def test_real_backend_beam_serving(asr, monkeypatch):
    """beam_size>1 rides the SAME batched+pipelined serving path (VERDICT r2
    #5: beam is a first-class serving mode): two streams in one group must go
    through beam_decode_batch_dispatch, produce per-stream results, and leave
    no server state behind."""
    from realtime_whisper_asr_tpu.models.whisper import beam as B

    calls = {"n": 0}
    real_dispatch = B.beam_decode_batch_dispatch

    def counted(*a, **k):
        calls["n"] += 1
        return real_dispatch(*a, **k)

    monkeypatch.setattr(B, "beam_decode_batch_dispatch", counted)
    asr.transcribe_kargs["beam_size"] = 2
    try:
        server = StreamServer(asr, use_vad=False, online_chunk_size=0.5,
                              prefix_policy="last")
        sids = [server.create_stream(), server.create_stream()]
        outs = _run(server, sids, seconds=3)
    finally:
        asr.transcribe_kargs.pop("beam_size", None)
    assert calls["n"] > 0, "serving group never reached the batched beam path"
    assert server.get_stats()["total_streams"] == 0
    for sid in sids:
        for r in outs[sid]:
            assert r.stream_id == sid
            assert r.end >= r.begin >= 0.0


def test_real_backend_mixed_language_groups(asr):
    """en + zh streams form separate pipelined decode groups (DecodeOptions
    differ); both decode through the real loop without cross-talk in the
    shared ASR's language state."""
    server = StreamServer(asr, use_vad=False, online_chunk_size=0.5)
    a = server.create_stream(language="en")
    b = server.create_stream(language="zh")
    outs = _run(server, [a, b], seconds=3)
    assert server.get_stats()["total_streams"] == 0
    assert all(r.stream_id == a for r in outs[a])
    assert all(r.stream_id == b for r in outs[b])
