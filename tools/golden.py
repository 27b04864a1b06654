"""Golden decode fixtures: saved tiny checkpoint + recorded transcripts.

``python tools/golden.py record`` writes tests/fixtures/golden/:
  - params.npz           (test-tiny Whisper weights, f16 — ~7 MB, committed)
  - transcripts.json     (offline token ids + texts, streaming commits, and
                          streaming-vs-offline agreement per clip)

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


def build_asr(word_timestamps: bool = True):
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
                        word_timestamps=word_timestamps)
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
    with open(os.path.join(FIXTURE_DIR, "transcripts.json"), "w") as f:
        json.dump({"model": "test-tiny", "seed": 7, "clips": clips}, f, indent=1)
    for c in clips:
        print(f"clip {c['idx']}: {len(c['offline_tokens'])} tokens, "
              f"agreement wer {c['agreement_wer']}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "record":
        raise SystemExit(record())
    print(__doc__)
