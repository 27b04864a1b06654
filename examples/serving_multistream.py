"""Multi-stream serving example: N concurrent sessions over ONE shared model.

Feeds two synthetic conversations (different "speakers" per stream) through
the batched + pipelined StreamServer and prints per-stream, speaker-labeled
results. With no checkpoint the model is random-init (no network in dev
images), so transcripts are placeholder tokens — the point is the serving
surfaces: create_stream / feed / step / poll / close_stream, load shedding,
and diarization labels.

Run:  python examples/serving_multistream.py [--model tiny] [--checkpoint DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

import numpy as np

SR = 16000


def speaker_audio(seed: int, turns: int = 3) -> np.ndarray:
    from realtime_whisper_asr_tpu.models.vad.synthetic import (
        sample_speaker,
        synth_speaker_utterance,
    )

    rng = np.random.default_rng(seed)
    a, b = sample_speaker(rng), sample_speaker(rng)
    gap = (0.002 * rng.standard_normal(SR)).astype(np.float32)
    pieces = []
    for t in range(turns * 2):
        spk = a if t % 2 == 0 else b
        utt = synth_speaker_utterance(rng, spk, seconds=2.0)
        pieces += [utt * (0.5 / (np.abs(utt).max() + 1e-6)), gap.copy()]
    return np.concatenate(pieces)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--streams", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.asr import TPUWhisperASR
    from realtime_whisper_asr_tpu.serving import StreamServer
    from realtime_whisper_asr_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    asr = TPUWhisperASR(
        model_size=args.model, checkpoint_dir=args.checkpoint, dtype=jnp.bfloat16,
        quantization="int8",
    )
    asr.transcribe_kargs.update(max_new_tokens=48, max_total_tokens=48)
    server = StreamServer(asr, use_vad=True, diarize=True, online_chunk_size=0.5,
                          min_silence_duration_ms=300)

    sids = [server.create_stream() for _ in range(args.streams)]
    feeds = [speaker_audio(seed=10 + i) for i in range(args.streams)]
    chunk = SR // 2
    pos = 0
    while any(pos < len(f) for f in feeds):
        for sid, f in zip(sids, feeds):
            if pos < len(f):
                server.feed(sid, f[pos : pos + chunk])
        pos += chunk
        while server.step():
            pass
        for sid in sids:
            for r in server.poll(sid):
                spk = f"[{r.speaker}] " if r.speaker else ""
                print(f"stream {r.stream_id} {r.begin:6.2f}-{r.end:6.2f}  {spk}{r.text}")
    for sid in sids:
        for r in server.close_stream(sid):
            spk = f"[{r.speaker}] " if r.speaker else ""
            print(f"stream {r.stream_id} {r.begin:6.2f}-{r.end:6.2f}  {spk}{r.text} (final)")
    print("stats:", server.get_stats())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
