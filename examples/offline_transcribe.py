"""Offline file transcription (BASELINE config #1; reference analog:
先看这个，cursor不用看/2.py — faster-whisper offline example).

    python examples/offline_transcribe.py audio.wav --model tiny --language en
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp

from realtime_whisper_asr_tpu.asr import TPUWhisperASR
from realtime_whisper_asr_tpu.io import read_wav
from realtime_whisper_asr_tpu.utils import enable_persistent_compile_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("file")
    p.add_argument("--model", default="tiny")
    p.add_argument("--language", default="en")
    p.add_argument("--checkpoint", default=None, help="local HF or native checkpoint dir")
    p.add_argument("--beam-size", type=int, default=1)
    args = p.parse_args()

    enable_persistent_compile_cache()
    asr = TPUWhisperASR(
        model_size=args.model,
        language=args.language,
        checkpoint_dir=args.checkpoint,
        beam_size=args.beam_size,
        dtype=jnp.bfloat16,
    )
    audio = read_wav(args.file)
    for seg in asr.transcribe(audio):
        print(f"[{seg.start:7.2f} --> {seg.end:7.2f}] {seg.text.strip()}")


if __name__ == "__main__":
    main()
