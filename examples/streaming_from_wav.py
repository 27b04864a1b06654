"""Streaming transcription of a WAV as a simulated microphone (BASELINE
config #2 shape: 1 s chunks + VAD (VAC mode)).

    python examples/streaming_from_wav.py audio.wav --model base --language en
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from realtime_whisper_asr_tpu.app import StreamingApp
from realtime_whisper_asr_tpu.config import ConfigManager
from realtime_whisper_asr_tpu.io import SimulatedMicStream
from realtime_whisper_asr_tpu.utils import enable_persistent_compile_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("file")
    p.add_argument("--model", default="base")
    p.add_argument("--language", default="en")
    p.add_argument("--realtime", action="store_true", help="pace to wall clock")
    p.add_argument("--separation", action="store_true", help="band-pass vocal isolation")
    args = p.parse_args()

    enable_persistent_compile_cache()
    cm = ConfigManager(autoload=False)
    cm.set("model.size", args.model)
    if args.separation:
        cm.set("vocal_separation.enable", True)
    app = StreamingApp(config=cm, language=args.language)
    stream = SimulatedMicStream.from_wav(args.file, realtime=args.realtime)
    try:
        stats = app.record_session(stream, chunk_seconds=1.0)
        print(
            f"\n{stats.results} results, {stats.skipped} skips, "
            f"{stats.duration_s:.1f}s audio"
        )
    finally:
        app.shutdown()


if __name__ == "__main__":
    main()
