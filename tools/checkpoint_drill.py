"""Checkpoint-readiness drill: prove the full real-weights path works BEFORE
the first real checkpoint arrives (round-2 VERDICT missing #1).

One command takes an HF-layout Whisper dir through every step a production
checkpoint needs, and writes a machine-readable report:

  1. convert   HF dir -> native orbax checkpoint (tools/convert_checkpoint.py)
  2. reload    TPUWhisperASR boots from the native dir; flags a mock tokenizer
               (missing vocab.json/merges.txt) and missing alignment heads
  3. decode    offline transcribe of synthetic clips via both the HF dir and
               the converted dir — tokens must MATCH (conversion is lossless)
  4. stream    a short simulated-mic streaming session end-to-end
  5. (print)   the bench command to run for real-performance numbers

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/checkpoint_drill.py \
        /path/to/hf_whisper --work /tmp/drill [--quantize int8|int8-all] [--report drill.json]

With a real checkpoint the same command validates quality end-to-end:
add --manifest manifest.jsonl ({"wav":..., "text":...} lines) for true WER
via realtime_whisper_asr_tpu.eval.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SR = 16000


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help="HF-layout checkpoint dir")
    ap.add_argument("--work", required=True, help="working dir for the native checkpoint")
    ap.add_argument("--quantize", choices=["int8", "int8-all", "none"], default="none")
    ap.add_argument("--report", default=None, help="write the drill report JSON here")
    ap.add_argument("--manifest", default=None,
                    help="optional labeled manifest for true WER (real checkpoints)")
    args = ap.parse_args(argv)

    report: dict = {"src": args.src, "steps": {}}

    def step(name: str):
        t0 = time.perf_counter()

        def done(ok: bool, **info):
            report["steps"][name] = {"ok": ok, "seconds": round(time.perf_counter() - t0, 2), **info}
            print(f"[{'ok' if ok else 'FAIL'}] {name} "
                  f"({report['steps'][name]['seconds']}s) {info or ''}", flush=True)
            return ok

        return done

    # -- 1. convert ----------------------------------------------------------
    import convert_checkpoint

    native = os.path.join(args.work, "native_ckpt")
    done = step("convert")
    convert_checkpoint.main([args.src, native, "--quantize", args.quantize])
    done(True, out=native)

    # -- 2. reload -----------------------------------------------------------
    from realtime_whisper_asr_tpu.asr import TPUWhisperASR
    from realtime_whisper_asr_tpu.models.whisper.tokenizer import MockTokenizer

    done = step("reload")
    asr = TPUWhisperASR(checkpoint_dir=native, language="en")
    mock_tok = isinstance(asr.tokenizer, MockTokenizer)
    heads = asr.alignment_heads is not None
    done(True, model=asr.cfg.name, real_tokenizer=not mock_tok, alignment_heads=heads)
    if mock_tok:
        print("  ⚠️ no vocab.json/merges.txt in the checkpoint dir — text output "
              "will use the mock tokenizer (token ids are still exact)")
    if not heads:
        print("  ⚠️ no generation_config.json alignment_heads — word timestamps "
              "fall back to the default head set")

    # -- 3. decode parity HF dir vs converted dir ----------------------------
    done = step("decode_parity")
    rng = np.random.default_rng(0)
    clips = [
        (0.1 * rng.standard_normal(int(s * SR))).astype(np.float32)
        for s in (2.0, 3.5)
    ]
    asr_hf = TPUWhisperASR(checkpoint_dir=args.src, language="en",
                           quantization=None if args.quantize == "none" else args.quantize)
    match = True
    for clip in clips:
        ids_native = list(asr.transcribe(clip).tokens)
        ids_hf = list(asr_hf.transcribe(clip).tokens)
        match = match and ids_native == ids_hf
    done(match, clips=len(clips))

    # -- 3b. pre-quantized int8-all artifact (VERDICT r3 #9) ------------------
    # the deployment artifact: convert --quantize int8-all, reload, the loader
    # must DETECT the quantization and decode token-identically to
    # quantize-at-load on the same weights (quant.py claims exactness)
    from realtime_whisper_asr_tpu.models.whisper.quant import detect_quantization

    done = step("prequant_artifact")
    native_q = os.path.join(args.work, "native_ckpt_int8all")
    convert_checkpoint.main([args.src, native_q, "--quantize", "int8-all"])
    asr_pq = TPUWhisperASR(checkpoint_dir=native_q, language="en")
    detected = detect_quantization(asr_pq.params)
    asr_qal = TPUWhisperASR(checkpoint_dir=args.src, language="en", quantization="int8-all")
    qmatch = all(
        list(asr_pq.transcribe(c).tokens) == list(asr_qal.transcribe(c).tokens)
        for c in clips
    )
    done(qmatch and detected == "int8-all", detected=detected)

    # -- 3c. beam=5 leg (VERDICT r3 #9): the routine-beam setting through the
    # real checkpoint layout (alignment capture included), native vs HF ------
    done = step("beam5")
    asr.beam_size = asr_hf.beam_size = 5
    bmatch = all(
        list(asr.transcribe(c).tokens) == list(asr_hf.transcribe(c).tokens)
        for c in clips
    )
    asr.beam_size = asr_hf.beam_size = 1
    done(bmatch, beams=5)

    # -- 4. streaming session ------------------------------------------------
    from realtime_whisper_asr_tpu.config import ConfigManager
    from realtime_whisper_asr_tpu.app import StreamingApp, SessionStats
    from realtime_whisper_asr_tpu.io import SimulatedMicStream

    done = step("stream")
    cm = ConfigManager(autoload=False)
    cm.set("audio_deduplication.enable", False)
    app = StreamingApp(config=cm, asr=asr, language="en")
    stream = SimulatedMicStream((0.1 * rng.standard_normal(4 * SR)).astype(np.float32))
    stats = app.record_session(stream, chunk_seconds=0.5, use_protector=False)
    app.shutdown()
    done(True, chunks=stats.chunks, results=stats.results)

    # -- 5. optional true-WER manifest ---------------------------------------
    if args.manifest:
        from realtime_whisper_asr_tpu.eval import evaluate_offline
        from realtime_whisper_asr_tpu.io import read_wav
        from realtime_whisper_asr_tpu.train.data import read_manifest

        done = step("wer")
        triples = [(e.wav, read_wav(e.wav), e.text) for e in read_manifest(args.manifest)]
        evals = evaluate_offline(asr, triples)
        done(True,
             mean_wer=round(float(np.mean([r.wer for r in evals])), 4),
             clips=len(evals))

    report["ok"] = all(s["ok"] for s in report["steps"].values())
    print(json.dumps(report))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=1)
    print(f"\nnext: real-chip performance for this checkpoint:\n"
          f"  BENCH_CHECKPOINT={native} python bench.py")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(__file__))
    raise SystemExit(main())
