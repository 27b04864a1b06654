"""Write the machine-readable quality-acceptance artifact (EVAL_r{N}.json).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/run_eval.py [--out EVAL_r02.json]

Runs the committed golden fixture (tools/golden.py: saved test-tiny
checkpoint + recorded transcripts) through the CURRENT code and records:
  - exact-reproduction booleans per clip (offline token ids, streaming commits)
  - streaming-vs-offline agreement WER per clip
  - the WER/CER harness self-checks

Random-init caveat: this image has no pretrained weights, so WER against
*human* references is not meaningful; the artifact locks DETERMINISM and the
measurement machinery. With a real checkpoint dir, --checkpoint runs the same
harness for true quality numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_r02.json")
    ap.add_argument("--checkpoint", default=None,
                    help="optional real checkpoint dir for true WER runs")
    args = ap.parse_args(argv)

    import golden as G

    from realtime_whisper_asr_tpu.eval import cer, wer

    with open(os.path.join(G.FIXTURE_DIR, "transcripts.json")) as f:
        recorded = json.load(f)
    asr = G.build_asr()
    clips = G.run_clips(asr)

    entries = []
    for rec, cur in zip(recorded["clips"], clips):
        entries.append({
            "clip": rec["idx"],
            "offline_tokens_reproduced": cur["offline_tokens"] == rec["offline_tokens"],
            "streaming_commits_reproduced": cur["streaming_text"] == rec["streaming_text"],
            "streaming_vs_offline_wer": cur["agreement_wer"],
            "offline_tokens": len(cur["offline_tokens"]),
        })

    harness = {
        "wer_identity": wer("a b c", "a b c"),
        "wer_one_sub": wer("a b c", "a x c"),
        "cer_identity": cer("abc", "abc"),
    }

    # feature-surface determinism matrix (VERDICT r3 #6): replay each recorded
    # row (beam5 / translate / long-window / int8-all / pre-quantized artifact
    # / VAC / diarization) through the current code
    matrix_rows = []
    if "matrix" in recorded:
        current_matrix = G.run_matrix()
        for key, rec in recorded["matrix"].items():
            matrix_rows.append({"row": key, "reproduced": current_matrix.get(key) == rec})

    out = {
        "model": recorded["model"],
        "fixture": "tests/fixtures/golden (committed checkpoint + transcripts)",
        "clips": entries,
        "matrix": matrix_rows,
        "all_reproduced": all(
            e["offline_tokens_reproduced"] and e["streaming_commits_reproduced"]
            for e in entries
        ) and all(m["reproduced"] for m in matrix_rows),
        "harness_selfcheck": harness,
        "note": (
            "random-init weights (no network): WER vs human references is not "
            "meaningful; this artifact locks decode determinism + the WER/CER "
            "machinery. Pass --checkpoint for true quality numbers."
        ),
    }
    if args.checkpoint:
        import numpy as np

        from realtime_whisper_asr_tpu.asr import TPUWhisperASR
        from realtime_whisper_asr_tpu.eval import evaluate_offline

        real = TPUWhisperASR(checkpoint_dir=args.checkpoint)
        manifest = [(f"golden{i}", G.golden_audio(i), "") for i in range(3)]
        out["checkpoint_runs"] = [
            {"name": r.name, "hyp": r.hypothesis, "rtf": r.wall_seconds / r.audio_seconds}
            for r in evaluate_offline(real, manifest)
        ]
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"all_reproduced": out["all_reproduced"], "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
