"""Calibration + checkpoint-readiness drill (round-2 VERDICT #8): the full
synthetic-now-real-later chains must run end-to-end in one command each."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import calibrate  # noqa: E402  (tools/calibrate.py)


def test_calibrate_full_chain_on_synthetic_dir(tmp_path):
    """--synth generates a labeled dir; all three calibrations fit sane
    thresholds and --write-config persists them at the documented keys."""
    root = str(tmp_path / "corpus")
    cfg_path = str(tmp_path / "config.json")
    rc = calibrate.main([root, "--synth", "--out", str(tmp_path / "cal.json"),
                         "--write-config", cfg_path, "--seed", "3"])
    assert rc == 0
    cal = json.load(open(tmp_path / "cal.json"))
    assert set(cal) == {"vad", "speaker", "dedup"}
    # fitted thresholds are probabilities/similarities in range, with real
    # discrimination on the synthetic corpus (trained models ship in-repo)
    assert 0.05 <= cal["vad"]["threshold"] <= 0.95
    assert cal["vad"]["auc"] > 0.9
    assert -1.0 <= cal["speaker"]["threshold"] <= 1.0
    assert cal["speaker"]["eer"] < 0.25
    assert 0.0 <= cal["dedup"]["similarity_threshold"] <= 1.0
    assert cal["dedup"]["similarity_threshold"] <= cal["dedup"]["duplicate_threshold"]
    # config write-back landed on the keys the runtime reads
    cfg = json.load(open(cfg_path))
    assert cfg["vad"]["threshold"] == cal["vad"]["threshold"]
    assert cfg["diarization"]["threshold"] == cal["speaker"]["threshold"]
    assert (cfg["audio_deduplication"]["similarity_threshold"]
            == cal["dedup"]["similarity_threshold"])


def test_calibrate_partial_dir_only_present_manifests(tmp_path):
    root = str(tmp_path / "corpus")
    calibrate.write_synthetic_dir(root, seed=0, n_clips=4, n_speakers=3, utts=2)
    os.remove(os.path.join(root, "vad.jsonl"))
    os.remove(os.path.join(root, "dedup.jsonl"))
    cal = calibrate.calibrate_dir(root)
    assert set(cal) == {"speaker"}


def test_checkpoint_drill_end_to_end(tmp_path):
    """HF dir -> convert -> reload -> decode parity -> streaming session, and
    the converted checkpoint carries the sidecars (alignment heads + tokenizer
    files) so the first real checkpoint 'just works'."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tests.test_hf_path import _hf_dir
    from tests.test_tokenizer import byte_vocab_with_merges

    import checkpoint_drill

    path, _ = _hf_dir(tmp_path, alignment_heads=[[1, 0], [1, 1]])
    vocab, merges = byte_vocab_with_merges()
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n")

    work = str(tmp_path / "work")
    report_path = str(tmp_path / "drill.json")
    rc = checkpoint_drill.main([path, "--work", work, "--report", report_path])
    assert rc == 0
    rep = json.load(open(report_path))
    assert rep["ok"], rep
    assert set(rep["steps"]) == {"convert", "reload", "decode_parity",
                                 "prequant_artifact", "beam5", "stream"}
    # conversion is lossless at the token level
    assert rep["steps"]["decode_parity"]["ok"]
    # VERDICT r3 #9 legs: the int8-all artifact is detected + token-identical
    # to quantize-at-load, and beam=5 decodes identically native-vs-HF
    assert rep["steps"]["prequant_artifact"]["ok"]
    assert rep["steps"]["prequant_artifact"]["detected"] == "int8-all"
    assert rep["steps"]["beam5"]["ok"]
    # sidecars survived conversion: real tokenizer + alignment heads on reload
    assert rep["steps"]["reload"]["real_tokenizer"], rep["steps"]["reload"]
    assert rep["steps"]["reload"]["alignment_heads"], rep["steps"]["reload"]
