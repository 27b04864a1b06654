"""CLI wizard + hardware recommendation tests.

The reference wizard surfaces VRAM-tiered separation depth
(`一键实时识别麦克风.py:332-430,766-883`) and int8-on-CPU advice (:300-328);
these lock the TPU-native analogs (HBM-tiered separation method, bandwidth-
based quantization) and the wizard's config write-back (:824-828).
"""

import json

from realtime_whisper_asr_tpu.utils.hardware import (
    recommend_config,
    recommend_quantization,
    recommend_separation_config,
)

TPU16 = {"platform": "tpu", "device_kind": "TPU v5e", "n_devices": 1,
         "hbm_bytes": 16 * 2**30}
CPU = {"platform": "cpu", "device_kind": "cpu", "n_devices": 8, "hbm_bytes": None}


def test_separation_recommendation_tiers():
    # no music → off (the gate the reference wizard asks about)
    assert recommend_separation_config(TPU16, "large-v3")["method"] == "none"
    # music + roomy HBM → trained neural separator
    assert recommend_separation_config(TPU16, "large-v3", music_expected=True)[
        "method"] == "neural"
    # music + tight memory → band-pass (reference shipped default)
    tight = dict(TPU16, hbm_bytes=4 * 2**30)
    assert recommend_separation_config(tight, "large-v3", music_expected=True)[
        "method"] == "filter"
    # CPU degraded mode → small host-path mask net (better than band-pass at
    # a filter-like cost; see test_separation.test_recommend_separation_variants)
    cpu_rec = recommend_separation_config(CPU, "tiny", music_expected=True)
    assert cpu_rec["method"] == "neural" and cpu_rec["variant"] == "small"


def test_quantization_recommendation():
    # int8-all is the shipped recommendation for >=medium: measured fastest
    # 1 s-cadence streaming config (BENCH_SCENARIOS_r03, docs/ROADMAP.md)
    assert recommend_quantization(TPU16, "large-v3")["quantization"] == "int8-all"
    assert recommend_quantization(TPU16, "medium")["quantization"] == "int8-all"
    assert recommend_quantization(TPU16, "base")["quantization"] is None
    assert recommend_quantization(CPU, "tiny")["quantization"] is None


def test_wizard_persists_choices(tmp_path, monkeypatch):
    import realtime_whisper_asr_tpu.cli as cli

    cfg = tmp_path / "config.json"
    answers = iter([
        "tiny",        # model
        "zh",          # language
        "",            # task -> transcribe
        "y",           # background music
        "",            # separation -> recommended
        "int8",        # quantization
        "",            # streaming mode -> default (agree2 for tiny)
        "",            # wav -> mic
    ])
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    monkeypatch.setattr(cli, "detect_hardware", None, raising=False)
    monkeypatch.setattr(
        "realtime_whisper_asr_tpu.utils.hardware.detect_hardware", lambda: dict(TPU16)
    )
    captured = {}
    monkeypatch.setattr(cli, "main", lambda argv: captured.update(argv=argv) or 0)

    class A:
        config = str(cfg)

    assert cli.cmd_wizard(A()) == 0
    saved = json.loads(cfg.read_text())
    assert saved["model"]["size"] == "tiny"
    assert saved["model"]["quantization"] == "int8"
    assert saved["vocal_separation"]["enable"] is True
    assert saved["vocal_separation"]["method"] == "neural"
    assert saved["streaming"]["prefix_policy"] == "agree2"
    assert "--wav" not in captured["argv"]
    assert "stream" in captured["argv"]


def test_stream_flags_accept_all_quantization_modes(monkeypatch):
    """Regression: the wizard re-execs the stream subcommand with its chosen
    quantization — which is int8-all for >=medium on TPU. The flags parser
    must accept every mode the runtime supports (argparse used to reject
    int8-all/int8-kv, crashing the wizard's recommended path)."""
    import realtime_whisper_asr_tpu.cli as cli

    seen = []
    monkeypatch.setattr(cli, "cmd_stream", lambda args: seen.append(args.quantization) or 0)
    for q in ("int8", "int8-all", "int8-kv", "none"):
        assert cli.main(["stream", "--quantization", q]) == 0
    assert seen == ["int8", "int8-all", "int8-kv", "none"]


def test_recommend_config_cpu_fallback():
    assert recommend_config(CPU)["model"] == "tiny"
    assert recommend_config(TPU16)["model"] == "large-v3"


def test_diarize_flag_sets_config(tmp_path):
    import argparse

    from realtime_whisper_asr_tpu.cli import _add_model_args, _build_config

    p = argparse.ArgumentParser()
    _add_model_args(p)
    args = p.parse_args(["--diarize", "--config", str(tmp_path / "c.json")])
    cm = _build_config(args)
    assert cm.get("diarization.enable") is True


def test_subtitle_formats():
    from realtime_whisper_asr_tpu.asr import Segment, Word
    from realtime_whisper_asr_tpu.io.subtitles import format_segments

    segs = [
        Segment(0.0, 1.5, " hello world", [Word(0.0, 0.7, " hello"), Word(0.7, 1.5, " world")]),
        Segment(2.0, 2.0, "   ", []),  # blank text: dropped from srt/vtt/txt
        Segment(3661.25, 3662.5, " again", []),
    ]
    srt = format_segments(segs, "srt")
    assert srt.split("\n")[0] == "1"
    assert "00:00:00,000 --> 00:00:01,500" in srt
    assert "01:01:01,250 --> 01:01:02,500" in srt
    assert srt.count("-->") == 2  # blank cue dropped, numbering stays dense
    assert "\n2\n" in srt

    vtt = format_segments(segs, "vtt")
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:01.500" in vtt

    import json as _json
    data = _json.loads(format_segments(segs, "json"))
    assert len(data["segments"]) == 3
    assert data["segments"][0]["words"][1]["word"] == " world"

    assert format_segments(segs, "txt") == "hello world\nagain"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        format_segments(segs, "ass")


def test_cli_transcribe_output_format(tmp_path, monkeypatch):
    """transcribe --output-format srt --output FILE writes a subtitle file
    through the real CLI path (model swapped for a stub)."""
    import numpy as np

    import realtime_whisper_asr_tpu.cli as cli
    from realtime_whisper_asr_tpu.asr import Segment
    from realtime_whisper_asr_tpu.io import write_wav

    wav = tmp_path / "a.wav"
    write_wav(str(wav), np.zeros(16000, np.float32))

    class StubASR:
        def __init__(self, **kw):
            pass

        def transcribe(self, audio):
            return [Segment(0.0, 1.0, " hi", [])]

    monkeypatch.setattr("realtime_whisper_asr_tpu.asr.TPUWhisperASR", StubASR)
    out = tmp_path / "a.srt"
    rc = cli.main([
        "transcribe", str(wav), "--model", "test-tiny",
        "--config", str(tmp_path / "c.json"),
        "--output-format", "srt", "--output", str(out),
    ])
    assert rc == 0
    text = out.read_text()
    assert text.startswith("1\n00:00:00,000 --> 00:00:01,000\nhi")


def test_cli_transcribe_output_infers_format(tmp_path, monkeypatch):
    """--output FILE without --output-format infers the format from the
    extension instead of silently ignoring the flag (round-3 review)."""
    import numpy as np

    import realtime_whisper_asr_tpu.cli as cli
    from realtime_whisper_asr_tpu.asr import Segment
    from realtime_whisper_asr_tpu.io import write_wav

    wav = tmp_path / "a.wav"
    write_wav(str(wav), np.zeros(16000, np.float32))

    class StubASR:
        def __init__(self, **kw):
            pass

        def transcribe(self, audio):
            return [Segment(0.0, 1.0, " hi", [])]

    monkeypatch.setattr("realtime_whisper_asr_tpu.asr.TPUWhisperASR", StubASR)
    out = tmp_path / "b.vtt"
    rc = cli.main(["transcribe", str(wav), "--model", "test-tiny",
                   "--config", str(tmp_path / "c.json"), "--output", str(out)])
    assert rc == 0
    assert out.read_text().startswith("WEBVTT")
    # unknown extension: explicit error, not a silent console listing
    rc = cli.main(["transcribe", str(wav), "--model", "test-tiny",
                   "--config", str(tmp_path / "c.json"),
                   "--output", str(tmp_path / "b.xyz")])
    assert rc == 2


def test_cli_stream_multi_session_loop(tmp_path, monkeypatch, capsys):
    """Reference 一键…py:2184-2396 parity: after a session ends on a TTY the
    CLI offers restart / language switch / quit, reusing the loaded model.
    Drives two sessions with a zh switch between them through the real CLI."""
    import sys

    import numpy as np

    import realtime_whisper_asr_tpu.cli as cli
    import realtime_whisper_asr_tpu.io as io_mod

    class FakeMic:
        exhausted = False

        def __init__(self, device=None):
            pass

        def read(self, n):
            return np.zeros(n, np.float32), False

        def close(self):
            pass

    monkeypatch.setattr(io_mod, "MicrophoneStream", FakeMic)
    monkeypatch.setattr(sys.stdin, "isatty", lambda: True)
    answers = iter(["zh", "q"])
    monkeypatch.setattr("builtins.input", lambda *_: next(answers))
    rc = cli.main(["stream", "--model", "test-tiny", "--language", "en",
                   "--config", str(tmp_path / "c.json"), "--max-seconds", "0.5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("session:") == 2  # two sessions ran
    assert "language → zh" in out


def test_cli_separate_writes_stem_wavs(tmp_path):
    """`cli separate` writes one WAV per stem (vocals + accompaniment for the
    trained 2-stem default; drums/bass/other too once the 4stem weights are
    packaged) whose lengths match the input — the reference's Demucs stem
    output as a command (vocal_separation.py:187-213)."""
    import numpy as np

    from realtime_whisper_asr_tpu import cli
    from realtime_whisper_asr_tpu.io import read_wav, write_wav

    rng = np.random.default_rng(0)
    wav = tmp_path / "mix.wav"
    write_wav(str(wav), (rng.standard_normal(SR := 16000) * 0.1).astype(np.float32))
    rc = cli.main(["separate", str(wav), "--variant", "default", "--cpu",
                   "--out-dir", str(tmp_path / "stems")])
    assert rc == 0
    vocals = read_wav(str(tmp_path / "stems" / "mix.vocals.wav"))
    acc = read_wav(str(tmp_path / "stems" / "mix.accompaniment.wav"))
    assert len(vocals) == len(acc) == SR
    assert float(np.abs(vocals).max()) > 0
