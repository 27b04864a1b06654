#!/usr/bin/env python
"""Long-session stability soak: drive a full StreamingApp session for many
simulated minutes and assert nothing drifts.

Production-readiness check the scenario benches (30-72 s) cannot see:
per-tick host cost creeping with transcript length (the reference's session
loop runs for hours, `一键实时识别麦克风.py:2185-2347`), unbounded buffers,
registry leaks, RSS growth. Runs on CPU with the test-tiny model in a few
wall-clock minutes per simulated hour.

Checks (exit 1 on failure):
  - per-tick latency drift: median of the last decile vs the second decile
    (first decile discarded as warmup) must stay under --drift-x
  - audio_buffer bounded by the trimming config at every tick
  - skip-detector history, hypothesis buffers, token history bounded
  - decode._PENDING_D2H empty at session end
  - jit signature counts stable after warmup (no mid-session retraces)
  - RSS growth after warmup under --rss-mb

Usage: tools/soak.py [--minutes 10] [--chunk 1.0] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_speech_cycle(rng, seconds: float, sr: int = 16000):
    """Speech-like audio with pauses (modulated harmonics + noise bursts),
    varied every call so the dedup gate and skip detector see fresh content."""
    import numpy as np

    t = np.arange(int(seconds * sr)) / sr
    f0 = rng.uniform(110, 220)
    voiced = np.zeros_like(t)
    for h in range(1, 5):
        voiced += np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.28)) / h
    # syllable-rate amplitude modulation + a silence gap somewhere
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.5, 4.5) * t))
    gap0 = rng.uniform(0.1, seconds - 0.4)
    env[(t > gap0) & (t < gap0 + 0.3)] = 0.0
    x = 0.25 * voiced * env + 0.02 * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def run_soak(minutes: float, chunk_s: float = 1.0, drift_x: float = 3.0,
             rss_mb: float = 400.0, model: str = "test-tiny") -> dict:
    import numpy as np

    from realtime_whisper_asr_tpu import asr as A
    from realtime_whisper_asr_tpu.app import SessionStats, StreamingApp
    from realtime_whisper_asr_tpu.config import ConfigManager
    from realtime_whisper_asr_tpu.models.whisper import decode as D

    cm = ConfigManager(autoload=False)
    cm.set("model.size", model)
    cm.set("performance.display_interval_s", 1e9)
    cm.set("fallback.auto_downgrade", False)  # keep the requested test model
    app = StreamingApp(config=cm, language="en")
    proc = app.processor
    online = getattr(proc, "online", proc)
    trim_cap_s = online.buffer_trimming_sec * 2 + 35.0  # trim target + slack

    rng = np.random.default_rng(0)
    n_ticks = int(minutes * 60 / chunk_s)
    lat, buf_s, failures = [], [], []
    stats = SessionStats()
    sigs_after_warmup = None
    rss_after_warmup = None

    t_all = time.perf_counter()
    for tick in range(n_ticks):
        chunk = synthetic_speech_cycle(rng, chunk_s)
        t0 = time.perf_counter()
        app.process_chunk(chunk, stats, now=tick * chunk_s, separated=True)
        lat.append(time.perf_counter() - t0)
        cur_buf = len(online.audio_buffer) / 16000.0
        buf_s.append(cur_buf)
        if cur_buf > trim_cap_s:
            failures.append(f"audio_buffer {cur_buf:.1f}s > cap {trim_cap_s:.1f}s at tick {tick}")
            break
        if tick == n_ticks // 10:  # end of warmup decile
            sigs_after_warmup = (A._apply_plans_jit._cache_size()
                                 + A._apply_plan_row_jit._cache_size())
            rss_after_warmup = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    wall = time.perf_counter() - t_all

    # ---- checks
    dec = max(len(lat) // 10, 1)
    early = float(np.median(lat[dec:2 * dec]))
    late = float(np.median(lat[-dec:]))
    if late > early * drift_x and late - early > 0.02:
        failures.append(f"per-tick latency drifted {early*1e3:.1f} -> {late*1e3:.1f} ms")
    if D._PENDING_D2H:
        failures.append(f"_PENDING_D2H leaked {len(D._PENDING_D2H)} entries")
    sigs_end = (A._apply_plans_jit._cache_size()
                + A._apply_plan_row_jit._cache_size())
    if sigs_after_warmup is not None and sigs_end > sigs_after_warmup + 4:
        failures.append(f"jit signatures grew {sigs_after_warmup} -> {sigs_end} after warmup")
    rss_end = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    if rss_after_warmup is not None and rss_end - rss_after_warmup > rss_mb:
        failures.append(f"RSS grew {rss_end - rss_after_warmup:.0f} MB after warmup")
    if app.skip_detector is not None and len(app.skip_detector.history) > 1000:
        failures.append(f"skip history unbounded: {len(app.skip_detector.history)}")
    tb = online.transcript_buffer
    for name, n in (("hyp.buffer", len(tb.buffer)), ("hyp.new", len(tb.new)),
                    ("token_history", len(online._token_history))):
        if n > 2000:
            failures.append(f"{name} unbounded: {n}")

    app.shutdown()
    return {
        "simulated_minutes": minutes,
        "ticks": len(lat),
        "wall_seconds": round(wall, 1),
        "soak_rtf": round(wall / (len(lat) * chunk_s), 4) if lat else None,
        "tick_ms_early": round(early * 1e3, 2),
        "tick_ms_late": round(late * 1e3, 2),
        "audio_buffer_s_max": round(max(buf_s), 1) if buf_s else None,
        "commited_words": len(online.commited),
        "results": stats.results,
        "rss_mb_end": round(rss_end, 1),
        "rss_mb_growth_after_warmup": round(rss_end - (rss_after_warmup or rss_end), 1),
        "jit_signatures": sigs_end,
        "failures": failures,
        "ok": not failures,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--chunk", type=float, default=1.0)
    ap.add_argument("--drift-x", type=float, default=3.0)
    ap.add_argument("--rss-mb", type=float, default=400.0)
    ap.add_argument("--model", default="test-tiny")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    report = run_soak(args.minutes, args.chunk, args.drift_x, args.rss_mb,
                      args.model)
    print(json.dumps(report, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
