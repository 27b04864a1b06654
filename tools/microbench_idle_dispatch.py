"""Microbenchmark 4: does HOST/RELAY idle time before a dispatch make the
dispatch slower? (round-4; diagnoses the paced-mode +20 ms/tick tax)

Round-3 observation (docs/ROADMAP.md "Environment notes"): BENCH_PACED=1
(sleep to 1x realtime between chunks, i.e. a deployed mic cadence) measures
~+20 ms/tick vs the as-fast loop (0.093 vs 0.072 rtf int8-all) even though a
single idle-then-sync probe showed only +2 ms. Hypotheses:

  H1 cooled dispatch path: after ~1 s of host idleness the first jit dispatch
     (or its h2d/d2h legs) pays extra — TCP slow-start / Nagle on the relay
     socket, host CPU frequency scaling, or allocator cache decay. Prediction:
     tick cost grows with idle-gap length, and a keep-alive dispatch during
     the sleep removes the growth.
  H2 the sleep itself is mis-attributed: time.sleep() on a 1-core host
     overshoots and the overshoot lands inside the next tick's clock.
     Prediction: measured oversleep explains the gap; keep-alive changes
     nothing.

Method: a decode-tick-shaped program (scan of matmuls ~35 ms + small packed
int8 result) is dispatched and fetched repeatedly; between reps the host
sleeps IDLE_MS. For each idle gap we record the full dispatch->fetch wall
time. Variants:
  sleep    plain time.sleep(gap)
  spin     busy-wait the gap (isolates sleep-vs-idle from CPU frequency)
  keepalive sleep the gap in 100 ms slices, dispatching a trivial 8x8 matmul
           (no sync) each slice — the candidate product fix
  sleep_sync like sleep, but a tiny synced matmul right before the tick
           (does a cheap pre-warm recover the cost?)

Round-4 finding hunt: the first sweep (compute-only tick, no transfers)
measured NO idle-gap effect — but the REAL paced tick uploads ~34 KB at
insert time right after the sleep and downloads ~KBs at the end. If the
relay rides TCP, net.ipv4.tcp_slow_start_after_idle collapses the
congestion window during a ~1 s sleep, and a 34 KB upload then pays extra
round trips (cwnd10 ≈ 14.6 KB ⇒ 2-3 RTTs instead of 1 ≈ the observed
+20 ms/tick). The upload variants isolate that leg:
  upload_sleep      sleep gap → 34 KB h2d → tick → fetch (times each leg)
  upload_keepalive  same, but 100 ms keep-alive slices each push a ~1.5 KB
                    h2d during the gap (keeps cwnd warm — candidate fix)

Usage: python tools/microbench_idle_dispatch.py   (quiet host; serialize
with other TPU work). Writes /tmp/microbench_idle_dispatch.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    T, D = 800, 1280
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, D)) * D**-0.5, jnp.bfloat16)

    @jax.jit
    def tick(x, ws):
        def body(h, wk):
            return jnp.dot(h, wk, preferred_element_type=jnp.float32).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, ws)
        flat = h.reshape(-1)[: 16 * 1024].astype(jnp.float32)
        return (flat * 127.0).astype(jnp.int8)

    @jax.jit
    def pulse(a):
        return a @ a

    tiny = jnp.ones((8, 8), jnp.bfloat16)

    # calibrate scan length to ~35 ms (one headline tick's device compute)
    for k in (64, 128, 256, 384, 512):
        ws = jnp.stack([w] * k)
        out = tick(x, ws); np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(tick(x, ws))
        t = (time.perf_counter() - t0) / 5
        print(f"k={k}: tick {t*1e3:.1f} ms", flush=True)
        if t >= 0.028:
            break
    results: dict = {"tick_ms_hot": t * 1e3, "k": k}

    def spin(seconds: float) -> None:
        end = time.perf_counter() + seconds
        while time.perf_counter() < end:
            pass

    # ~the headline tick's h2d payload (33.6 KB counted in BENCH_r03) and a
    # keep-alive-sized crumb (one TCP segment's worth)
    up_payload = rng.standard_normal(8600).astype(np.float32)  # 34.4 KB
    crumb = np.ones(380, np.float32)  # ~1.5 KB

    @jax.jit
    def consume(u):
        return jnp.sum(u)  # force the upload to be consumed by a program

    def rep(variant: str, gap_ms: float) -> tuple[float, float, float]:
        """One idle gap + one tick; returns (tick_ms, oversleep_ms, upload_ms)."""
        gap = gap_ms / 1e3
        t0 = time.perf_counter()
        if variant == "spin":
            spin(gap)
        elif variant in ("keepalive", "upload_keepalive"):
            end = t0 + gap
            while True:
                left = end - time.perf_counter()
                if left <= 0:
                    break
                time.sleep(min(0.1, left))
                if variant == "upload_keepalive":
                    consume(jnp.asarray(crumb))  # small h2d keeps cwnd warm
                else:
                    pulse(tiny)  # dispatch only; no sync
        else:
            time.sleep(gap)
        oversleep = (time.perf_counter() - t0 - gap) * 1e3
        if variant == "sleep_sync":
            np.asarray(pulse(tiny))
        up_ms = 0.0
        t1 = time.perf_counter()
        if variant.startswith("upload"):
            u = jnp.asarray(up_payload)  # the tick-shaped h2d leg
            consume(u)
            up_ms = (time.perf_counter() - t1) * 1e3
        out = tick(x, ws)
        _ = np.asarray(out)
        return (time.perf_counter() - t1) * 1e3, oversleep, up_ms

    reps = 15
    for gap_ms in (0, 50, 200, 500, 940):
        for variant in ("sleep", "spin", "keepalive", "sleep_sync",
                        "upload_sleep", "upload_keepalive"):
            if gap_ms == 0 and variant not in ("sleep", "upload_sleep"):
                continue
            ts, overs, ups = [], [], []
            for _ in range(reps):
                ms, ov, up = rep(variant, gap_ms)
                ts.append(ms); overs.append(ov); ups.append(up)
            med = float(np.median(ts)); p90 = float(np.percentile(ts, 90))
            omed = float(np.median(overs)); umed = float(np.median(ups))
            results[f"{variant}_{gap_ms}ms"] = med
            results[f"{variant}_{gap_ms}ms_p90"] = p90
            results[f"{variant}_{gap_ms}ms_oversleep"] = omed
            if variant.startswith("upload"):
                results[f"{variant}_{gap_ms}ms_upload"] = umed
            print(f"{variant:16s} gap={gap_ms:4d}ms: tick median {med:6.1f} ms "
                  f"(p90 {p90:6.1f}) oversleep {omed:5.2f} ms"
                  + (f" upload {umed:5.1f} ms" if variant.startswith("upload") else ""),
                  flush=True)

    print(json.dumps(results))
    with open("/tmp/microbench_idle_dispatch.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from realtime_whisper_asr_tpu import utils

    utils.start_background_warmup()
    main()
