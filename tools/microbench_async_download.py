"""Microbenchmark 3: can ``copy_to_host_async`` hide the tunnel's per-sync
round trip? (round-3; follows microbench_dispatch.py)

The streaming tick pays ONE blocking device→host transfer for the packed
decode result (decode.py greedy_decode: ``np.asarray(packed)``), measured at
~26-31 ms on the axon relay even when the data is tiny. Hypothesis: that cost
is the REQUEST round trip, issued only when the host blocks — if the D2H copy
is enqueued eagerly at dispatch time (``jax.Array.copy_to_host_async()``), the
response can be in flight (or already landed) by the time the host asks,
cutting most of the sync floor out of the tick.

Variants, each over a compute of ~decode-step duration and a packed-result-
sized payload:
  A  dispatch → np.asarray(out)                      (today's decode pattern)
  B  dispatch → copy_to_host_async → np.asarray      (eager D2H, no host work)
  C  dispatch → copy_to_host_async → host busy-loop → np.asarray
  D  dispatch → host busy-loop → np.asarray          (control for C)
  E  dispatch → reader thread does np.asarray → join (decode RWA_D2H_MODE=
     thread; works even if the runtime implements async copies as a no-op)

If B < A by ≳10 ms the fix is one line in decode.py/beam.py. If only C < D the
win needs host work between dispatch and parse (there is ~none in the tick).
If B == A but E < A, ship mode "thread" as the default.

Usage: python tools/microbench_async_download.py  (serialize with bench runs)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def host_busy(seconds: float) -> None:
    end = time.perf_counter() + seconds
    x = 0.0
    while time.perf_counter() < end:
        x += 1.0


def main():
    results = {}
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # ~40 ms compute producing a small packed result (like one tick's
    # encode+decode chain ending in the uint8-packed download).
    T, D = 800, 1280
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, D)) * D**-0.5, jnp.bfloat16)

    def make_compute(k: int, out_kb: int):
        n_out = out_kb * 1024

        @jax.jit
        def f(x, ws):
            def body(h, wk):
                return jnp.dot(h, wk, preferred_element_type=jnp.float32).astype(h.dtype), None
            h, _ = jax.lax.scan(body, x, ws)
            flat = h.reshape(-1)[:n_out].astype(jnp.float32)
            return (flat * 127.0).astype(jnp.int8)

        return f

    # calibrate k so compute ≈ 40 ms
    for k in (64, 128, 256, 384):
        ws = jnp.stack([w] * k)
        f = make_compute(k, 128)
        out = f(x, ws); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(x, ws)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / 5
        print(f"k={k}: compute {t*1e3:.1f} ms", flush=True)
        if t >= 0.030:
            break
    results["compute_ms"] = t * 1e3
    results["k"] = k

    import concurrent.futures

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def run(variant: str, out_kb: int, busy_ms: float = 0.0, reps: int = 20):
        f = make_compute(k, out_kb)
        ws = jnp.stack([w] * k)
        out = f(x, ws)
        _ = np.asarray(out)  # warm the transfer path
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x, ws)
            if variant in ("B", "C"):
                out.copy_to_host_async()
            if variant == "E":
                fut = pool.submit(np.asarray, out)
            if busy_ms:
                host_busy(busy_ms / 1e3)
            flat = fut.result() if variant == "E" else np.asarray(out)
            ts.append(time.perf_counter() - t0)
        ts = np.asarray(ts) * 1e3
        return float(np.median(ts)), float(np.percentile(ts, 90))

    for out_kb in (16, 128):
        for variant, busy in (("A", 0), ("B", 0), ("C", 60), ("D", 60), ("E", 0)):
            try:
                med, p90 = run(variant, out_kb, busy_ms=busy)
            except Exception as e:  # copy_to_host_async may be unimplemented
                print(f"{variant} out={out_kb}KB: FAILED {type(e).__name__}: {e}",
                      flush=True)
                results[f"{variant}_{out_kb}kb_error"] = str(e)
                continue
            results[f"{variant}_{out_kb}kb_ms"] = med
            results[f"{variant}_{out_kb}kb_p90_ms"] = p90
            print(f"{variant} out={out_kb}KB busy={busy}ms: "
                  f"median {med:.1f} ms (p90 {p90:.1f})", flush=True)

    print(json.dumps(results))
    with open("/tmp/microbench_async_download.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from realtime_whisper_asr_tpu import utils

    utils.start_background_warmup()
    main()
