"""Microbenchmark 6: fastest beam-reorder of the self-KV cache on this chip.

microbench_beam_step.py measured the per-step `cache[:, parent]` gather at
+5.0 ms — more than the whole K=5 decode step (6.2 ms). Candidates, timed on
cache-shaped buffers (L=32, K=5, H=20, ctx, Dh=64) bf16 inside one
fori_loop-of-N jit (no dispatch in the measured region):

  take       x[:, parent]                      (the shipped gather)
  onehot     einsum('nk,lkhtd->lnhtd', 1hot)   (reorder as an MXU matmul)
  cond       lax.cond(identity, no-op, take)   (skip when parent == iota)
  cond1hot   lax.cond(identity, no-op, onehot)

Each timed under two parent streams: rotating (always a real reorder) and
identity (the common no-divergence step), to bound both ends.

Usage: python tools/microbench_beam_gather.py   (quiet rig; ~2-3 min)
Writes /tmp/microbench_beam_gather.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

L, K, H, DH = 32, 5, 20, 64
N = 32  # reorders per program


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    results = {}
    for ctx in (256,):
        kc = jnp.asarray(np.random.default_rng(0).standard_normal((L, K, H, ctx, DH)),
                         jnp.bfloat16)
        vc = kc + 1
        iota = jnp.arange(K, dtype=jnp.int32)

        def reorder_take(kc, vc, parent):
            return kc[:, parent], vc[:, parent]

        def reorder_onehot(kc, vc, parent):
            oh = jax.nn.one_hot(parent, K, dtype=kc.dtype)  # (Knew, Kold)
            return (jnp.einsum("nk,lkhtd->lnhtd", oh, kc),
                    jnp.einsum("nk,lkhtd->lnhtd", oh, vc))

        def with_cond(inner):
            def f(kc, vc, parent):
                return jax.lax.cond(
                    jnp.all(parent == iota),
                    lambda k, v, p: (k, v),
                    inner,
                    kc, vc, parent,
                )
            return f

        variants = {
            "take": reorder_take,
            "onehot": reorder_onehot,
            "cond": with_cond(reorder_take),
            "cond1hot": with_cond(reorder_onehot),
        }

        for pname, pfn in (
            ("rot", lambda i: (iota + 1 + i % 2) % K),  # always a real reorder
            ("ident", lambda i: iota),
        ):
            for vname, vfn in variants.items():
                @jax.jit
                def run(kc, vc):
                    def body(i, st):
                        kc, vc = st
                        kc, vc = vfn(kc, vc, pfn(i))
                        return (kc, vc)
                    kc, vc = jax.lax.fori_loop(0, N, body, (kc, vc))
                    return kc[0, 0, 0, 0, 0] + vc[0, 0, 0, 0, 0]

                t = timed(run, kc, vc) / N * 1e3
                key = f"{vname}_{pname}_ctx{ctx}"
                results[key] = t
                print(f"{key:24s} {t:7.3f} ms/reorder", flush=True)

    print(json.dumps(results))
    with open("/tmp/microbench_beam_gather.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from realtime_whisper_asr_tpu import utils

    utils.start_background_warmup()
    main()
