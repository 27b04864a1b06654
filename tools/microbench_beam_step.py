"""Microbenchmark 5: why does a K=5 beam decode step cost ~5x a greedy step?
(round-4; VERDICT r3 #4 follow-up)

BENCH beam5 headline (in-loop capture, 1 download/tick) is rtf 0.1228 vs
greedy 0.0558. Per-tick arithmetic says the K=5 decode step runs ~9 ms vs
greedy ~1.8 ms — but the weights (910 MB int8-all) stream ONCE per step
regardless of batch, the cross-KV block is shared at batch 1, and only the
self-KV cache (a few MB) is per-beam. Expected step cost ~1.2-1.5x greedy.

This measures, all inside single jit programs (lax.fori_loop of N steps, so
no host dispatch in the measured region), on the real chip:

  step_b1          greedy-shaped decode_step, B=1
  step_b5          decode_step on a beam-tiled cache (self B=5, cross B=1)
  step_b5_gather   + _gather_beams by a rotating parent each step
  step_b5_expand   + the full expand cost: filters' two (5,V) log_softmaxes,
                   flat top_k over 5*n_vocab, token/score bookkeeping
  step_b5_capture  + xattn capture row + (5,96,A) buffer update + gather
  step_b5_crosstile decode_step with the cross-KV TILED 5x (the pre-r3
                   regression, for scale)

Usage: python tools/microbench_beam_step.py   (quiet rig; ~3-5 min)
Writes /tmp/microbench_beam_step.json.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from realtime_whisper_asr_tpu.asr import TPUWhisperASR
    from realtime_whisper_asr_tpu.models.whisper import beam as B
    from realtime_whisper_asr_tpu.models.whisper import decode as D
    from realtime_whisper_asr_tpu.models.whisper import model as M

    quant = os.environ.get("MB_QUANT", "int8-all")
    asr = TPUWhisperASR(model_size="large-v3",
                        quantization=None if quant in ("", "none") else quant)
    params, cfg = asr.params, asr.cfg
    K, N = 5, 24  # beams, steps per program
    AUDIO_CTX, CACHE_LEN, MAXNEW = 800, 256, 96
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.standard_normal((1, AUDIO_CTX, cfg.n_audio_state)) * 0.1,
                     jnp.bfloat16)
    amask = D._amask_dev(cfg, None)
    results = {}

    def steps_b1():
        cache = M.init_cache(params, cfg, xa, text_ctx=CACHE_LEN)

        @jax.jit
        def run(params, cache):  # params TRACED, not closed over: a closure
            # would bake ~1 GB of weights into the HLO as constants, and the
            # tunneled remote_compile rejects the request body (HTTP 413)
            def body(i, st):
                tok, cache = st
                logits, cache, _ = M.decode_step(params, cfg, tok, i + 4, cache)
                return (jnp.argmax(logits, -1).astype(jnp.int32), cache)

            tok0 = jnp.zeros((1,), jnp.int32)
            tok, cache = jax.lax.fori_loop(0, N, body, (tok0, cache))
            return tok

        return run, (params, cache)

    def steps_b5(mode, k=K):
        cache1 = M.init_cache(params, cfg, xa, text_ctx=CACHE_LEN)
        cache = B._tile_beams(cache1, k)
        if mode == "crosstile":
            cache = M.DecoderCache(
                self_k=cache.self_k, self_v=cache.self_v,
                cross_k=jnp.repeat(cache.cross_k, k, axis=1),
                cross_v=jnp.repeat(cache.cross_v, k, axis=1),
            )
        vocab_ids = jnp.arange(cfg.n_vocab)

        @jax.jit
        def run(params, cache):  # params traced (see steps_b1)
            xcap0 = jnp.zeros((k, MAXNEW, AUDIO_CTX), jnp.float32)
            scores0 = jnp.zeros((k,), jnp.float32)

            def body(i, st):
                tok, cache, scores, xcap = st
                am = amask if mode == "capture" else None
                logits, cache, xw = M.decode_step(params, cfg, tok, i + 4, cache,
                                                  alignment_mask=am)
                if mode == "plain" or mode == "crosstile":
                    return (jnp.argmax(logits, -1).astype(jnp.int32), cache,
                            scores, xcap)
                if mode == "gather":
                    parent = (jnp.arange(k, dtype=jnp.int32) + i) % k
                    cache = B._gather_beams(cache, parent)
                    return (jnp.argmax(logits, -1).astype(jnp.int32), cache,
                            scores, xcap)
                # expand / capture: the full beam bookkeeping
                lp1 = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                lp2 = jax.nn.log_softmax(lp1, -1)  # filters pass 2 analog
                cand = (scores[:, None] + lp2).reshape(-1)
                top_scores, top_idx = jax.lax.top_k(cand, k)
                parent = (top_idx // cfg.n_vocab).astype(jnp.int32)
                tok = (top_idx % cfg.n_vocab).astype(jnp.int32)
                cache = B._gather_beams(cache, parent)
                if mode == "capture":
                    xcap = xcap[parent]
                    xcap = jax.lax.dynamic_update_slice_in_dim(
                        xcap, xw[:, None, :].astype(jnp.float32), i, axis=1)
                return (tok, cache, top_scores, xcap)

            tok0 = jnp.zeros((k,), jnp.int32)
            tok, cache, scores, xcap = jax.lax.fori_loop(
                0, N, body, (tok0, cache, scores0, xcap0))
            return tok

        return run, (params, cache)

    run, args = steps_b1()
    t = timed(run, *args)
    results["step_b1_ms"] = t / N * 1e3
    print(f"step_b1:          {t / N * 1e3:7.2f} ms/step", flush=True)

    if os.environ.get("MB_SCALING", "") == "1":
        # batch-scaling curve of the PLAIN step (round 5): is the B=5 step's
        # +2.75 ms over B=1 linear per row (per-row VPU/bandwidth — then a
        # hand-tiled fused dequant matmul is the lever) or a fixed jump at
        # B≥2 (layout/padding — then the lever is the tiling shape)?
        for k in (2, 3, 5, 8):
            run, args = steps_b5("plain", k=k)
            t = timed(run, *args)
            results[f"step_b{k}_plain_ms"] = t / N * 1e3
            print(f"step_b{k}_plain:   {t / N * 1e3:7.2f} ms/step", flush=True)
    else:
        for mode, key in [("plain", "step_b5_ms"), ("gather", "step_b5_gather_ms"),
                          ("expand", "step_b5_expand_ms"),
                          ("capture", "step_b5_capture_ms"),
                          ("crosstile", "step_b5_crosstile_ms")]:
            run, args = steps_b5(mode)
            t = timed(run, *args)
            results[key] = t / N * 1e3
            print(f"{key[:-3]:17s} {t / N * 1e3:7.2f} ms/step", flush=True)

    print(json.dumps(results))
    with open("/tmp/microbench_beam_step.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
