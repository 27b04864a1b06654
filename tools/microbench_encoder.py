"""Microbenchmark: is the encoder kernel-launch-bound, and what is the TRUE
roofline? (round-3 planning experiment; VERDICT r2 Next #1/#10)

Round 2 claimed "~2% MFU, 0.5 ms roofline" from XLA cost_analysis reporting
44.9 GFLOP for the 16 s-bucket large-v3 encoder. Hand-count says that number
is wrong: per layer at T=800, d=1280 the projections alone are
4*2*800*1280^2 = 10.5 GFLOP, MLP 21 GFLOP, attention 3.3 GFLOP -> ~35 GFLOP
PER LAYER, ~1.11 TFLOP for 32 layers. Roofline on v5e (197 bf16 / 394 int8
peak TFLOP/s): ~5.6 ms bf16 / ~2.8 ms int8 compute-bound, ~0.45 ms on
bandwidth. This script measures, on the real chip:

  1. per-kernel overhead: lax.scan chains of K matmuls / K elementwise ops
     (everything inside ONE jit -> no host dispatch in the measured region)
  2. peak achievable single-matmul throughput at encoder shapes (bf16, int8)
  3. a prototype fused Pallas kernel (grid-streamed weights, fori_loop of
     matmuls in one launch) vs the same chain as a scan of XLA kernels
  4. the real encoder (bf16 and int8-all) + its cost_analysis dump

Usage: python tools/microbench_encoder.py  (needs the TPU; ~3-6 min)
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T, D, FF = 800, 1280, 5120  # large-v3 encoder shapes at the 16 s bucket


def timeit(fn, *args, reps=20, warmup=3):
    """Median wall time of fn(*args) with async dispatch, one block per call.

    Per-call block_until_ready adds the tunnel sync floor (~28 ms) to EVERY
    rep, swamping ms-scale kernels — so instead dispatch `reps` calls
    back-to-back and block once; the device queue keeps the chip busy and
    amortizes the sync to <2 ms/rep at reps=20.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def q8(w):
    s = np.abs(w).max(axis=0, keepdims=True) / 127.0
    return (np.round(w / s).astype(np.int8), s.astype(np.float32).ravel())


def main():
    results = {}
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, D)) * D**-0.5, jnp.bfloat16)

    # -- 1a. scan chain of K matmuls (the encoder's structure) ---------------
    def chain(x, wstack):
        def body(h, wk):
            return jnp.dot(h, wk, preferred_element_type=jnp.float32).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, wstack)
        return h

    flop1 = 2 * T * D * D
    for k in (8, 32, 64):
        ws = jnp.stack([w] * k)
        t = timeit(jax.jit(chain), x, ws)
        per = t / k
        results[f"scan_matmul_k{k}_us"] = per * 1e6
        results[f"scan_matmul_k{k}_tflops"] = flop1 / per / 1e12
        print(f"scan matmul k={k}: {per*1e6:.1f} us/matmul "
              f"({flop1/per/1e12:.1f} TFLOP/s)", flush=True)

    # -- 1b. scan chain of K elementwise ops (pure per-kernel floor) ---------
    def echain(x, cs):
        def body(h, c):
            return h * c + jnp.bfloat16(0.1), None
        h, _ = jax.lax.scan(body, x, cs)
        return h

    for k in (32, 128):
        cs = jnp.ones((k,), jnp.bfloat16)
        t = timeit(jax.jit(echain), x, cs)
        results[f"scan_eltwise_k{k}_us"] = t / k * 1e6
        print(f"scan eltwise k={k}: {t/k*1e6:.1f} us/kernel", flush=True)

    # -- 2. one big matmul: peak achievable --------------------------------
    wbig = jnp.asarray(rng.standard_normal((D, 32 * D)) * D**-0.5, jnp.bfloat16)
    t = timeit(jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)), x, wbig)
    results["big_matmul_bf16_tflops"] = 2 * T * D * 32 * D / t / 1e12
    print(f"big matmul bf16 (800x1280 @ 1280x40960): {t*1e3:.2f} ms "
          f"= {results['big_matmul_bf16_tflops']:.1f} TFLOP/s", flush=True)

    w8big, s8big = q8(np.asarray(wbig, np.float32))
    w8big, s8big = jnp.asarray(w8big), jnp.asarray(s8big)

    def mm_int8(a, b8, s):
        a32 = a.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(a32), axis=-1, keepdims=True) / 127.0, 1e-12)
        aq = jnp.clip(jnp.round(a32 / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(aq, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx * s).astype(jnp.bfloat16)

    t = timeit(jax.jit(mm_int8), x, w8big, s8big)
    results["big_matmul_int8_tflops"] = 2 * T * D * 32 * D / t / 1e12
    print(f"big matmul int8: {t*1e3:.2f} ms = "
          f"{results['big_matmul_int8_tflops']:.1f} TFLOP/s", flush=True)

    # -- 3. prototype fused Pallas kernel: K matmuls in ONE launch ----------
    # grid=(K,); weight block streamed per grid step (Pallas double-buffers
    # consecutive grid-step input blocks automatically); x lives in a VMEM
    # scratch accumulator across steps.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fused_kernel(w_ref, x_ref, o_ref, acc):
        # w block arrives as (1, D, D) per grid step (Pallas double-buffers
        # the HBM->VMEM stream across steps automatically)
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc[:] = x_ref[:]

        acc[:] = jnp.dot(
            acc[:], w_ref[0], preferred_element_type=jnp.float32
        ).astype(acc.dtype)

        @pl.when(k == pl.num_programs(0) - 1)
        def _():
            o_ref[:] = acc[:]

    for k in (8, 32):
        ws = jnp.stack([w] * k)
        try:
            def call(x, ws, k=k):
                return pl.pallas_call(
                    fused_kernel,
                    grid=(k,),
                    in_specs=[
                        pl.BlockSpec((1, D, D), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((T, D), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((T, D), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
                    scratch_shapes=[pltpu.VMEM((T, D), x.dtype)],
                    cost_estimate=pl.CostEstimate(
                        flops=2 * T * D * D * k,
                        bytes_accessed=k * D * D * 2 + 2 * T * D * 2,
                        transcendentals=0,
                    ),
                )(ws, x)

            jit_call = jax.jit(call)
            ref = chain(x, ws)
            got = jit_call(x, ws)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
            t = timeit(jit_call, x, ws)
            per = t / k
            results[f"pallas_chain_k{k}_us"] = per * 1e6
            results[f"pallas_chain_k{k}_tflops"] = flop1 / per / 1e12
            print(f"pallas fused chain k={k}: {per*1e6:.1f} us/matmul "
                  f"({flop1/per/1e12:.1f} TFLOP/s), max_err={err:.3g}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas fused chain k={k} FAILED: {type(e).__name__}: {e}", flush=True)
            results[f"pallas_chain_k{k}_error"] = str(e)[:200]

    # -- 4. the real encoder + cost_analysis --------------------------------
    from realtime_whisper_asr_tpu.models import whisper as W
    from realtime_whisper_asr_tpu.models.whisper import model as M
    from realtime_whisper_asr_tpu.models.whisper.quant import fuse_qkv, quantize_all

    cfg = W.get_config("large-v3")
    params = M.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    mel = jnp.asarray(rng.standard_normal((1, 2 * T, cfg.n_mels)), jnp.bfloat16)

    enc = jax.jit(partial(M.encode, cfg=cfg))
    t = timeit(lambda m: enc(params, mel=m), mel, reps=10)
    results["encoder_bf16_ms"] = t * 1e3
    print(f"encoder bf16 16s bucket: {t*1e3:.2f} ms", flush=True)

    lowered = jax.jit(partial(M.encode, cfg=cfg)).lower(params, mel=mel)
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    results["cost_analysis_flops"] = float(ca.get("flops", -1))
    results["cost_analysis_bytes"] = float(ca.get("bytes accessed", -1))
    print(f"XLA cost_analysis: flops={results['cost_analysis_flops']:.3g} "
          f"bytes={results['cost_analysis_bytes']:.3g}", flush=True)

    qparams = fuse_qkv(quantize_all(params))
    encq = jax.jit(partial(M.encode, cfg=cfg))
    t = timeit(lambda m: encq(qparams, mel=m), mel, reps=10)
    results["encoder_int8_ms"] = t * 1e3
    print(f"encoder int8-all 16s bucket: {t*1e3:.2f} ms", flush=True)

    # hand-counted FLOPs for MFU
    L = cfg.n_audio_layer
    flops = L * (4 * 2 * T * D * D + 2 * 2 * T * D * FF + 2 * 2 * T * T * D)
    flops += 2 * (2 * 2 * T * 3 * cfg.n_mels * D + 0)  # conv stem approx
    results["hand_flops"] = flops
    results["encoder_bf16_mfu"] = flops / (results["encoder_bf16_ms"] / 1e3) / 197e12
    results["encoder_int8_mfu"] = flops / (results["encoder_int8_ms"] / 1e3) / 394e12
    print(f"hand FLOPs={flops/1e9:.0f} GFLOP -> bf16 MFU "
          f"{results['encoder_bf16_mfu']*100:.0f}% int8 MFU "
          f"{results['encoder_int8_mfu']*100:.0f}%", flush=True)

    print(json.dumps(results))
    with open("/tmp/microbench_encoder.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    from realtime_whisper_asr_tpu import utils
    utils.start_background_warmup()
    main()
