"""Microbenchmark 2: separate per-CALL dispatch overhead from per-KERNEL cost
and profile the encoder subtractively (round-3 planning; follows
tools/microbench_encoder.py which refuted the round-2 "2% MFU" claim).

Questions answered on the real chip:
 1. what does ONE trivial jit call cost when N calls are dispatched
    back-to-back? (relay per-call overhead vs pipelined execution)
 2. sustained in-scan matmul rate at k=256 (fully amortized)
 3. where do the encoder's ms go? ablations: matmuls-only body, no-attention,
    no-eltwise — bf16 and int8-all
 4. effective HBM read bandwidth for streaming the stacked encoder weights
    (bf16 vs int8) — is weight streaming the int8-all win?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_dispatch.py
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T, D, FF = 800, 1280, 5120


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    results = {}
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # -- 1. trivial-call dispatch cost --------------------------------------
    tiny = jnp.ones((8, 128), jnp.float32)
    f_triv = jax.jit(lambda x: x + 1.0)
    for reps in (20, 100):
        t = timeit(f_triv, tiny, reps=reps)
        results[f"trivial_call_us_reps{reps}"] = t * 1e6
        print(f"trivial jit call (reps={reps}): {t*1e6:.0f} us/call", flush=True)

    # chain of 2 dependent trivial calls per "tick" — does a dependent chain
    # pay twice the overhead?
    def two_calls(x):
        return f_triv(f_triv(x))
    t = timeit(two_calls, tiny, reps=50)
    results["two_dependent_trivial_calls_us"] = t * 1e6
    print(f"two dependent trivial calls: {t*1e6:.0f} us", flush=True)

    # -- 2. fully amortized scan matmul -------------------------------------
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, D)) * D**-0.5, jnp.bfloat16)

    def chain(x, wstack):
        def body(h, wk):
            return jnp.dot(h, wk, preferred_element_type=jnp.float32).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, wstack)
        return h

    flop1 = 2 * T * D * D
    for k in (128, 256):
        ws = jnp.stack([w] * k)
        t = timeit(jax.jit(chain), x, ws, reps=10)
        results[f"scan_matmul_k{k}_us"] = t / k * 1e6
        results[f"scan_matmul_k{k}_tflops"] = flop1 / (t / k) / 1e12
        print(f"scan matmul k={k}: {t/k*1e6:.1f} us/matmul "
              f"({flop1/(t/k)/1e12:.1f} TFLOP/s)", flush=True)

    # -- 4. weight-streaming bandwidth --------------------------------------
    # reduce-sum over a large stacked weight tensor = pure HBM read
    for name, arr in (
        ("bf16", jnp.asarray(rng.standard_normal((64, D, D)), jnp.bfloat16)),
        ("int8", jnp.asarray(
            rng.integers(-127, 127, (128, D, D)), jnp.int8)),
    ):
        nbytes = arr.size * arr.dtype.itemsize
        f = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
        t = timeit(f, arr, reps=10)
        results[f"hbm_read_{name}_gbps"] = nbytes / t / 1e9
        print(f"HBM stream {name} ({nbytes/1e6:.0f} MB): {t*1e3:.2f} ms = "
              f"{nbytes/t/1e9:.0f} GB/s", flush=True)

    # -- 3. encoder ablations ------------------------------------------------
    from realtime_whisper_asr_tpu.models import whisper as W
    from realtime_whisper_asr_tpu.models.whisper import model as M
    from realtime_whisper_asr_tpu.models.whisper.model import (
        _attend,
        _linear,
        _merge_heads,
        _mlp_block,
        _self_qkv,
        layer_norm,
    )
    from realtime_whisper_asr_tpu.models.whisper.quant import fuse_qkv, quantize_all

    cfg = W.get_config("large-v3")
    params = M.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = fuse_qkv(quantize_all(params))
    mel = jnp.asarray(rng.standard_normal((1, 2 * T, cfg.n_mels)), jnp.bfloat16)

    def encode_ablate(params, mel, mode: str):
        """model.encode with pieces removed (docstring model.py:302)."""
        enc = params["encoder"]
        dn = ("NHC", "HIO", "NHC")
        xx = jax.lax.conv_general_dilated(mel, enc["conv1"]["w"].astype(mel.dtype), (1,), [(1, 1)], dimension_numbers=dn)
        xx = jax.nn.gelu(xx + enc["conv1"]["b"].astype(mel.dtype), approximate=False)
        xx = jax.lax.conv_general_dilated(xx, enc["conv2"]["w"].astype(mel.dtype), (2,), [(1, 1)], dimension_numbers=dn)
        xx = jax.nn.gelu(xx + enc["conv2"]["b"].astype(mel.dtype), approximate=False)
        xx = xx + enc["pos_emb"][: xx.shape[1]].astype(xx.dtype)
        n_head = cfg.n_audio_head

        def body(h, blk):
            if mode == "matmuls_only":
                q, k, v = _self_qkv(blk["attn"], h, n_head)
                o = q  # skip attention math
                h = h + _linear(_merge_heads(o), blk["attn"]["wo"], blk["attn"]["bo"])
                hm = _linear(h, blk["mlp"]["w1"], blk["mlp"]["b1"])
                h = h + _linear(hm, blk["mlp"]["w2"], blk["mlp"]["b2"])
            elif mode == "no_attention":
                hn = layer_norm(h, blk["attn_ln"]["g"], blk["attn_ln"]["b"])
                q, k, v = _self_qkv(blk["attn"], hn, n_head)
                o = q
                h = h + _linear(_merge_heads(o), blk["attn"]["wo"], blk["attn"]["bo"])
                h = _mlp_block(blk, h)
            elif mode == "no_eltwise":
                q, k, v = _self_qkv(blk["attn"], h, n_head)
                o, _ = _attend(q, k, v, None)
                h = h + _linear(_merge_heads(o), blk["attn"]["wo"], blk["attn"]["bo"])
                hm = jax.nn.gelu(_linear(h, blk["mlp"]["w1"], blk["mlp"]["b1"]), approximate=False)
                h = h + _linear(hm, blk["mlp"]["w2"], blk["mlp"]["b2"])
            else:  # full
                h = M._mha_block(blk, h, n_head, mask=None)
                h = _mlp_block(blk, h)
            return h, None

        xx, _ = jax.lax.scan(body, xx, enc["blocks"])
        return layer_norm(xx, enc["ln_post"]["g"], enc["ln_post"]["b"])

    for pname, p in (("bf16", params), ("int8", qparams)):
        for mode in ("full", "no_eltwise", "no_attention", "matmuls_only"):
            f = jax.jit(partial(encode_ablate, mode=mode))
            t = timeit(lambda m: f(p, m), mel, reps=10)
            results[f"encoder_{pname}_{mode}_ms"] = t * 1e3
            print(f"encoder {pname} {mode}: {t*1e3:.2f} ms", flush=True)

    print(json.dumps(results))
    with open("/tmp/microbench_dispatch.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    from realtime_whisper_asr_tpu import utils
    utils.start_background_warmup()
    main()
