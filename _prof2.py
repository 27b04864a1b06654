"""Dissect the large-v3 decode step cost: logits head, self-KV, cross-KV."""
import functools
import json
import time

import numpy as np

from realtime_whisper_asr_tpu.utils import (
    enable_persistent_compile_cache,
    start_background_warmup,
)

enable_persistent_compile_cache()
start_background_warmup()

import jax
import jax.numpy as jnp

from realtime_whisper_asr_tpu.models import whisper as W
from realtime_whisper_asr_tpu.models.whisper import model as M
from realtime_whisper_asr_tpu.models.whisper.quant import fuse_qkv, quantize_decoder

cfg = W.get_config("large-v3")
params = fuse_qkv(quantize_decoder(W.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)))

SR = 16000


def timeit(name, fn, n=10, warmup=2, extra=None):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / n
    out = {"op": name, "ms": round(dt * 1e3, 3)}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def steps(p, cache, n, with_logits=True):
    def body(i, st):
        cache, tok = st
        logits, cache, _ = M.decode_step(p, cfg, tok, jnp.int32(256) + i, cache)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32) if with_logits else tok
        return cache, nxt
    return jax.lax.fori_loop(0, n, body, (cache, jnp.zeros((1,), jnp.int32)))


# decode_step variant without the logits head: monkeypatch-free — time a
# modified copy of the step that skips the final projection
def steps_nologits(p, cache, n):
    dec = p["decoder"]

    def one(tok, pos, cache):
        x = dec["tok_emb"][tok] + dec["pos_emb"][pos]
        x = x[:, None, :].astype(cache.self_k.dtype)
        n_head = cfg.n_text_head
        text_ctx = cache.self_k.shape[3]
        t_mask = (jnp.arange(text_ctx) > pos)[None, None, None, :] * jnp.float32(-1e9)

        def body(h, xs):
            blk, kc, vc, ck, cv = xs
            hn = M.layer_norm(h, blk["attn_ln"]["g"], blk["attn_ln"]["b"])
            q, k, v = M._self_qkv(blk["attn"], hn, n_head)
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k, pos, axis=2)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v, pos, axis=2)
            o, _ = M._attend(q, kc, vc, t_mask)
            h = h + M._linear(M._merge_heads(o), blk["attn"]["wo"], blk["attn"]["bo"])
            hn = M.layer_norm(h, blk["cross_ln"]["g"], blk["cross_ln"]["b"])
            q = M._split_heads(M._linear(hn, blk["cross"]["wq"], blk["cross"]["bq"]), n_head)
            o, _ = M._attend(q, ck, cv, None)
            h = h + M._linear(M._merge_heads(o), blk["cross"]["wo"], blk["cross"]["bo"])
            h = M._mlp_block(blk, h)
            return h, (kc, vc)

        xs = (dec["blocks"], cache.self_k, cache.self_v, cache.cross_k, cache.cross_v)
        x, (nk, nv) = jax.lax.scan(body, x, xs)
        return M.DecoderCache(self_k=nk, self_v=nv, cross_k=cache.cross_k, cross_v=cache.cross_v), x

    def body(i, st):
        cache, acc = st
        cache, x = one(jnp.zeros((1,), jnp.int32), jnp.int32(256) + i, cache)
        return cache, acc + jnp.sum(x)
    return jax.lax.fori_loop(0, n, body, (cache, jnp.float32(0)))


for win_s, cache_len in ((16, 384), (16, 128), (8, 384), (30, 512)):
    audio = np.random.default_rng(0).standard_normal(win_s * SR).astype(np.float32) * 0.1
    from realtime_whisper_asr_tpu.ops import log_mel_spectrogram

    mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=cfg.n_mels).astype(jnp.bfloat16)[None]
    xa = jax.jit(W.encode, static_argnames=("cfg",))(params, cfg, mel)

    @functools.partial(jax.jit, static_argnames=("cl",))
    def mk(p, xa, cl):
        return M.init_cache(p, cfg, xa, text_ctx=cl)

    cache = mk(params, xa, cache_len)
    f = jax.jit(functools.partial(steps, n=32))
    timeit(f"32steps_win{win_s}s_cache{cache_len}", lambda: f(params, cache),
           extra={"audio_ctx": int(xa.shape[1])})
    if win_s == 16 and cache_len == 384:
        g = jax.jit(functools.partial(steps_nologits, n=32))
        timeit("32steps_nologits_win16_cache384", lambda: g(params, cache))
