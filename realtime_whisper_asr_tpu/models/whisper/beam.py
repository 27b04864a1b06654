"""Beam-search decoding (jitted) + temperature sampling fallback.

The reference exposes beam_size 1–5 through faster-whisper/CTranslate2
(`asr_components.py:267-289`, adaptive beam in `speech_rate_audio_processor
.py:214-218`). TPU-native design:

- the prompt/prefix prefill runs once at batch 1, then the KV cache is TILED
  across K beams; each step is one batched decode_step over (K,) beams with
  a top-K reselection and a cache gather along the beam axis,
- EOT beams freeze (propagate EOT with score unchanged) — standard
  "finished beams ride along" semantics with length-penalized final pick,
- word timestamps: the winning sequence is re-prefilled ONCE with
  cross-attention capture (cheaper than capturing per beam per step),
- temperature sampling reuses the same loop with Gumbel-max selection
  (whisper's quality-retry ladder lives in asr.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from realtime_whisper_asr_tpu.models.whisper import decode as D
from realtime_whisper_asr_tpu.models.whisper import model as M
from realtime_whisper_asr_tpu.models.whisper.config import WhisperConfig


def _tile_beams(tree, k: int):
    """Repeat the batch axis (axis 1 for stacked-layer caches) k times."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, k, axis=1) if x.ndim >= 2 else x, tree
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "opts", "prompt_len", "apply_initial_rules", "max_new",
                     "cache_len", "beam_size"),
)
def _beam_loop(
    params,
    cfg: WhisperConfig,
    opts: D.DecodeOptions,
    xa: jnp.ndarray,  # (1, audio_ctx, d)
    aux: jnp.ndarray,  # (AUX_LEN,)
    sup_mask: jnp.ndarray,
    prompt_len: int,
    apply_initial_rules: bool,
    max_new: int,
    cache_len: int,
    beam_size: int,
):
    k = beam_size
    p = prompt_len
    # exact generation cap rides in aux (static bound is bucket-quantized)
    total = jnp.minimum(jnp.int32(p + max_new),
                        jnp.int32(p) + aux[D.AUX_TOK + 4].astype(jnp.int32))
    ts0 = cfg.timestamp_begin
    vocab_ids = jnp.arange(cfg.n_vocab)
    initial_tokens = aux[:p].astype(jnp.int32)[None]
    n_prefix_arr = aux[D.AUX_TOK].astype(jnp.int32)
    sot_index_arr = aux[D.AUX_TOK + 1].astype(jnp.int32)
    last_ts0 = aux[D.AUX_TOK + 2].astype(jnp.int32)
    max_initial_index = round(opts.max_initial_timestamp / 0.02)

    cache1 = M.init_cache(params, cfg, xa, text_ctx=cache_len)
    pre_logits, cache1, _ = M.decode_span(params, cfg, initial_tokens, jnp.int32(0), cache1)
    sot_logits = jax.lax.dynamic_index_in_dim(pre_logits, sot_index_arr, axis=1, keepdims=False)
    no_speech_prob = jax.nn.softmax(sot_logits.astype(jnp.float32), -1)[0, cfg.no_speech]
    cache = M.DecoderCache(
        self_k=_tile_beams(cache1.self_k, k),
        self_v=_tile_beams(cache1.self_v, k),
        cross_k=_tile_beams(cache1.cross_k, k),
        cross_v=_tile_beams(cache1.cross_v, k),
    )
    tokens0 = jnp.tile(
        jnp.concatenate([initial_tokens, jnp.full((1, max_new), cfg.eot, jnp.int32)], axis=1),
        (k, 1),
    )
    # beam 0 starts live; others at -inf so the first expansion diversifies
    scores0 = jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), -1e9)]).astype(jnp.float32)

    def filters(logits, tokens, pos, last_ts):
        step = pos - p
        logits = logits + sup_mask[None, :]
        logits = logits.at[:, cfg.no_timestamps].set(-jnp.inf)
        if opts.suppress_blank and apply_initial_rules:
            blank = jnp.where(step == 0, -jnp.inf, 0.0)
            logits = logits.at[:, opts.blank_id].add(blank)
            logits = logits.at[:, cfg.eot].add(blank)
        if not opts.timestamps:
            return jnp.where((vocab_ids >= ts0)[None, :], -jnp.inf, logits)
        last = jax.lax.dynamic_index_in_dim(tokens, pos - 1, axis=1, keepdims=False)
        prev = jax.lax.dynamic_index_in_dim(tokens, pos - 2, axis=1, keepdims=False)
        hist1 = (step >= 1) | (n_prefix_arr > 0)
        hist2 = (step >= 2) | (n_prefix_arr > 1)
        last_was_ts = hist1 & (last >= ts0)
        prev_was_ts = (~hist2) | (prev >= ts0)
        is_ts = (vocab_ids >= ts0)[None, :]
        is_text = (vocab_ids < cfg.eot)[None, :]
        kill = (last_was_ts & prev_was_ts)[:, None] & is_ts
        kill |= (last_was_ts & ~prev_was_ts)[:, None] & is_text
        bound = jnp.where(last_was_ts & ~prev_was_ts, last_ts, last_ts + 1)
        kill |= (last_ts >= ts0)[:, None] & is_ts & (vocab_ids[None, :] < bound[:, None])
        if apply_initial_rules:
            first = (step == 0) & (n_prefix_arr == 0)
            kill |= first & (vocab_ids[None, :] < ts0)
            kill |= first & (vocab_ids[None, :] > ts0 + max_initial_index)
        logits = jnp.where(kill, -jnp.inf, logits)
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ts_lp = jax.nn.logsumexp(jnp.where(is_ts, logprobs, -jnp.inf), axis=-1)
        max_text_lp = jnp.max(jnp.where(is_ts, -jnp.inf, logprobs), axis=-1)
        force_ts = (ts_lp > max_text_lp)[:, None] & ~is_ts
        return jnp.where(force_ts, -jnp.inf, logits)

    def cond(state):
        tokens, pos, finished, cache, scores, last_ts = state
        return (~jnp.all(finished)) & (pos < total)

    def body(state):
        tokens, pos, finished, cache, scores, last_ts = state
        cur = jax.lax.dynamic_index_in_dim(tokens, pos - 1, axis=1, keepdims=False)
        logits, cache, _ = M.decode_step(params, cfg, cur, pos - 1, cache)
        flogits = filters(logits, tokens, pos, last_ts)
        logprobs = jax.nn.log_softmax(flogits.astype(jnp.float32), axis=-1)  # (K,V)
        # finished beams may only extend with EOT at zero cost
        eot_only = jnp.where((vocab_ids == cfg.eot)[None, :], 0.0, -jnp.inf)
        logprobs = jnp.where(finished[:, None], eot_only, logprobs)
        cand = scores[:, None] + logprobs  # (K, V)
        flat = cand.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat, k)
        parent = (top_idx // cfg.n_vocab).astype(jnp.int32)
        tok = (top_idx % cfg.n_vocab).astype(jnp.int32)
        # reorder beam state by parent
        tokens = tokens[parent]
        last_ts = last_ts[parent]
        finished = finished[parent]
        cache = M.DecoderCache(
            self_k=cache.self_k[:, parent],
            self_v=cache.self_v[:, parent],
            cross_k=cache.cross_k,
            cross_v=cache.cross_v,
        )
        tok = jnp.where(finished, cfg.eot, tok)
        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, tok[:, None], pos, axis=1)
        last_ts = jnp.where((tok >= ts0) & ~finished, tok, last_ts)
        finished = finished | (tok == cfg.eot)
        return (tokens, pos + 1, finished, cache, top_scores, last_ts)

    state = (
        tokens0,
        jnp.int32(p),
        jnp.zeros((k,), bool),
        cache,
        scores0,
        jnp.broadcast_to(last_ts0, (k,)),
    )
    tokens, pos, finished, cache, scores, last_ts = jax.lax.while_loop(cond, body, state)
    # length-penalized pick: score / length**penalty over sampled region.
    # +1 counts the EOT token only when one was actually sampled — a beam that
    # hits the loop bound has no EOT, and counting a phantom one would skew the
    # normalization between finished and unfinished beams (mirrors the greedy
    # path's first-EOT length computation, decode.py).
    sampled = tokens[:, p:]
    has_eot = jnp.any(sampled == cfg.eot, axis=1)
    lengths = (
        jnp.sum((jnp.cumsum(sampled == cfg.eot, axis=1) == 0).astype(jnp.int32), axis=1)
        + has_eot.astype(jnp.int32)
    )
    norm = scores / jnp.power(lengths.astype(jnp.float32), opts.length_penalty)
    best = jnp.argmax(norm)
    out = jnp.concatenate(
        [sampled[best].astype(jnp.float32), scores[best][None],
         lengths[best].astype(jnp.float32)[None], no_speech_prob[None]]
    )
    return out


def beam_decode(
    params,
    cfg: WhisperConfig,
    xa: jnp.ndarray,
    opts: D.DecodeOptions,
    prompt_tokens: Optional[list[int]] = None,
    prefix_tokens: Optional[list[int]] = None,
    extra_suppress: tuple[int, ...] = (),
    alignment_heads: Optional[np.ndarray] = None,
    aux_device: Optional[jnp.ndarray] = None,
) -> D.DecodeResult:
    """Beam search with the greedy API shape (batch 1)."""
    assert xa.shape[0] == 1, "beam decode is batch-1 (streaming/offline windows)"
    init, sot_index, n_prefix = D.build_initial_tokens(cfg, opts, prompt_tokens, prefix_tokens)
    prefix_arr = init[len(init) - n_prefix :] if n_prefix else np.zeros(0, np.int32)
    p = int(init.shape[0])
    max_new, max_new_cap = D.plan_decode_budget(cfg, opts, p, n_prefix)
    cache_len = min(cfg.n_text_ctx, D._round_up(p + max_new, 128))

    sup = D._sup_mask_dev(cfg, tuple(extra_suppress))
    if aux_device is None:
        ts_in_prefix = [int(t) for t in prefix_arr if t >= cfg.timestamp_begin]
        aux_device = jnp.asarray(
            D.pack_aux(init, n_prefix, sot_index, ts_in_prefix[-1] if ts_in_prefix else -1,
                       max_new_cap=max_new_cap)
        )

    out = np.asarray(
        _beam_loop(
            params, cfg, opts, xa, aux_device, sup,
            prompt_len=p,
            apply_initial_rules=(n_prefix == 0),
            max_new=max_new,
            cache_len=cache_len,
            beam_size=opts.beam_size,
        )
    )
    sampled = out[:max_new].astype(np.int32)
    score = float(out[max_new])
    n_sampled = int(out[max_new + 1])
    nsp = float(out[max_new + 2])

    full_tokens = np.concatenate([prefix_arr, sampled])[None]
    eots = np.nonzero(full_tokens[0] == cfg.eot)[0]
    length = int(eots[0] + 1) if eots.size else full_tokens.shape[1]

    xattn = None
    if opts.word_timestamps:
        # one capture pass over the winning sequence
        heads_key = (
            None if alignment_heads is None
            else np.ascontiguousarray(alignment_heads, np.float32).tobytes()
        )
        amask = D._amask_dev(cfg, heads_key)
        seq = full_tokens[0][:length]
        body = seq[:-1] if (len(seq) and seq[-1] == cfg.eot) else seq
        n_body = len(body)
        pad_to = D._round_up(max(n_body + p - n_prefix, 8), 64)
        cache = M.init_cache(params, cfg, xa, text_ctx=pad_to)
        span = np.full(pad_to, cfg.eot, np.int32)
        span[: p - n_prefix] = init[: p - n_prefix]
        span[p - n_prefix : p - n_prefix + n_body] = body
        _, _, cap = M.decode_span(
            params, cfg, jnp.asarray(span[None]), jnp.int32(0), cache, alignment_mask=amask
        )
        rows = np.asarray(cap.reshape(-1)).reshape(1, pad_to, xa.shape[1])
        xattn = rows[:, p - n_prefix : p - n_prefix + length]

    lengths = np.array([length], np.int64)
    return D.DecodeResult(
        tokens=full_tokens,
        lengths=lengths,
        sum_logprob=np.array([score]),
        avg_logprob=np.array([score / max(n_sampled, 1)]),
        no_speech_prob=np.array([nsp]),
        xattn=xattn,
    )
