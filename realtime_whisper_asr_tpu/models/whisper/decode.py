"""KV-cached autoregressive decoding with Whisper's logit-filter stack.

TPU-native replacement for CTranslate2's decode loop (the reference's hot
compute, `asr_components.py:267-289` → WhisperModel.transcribe): a single
jitted ``lax.while_loop`` with static shapes — prompt prefill via one
``decode_span`` pass, per-step logit filters (suppress lists, blank/EOT rules,
timestamp grammar incl. monotonicity + the timestamp-probability rule), greedy
selection, early exit on EOT, and optional cross-attention capture for DTW
word timestamps.

Incremental streaming decode: the online processor passes the token prefix
that the last two hypotheses agreed on (``prefix_tokens``); it is absorbed in
the prefill pass (with cross-attention captured for its word times) and only
the new tail is generated step-by-step — this is what turns the ~0.5 s-cadence
full re-transcription of the reference stack into a handful of decode steps
per tick (SURVEY.md §7 "hard parts": prefill reuse + incremental decode).

Static-shape discipline: prefill lengths are bucketed (powers of two, padding
inside the prompt region), the self-attention cache is sized to the actual
decode budget, and audio context follows the encoder window bucket — so a
steady-state stream triggers zero retraces.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from realtime_whisper_asr_tpu.models.whisper import model as M
from realtime_whisper_asr_tpu.models.whisper.config import WhisperConfig


@dataclasses.dataclass(frozen=True)
class DecodeOptions:
    """Static decoding options (hashable; part of the jit key)."""

    task: str = "transcribe"
    language: Optional[str] = "en"
    beam_size: int = 1
    max_new_tokens: int = 224
    max_total_tokens: Optional[int] = None  # cap on prefix+generated transcript length
    timestamps: bool = True
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    blank_id: int = 220  # GPT2 " " token
    word_timestamps: bool = False
    length_penalty: float = 1.0


@dataclasses.dataclass
class DecodeResult:
    tokens: np.ndarray  # (B, n_prefix + ≤max_new) prefix + sampled ids
    lengths: np.ndarray  # (B,) valid length incl. EOT
    sum_logprob: np.ndarray  # (B,) over sampled tokens
    avg_logprob: np.ndarray  # (B,)
    no_speech_prob: np.ndarray  # (B,)
    xattn: Optional[np.ndarray]  # (B, n_prefix + ≤max_new, audio_ctx) or None


_PROMPT_BUCKETS = (8, 16, 32, 64, 128, 192, 256)


def _bucket(n: int) -> int:
    for b in _PROMPT_BUCKETS:
        if n <= b:
            return b
    return _PROMPT_BUCKETS[-1]


def build_initial_tokens(
    cfg: WhisperConfig,
    opts: DecodeOptions,
    prompt_tokens: Optional[list[int]] = None,
    prefix_tokens: Optional[list[int]] = None,
) -> tuple[np.ndarray, int, int]:
    """[pad+prompt?] + sot_seq + prefix?, bucketed. -> (tokens, sot_index, n_prefix).

    The bucket padding lives INSIDE the conditioning region ([sot_prev] +
    blanks), which Whisper treats as prior context — blank padding there is
    semantically inert, unlike padding the forced prefix would be.
    """
    sot_seq = list(cfg.sot_sequence(opts.language, opts.task, timestamps=opts.timestamps))
    prefix = list(prefix_tokens or [])
    prompt = list(prompt_tokens or [])
    if prompt:
        prompt = prompt[-(cfg.n_text_ctx // 2 - 1) :]
    if not prompt and not prefix:
        tokens = sot_seq
        return np.asarray(tokens, np.int32), 0, 0
    # reserve space: [sot_prev] + pad + prompt + sot_seq + prefix
    base = 1 + len(prompt) + len(sot_seq) + len(prefix)
    target = _bucket(base)
    max_p = cfg.n_text_ctx - 64  # leave generation room
    if target > max_p:
        # shed prefix first (keep its tail), then prompt
        overflow = target - max_p
        prefix = prefix[: max(0, len(prefix) - overflow)]
        base = 1 + len(prompt) + len(sot_seq) + len(prefix)
        target = _bucket(base)
    pad = target - base
    tokens = [cfg.sot_prev] + [opts.blank_id] * pad + prompt + sot_seq + prefix
    sot_index = len(tokens) - len(prefix) - len(sot_seq)
    return np.asarray(tokens, np.int32), sot_index, len(prefix)


def suppress_mask(cfg: WhisperConfig, extra_suppress: tuple[int, ...] = ()) -> np.ndarray:
    """(n_vocab,) additive f32 mask: -inf at always-suppressed ids."""
    m = np.zeros((cfg.n_vocab,), np.float32)
    ids = {cfg.sot, cfg.sot_prev, cfg.sot_lm, cfg.no_speech, cfg.transcribe, cfg.translate}
    if cfg.is_multilingual:
        ids |= {cfg.sot + 1 + i for i in range(cfg.num_languages)}
    ids |= {int(i) for i in extra_suppress if 0 <= int(i) < cfg.n_vocab}
    m[sorted(ids)] = -np.inf
    return m


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "opts", "prompt_len", "sot_index", "capture_xattn",
                     "apply_initial_rules", "max_new", "cache_len"),
)
def _greedy_loop(
    params,
    cfg: WhisperConfig,
    opts: DecodeOptions,
    xa: jnp.ndarray,  # (B, audio_ctx, d)
    initial_tokens: jnp.ndarray,  # (B, P)
    sup_mask: jnp.ndarray,  # (n_vocab,) additive
    alignment_mask: jnp.ndarray,  # (L, H)
    last_ts_init: jnp.ndarray,  # (B,) int32: last timestamp token in prefix, or -1
    n_prefix_arr: jnp.ndarray,  # scalar int32: forced-prefix length (grammar history)
    prompt_len: int,
    sot_index: int,
    capture_xattn: bool,
    apply_initial_rules: bool,
    max_new: int,
    cache_len: int,
):
    b = xa.shape[0]
    p = prompt_len
    total = p + max_new
    ts0 = cfg.timestamp_begin
    vocab_ids = jnp.arange(cfg.n_vocab)
    audio_ctx = xa.shape[1]

    cache = M.init_cache(params, cfg, xa, text_ctx=cache_len)
    amask = alignment_mask if capture_xattn else None
    pre_logits, cache, pre_xattn = M.decode_span(
        params, cfg, initial_tokens, jnp.int32(0), cache, alignment_mask=amask
    )
    no_speech_prob = jax.nn.softmax(pre_logits[:, sot_index].astype(jnp.float32), -1)[
        :, cfg.no_speech
    ]

    tokens0 = jnp.concatenate(
        [initial_tokens, jnp.full((b, max_new), cfg.eot, jnp.int32)], axis=1
    )
    xattn0 = jnp.zeros((b, max_new if capture_xattn else 1, audio_ctx), jnp.float32)
    max_initial_index = round(opts.max_initial_timestamp / 0.02)

    def body(state):
        tokens, pos, finished, cache, sum_lp, last_ts, xattn = state
        cur = jax.lax.dynamic_index_in_dim(tokens, pos - 1, axis=1, keepdims=False)
        logits, cache, xw = M.decode_step(
            params, cfg, cur, pos - 1, cache,
            alignment_mask=alignment_mask if capture_xattn else None,
        )
        step = pos - p
        flogits = logits + sup_mask[None, :]
        flogits = flogits.at[:, cfg.no_timestamps].set(-jnp.inf)
        if opts.suppress_blank and apply_initial_rules:
            blank = jnp.where(step == 0, -jnp.inf, 0.0)
            flogits = flogits.at[:, opts.blank_id].add(blank)
            flogits = flogits.at[:, cfg.eot].add(blank)
        if opts.timestamps:
            last = jax.lax.dynamic_index_in_dim(tokens, pos - 1, axis=1, keepdims=False)
            prev = jax.lax.dynamic_index_in_dim(tokens, pos - 2, axis=1, keepdims=False)
            # prefix tokens count as stream history (they ARE transcript)
            hist1 = (step >= 1) | (n_prefix_arr > 0)
            hist2 = (step >= 2) | (n_prefix_arr > 1)
            last_was_ts = hist1 & (last >= ts0)
            prev_was_ts = (~hist2) | (prev >= ts0)
            is_ts = (vocab_ids >= ts0)[None, :]
            is_text = (vocab_ids < cfg.eot)[None, :]
            kill_ts = (last_was_ts & prev_was_ts)[:, None] & is_ts
            kill_text = (last_was_ts & ~prev_was_ts)[:, None] & is_text
            bound = jnp.where(last_was_ts & ~prev_was_ts, last_ts, last_ts + 1)
            has_ts = last_ts >= ts0
            kill_mono = has_ts[:, None] & is_ts & (vocab_ids[None, :] < bound[:, None])
            first = (step == 0) & (n_prefix_arr == 0)
            if apply_initial_rules:
                kill_init_text = first & (vocab_ids[None, :] < ts0)
                kill_init_late = first & (vocab_ids[None, :] > ts0 + max_initial_index)
            else:
                kill_init_text = jnp.zeros((), bool)
                kill_init_late = jnp.zeros((), bool)
            kill = kill_ts | kill_text | kill_mono | kill_init_text | kill_init_late
            flogits = jnp.where(kill, -jnp.inf, flogits)
            logprobs = jax.nn.log_softmax(flogits.astype(jnp.float32), axis=-1)
            ts_lp = jax.nn.logsumexp(jnp.where(is_ts, logprobs, -jnp.inf), axis=-1)
            max_text_lp = jnp.max(jnp.where(is_ts, -jnp.inf, logprobs), axis=-1)
            force_ts = (ts_lp > max_text_lp)[:, None] & ~is_ts
            flogits = jnp.where(force_ts, -jnp.inf, flogits)
        else:
            is_ts = (vocab_ids >= ts0)[None, :]
            flogits = jnp.where(is_ts, -jnp.inf, flogits)

        nxt = jnp.argmax(flogits, axis=-1).astype(jnp.int32)
        logprobs = jax.nn.log_softmax(flogits.astype(jnp.float32), axis=-1)
        lp = jnp.take_along_axis(logprobs, nxt[:, None], axis=1)[:, 0]
        nxt = jnp.where(finished, cfg.eot, nxt)
        sum_lp = sum_lp + jnp.where(finished, 0.0, lp)
        last_ts = jnp.where((nxt >= ts0) & ~finished, nxt, last_ts)
        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, nxt[:, None], pos, axis=1)
        if capture_xattn:
            xattn = jax.lax.dynamic_update_slice_in_dim(
                xattn, xw[:, None, :].astype(jnp.float32), pos - p, axis=1
            )
        finished = finished | (nxt == cfg.eot)
        return (tokens, pos + 1, finished, cache, sum_lp, last_ts, xattn)

    def cond(state):
        tokens, pos, finished, cache, sum_lp, last_ts, xattn = state
        return (~jnp.all(finished)) & (pos < total)

    state = (
        tokens0,
        jnp.int32(p),
        jnp.zeros((b,), bool),
        cache,
        jnp.zeros((b,), jnp.float32),
        last_ts_init,
        xattn0,
    )
    tokens, pos, finished, cache, sum_lp, last_ts, xattn = jax.lax.while_loop(cond, body, state)
    return tokens[:, p:], pos - p, sum_lp, no_speech_prob, xattn, pre_xattn


def greedy_decode(
    params,
    cfg: WhisperConfig,
    xa: jnp.ndarray,
    opts: DecodeOptions,
    prompt_tokens: Optional[list[int]] = None,
    prefix_tokens: Optional[list[int]] = None,
    extra_suppress: tuple[int, ...] = (),
    alignment_heads: Optional[np.ndarray] = None,
) -> DecodeResult:
    """Host wrapper: builds initial tokens/masks, runs the jitted loop.

    Returns tokens = prefix + sampled (xattn rows aligned), so callers parse
    one transcript regardless of how much was forced.
    """
    from realtime_whisper_asr_tpu.utils.transfer import device_get

    init, sot_index, n_prefix = build_initial_tokens(cfg, opts, prompt_tokens, prefix_tokens)
    prefix_arr = init[len(init) - n_prefix :] if n_prefix else np.zeros(0, np.int32)
    b = xa.shape[0]
    p = int(init.shape[0])
    budget = cfg.n_text_ctx - p
    max_new = min(opts.max_new_tokens, budget)
    if opts.max_total_tokens is not None:
        max_new = max(min(max_new, opts.max_total_tokens - n_prefix), 1)
    # quantize the STATIC loop bound to a few trace variants (early EOT exit
    # makes the runtime proportional to actual steps, not the bound)
    for q in (16, 48, 96, 224):
        if max_new <= q:
            max_new = q
            break
    else:
        max_new = 224
    max_new = min(max_new, budget)
    cache_len = min(cfg.n_text_ctx, _round_up(p + max_new, 128))

    init_b = jnp.asarray(np.tile(init[None, :], (b, 1)))
    sup = jnp.asarray(suppress_mask(cfg, extra_suppress))
    capture = opts.word_timestamps
    if alignment_heads is None:
        amask = np.zeros((cfg.n_text_layer, cfg.n_text_head), np.float32)
        amask[cfg.n_text_layer // 2 :] = 1.0  # default: top-half heads
        amask /= amask.sum()
    else:
        amask = alignment_heads.astype(np.float32)
        amask = amask / max(amask.sum(), 1e-6)
    ts_in_prefix = [int(t) for t in prefix_arr if t >= cfg.timestamp_begin]
    last_ts_init = jnp.full((b,), ts_in_prefix[-1] if ts_in_prefix else -1, jnp.int32)

    tokens, n, sum_lp, nsp, xattn, pre_xattn = _greedy_loop(
        params,
        cfg,
        opts,
        xa,
        init_b,
        sup,
        jnp.asarray(amask),
        last_ts_init,
        jnp.int32(n_prefix),
        prompt_len=p,
        sot_index=sot_index,
        capture_xattn=capture,
        apply_initial_rules=(n_prefix == 0),
        max_new=max_new,
        cache_len=cache_len,
    )
    tokens = device_get(tokens)
    full_tokens = np.concatenate([np.tile(prefix_arr[None], (b, 1)), tokens], axis=1)
    lengths = np.zeros((b,), np.int64)
    for i in range(b):
        eots = np.nonzero(full_tokens[i] == cfg.eot)[0]
        lengths[i] = (eots[0] + 1) if eots.size else full_tokens.shape[1]
    sum_lp = device_get(sum_lp)
    xattn_full = None
    if capture:
        xattn_gen = device_get(xattn)
        if n_prefix:
            xattn_pre = device_get(pre_xattn)[:, p - n_prefix : p, :]
            xattn_full = np.concatenate([xattn_pre, xattn_gen], axis=1)
        else:
            xattn_full = xattn_gen
    return DecodeResult(
        tokens=full_tokens,
        lengths=lengths,
        sum_logprob=sum_lp,
        avg_logprob=sum_lp / np.maximum(lengths - n_prefix, 1),
        no_speech_prob=device_get(nsp),
        xattn=xattn_full,
    )
