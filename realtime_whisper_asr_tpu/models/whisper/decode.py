"""KV-cached autoregressive decoding with Whisper's logit-filter stack.

TPU-native replacement for CTranslate2's decode loop (the reference's hot
compute, `asr_components.py:267-289` → WhisperModel.transcribe): a single
jitted ``lax.while_loop`` with static shapes — prompt prefill via one
``decode_span`` pass, per-step logit filters (suppress lists, blank/EOT rules,
timestamp grammar incl. monotonicity + the timestamp-probability rule), greedy
or beam selection, early exit on EOT, and optional cross-attention capture for
DTW word timestamps.

Prompt lengths are bucketed (powers of two) so variable-length conditioning
text never retraces; audio is always encoded at the static 30 s window.
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
    timestamps: bool = True
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    blank_id: int = 220  # GPT2 " " token
    word_timestamps: bool = False
    length_penalty: float = 1.0


@dataclasses.dataclass
class DecodeResult:
    tokens: np.ndarray  # (B, ≤max_new) sampled token ids, EOT-trimmed per row by caller
    lengths: np.ndarray  # (B,) number of sampled tokens incl. EOT
    sum_logprob: np.ndarray  # (B,)
    avg_logprob: np.ndarray  # (B,)
    no_speech_prob: np.ndarray  # (B,)
    xattn: Optional[np.ndarray]  # (B, max_new, n_audio_ctx) or None


_PROMPT_BUCKETS = (4, 8, 16, 32, 64, 128, 256)


def bucket_prompt_len(n: int) -> int:
    for b in _PROMPT_BUCKETS:
        if n <= b:
            return b
    return _PROMPT_BUCKETS[-1]


def build_initial_tokens(
    cfg: WhisperConfig,
    opts: DecodeOptions,
    prompt_tokens: Optional[list[int]] = None,
) -> tuple[np.ndarray, int]:
    """[sot_prev + prompt?] + sot sequence, left-padded inside the prompt region
    to a bucketed length. Returns (tokens (P,), sot_index)."""
    sot_seq = list(cfg.sot_sequence(opts.language, opts.task, timestamps=opts.timestamps))
    if prompt_tokens:
        # keep the last n_text_ctx//2 - 1 prompt tokens, like the reference's
        # 300-char prompt carry (enhanced_asr_processor.py:295-341) in token space
        keep = prompt_tokens[-(cfg.n_text_ctx // 2 - 1) :]
        body = [cfg.sot_prev] + list(keep)
        target = bucket_prompt_len(len(body) + len(sot_seq)) - len(sot_seq)
        pad = target - len(body)
        # left-pad with blanks inside the conditioning region (harmless tokens)
        body = [cfg.sot_prev] + [220] * pad + list(keep)
        tokens = body + sot_seq
    else:
        tokens = sot_seq
    sot_index = len(tokens) - len(sot_seq)
    return np.asarray(tokens, np.int32), sot_index


def suppress_mask(
    cfg: WhisperConfig, extra_suppress: tuple[int, ...] = ()
) -> np.ndarray:
    """(n_vocab,) additive f32 mask: -inf at always-suppressed ids."""
    neg = np.float32(-np.inf)
    m = np.zeros((cfg.n_vocab,), np.float32)
    ids = {cfg.sot, cfg.sot_prev, cfg.sot_lm, cfg.no_speech, cfg.transcribe, cfg.translate}
    if cfg.is_multilingual:
        ids |= {cfg.sot + 1 + i for i in range(cfg.num_languages)}
    ids |= {int(i) for i in extra_suppress if 0 <= int(i) < cfg.n_vocab}
    m[sorted(ids)] = neg
    return m


@functools.partial(
    jax.jit, static_argnames=("cfg", "opts", "prompt_len", "sot_index", "capture_xattn")
)
def _greedy_loop(
    params,
    cfg: WhisperConfig,
    opts: DecodeOptions,
    xa: jnp.ndarray,  # (B, n_audio_ctx, d)
    initial_tokens: jnp.ndarray,  # (B, P)
    sup_mask: jnp.ndarray,  # (n_vocab,) additive
    alignment_mask: jnp.ndarray,  # (L, H)
    prompt_len: int,
    sot_index: int,
    capture_xattn: bool,
):
    b = xa.shape[0]
    p = prompt_len
    max_new = min(opts.max_new_tokens, cfg.n_text_ctx - p)
    total = p + max_new
    ts0 = cfg.timestamp_begin
    vocab_ids = jnp.arange(cfg.n_vocab)

    cache = M.init_cache(params, cfg, xa)
    pre_logits, cache = M.decode_span(params, cfg, initial_tokens, jnp.int32(0), cache)
    no_speech_prob = jax.nn.softmax(pre_logits[:, sot_index].astype(jnp.float32), -1)[
        :, cfg.no_speech
    ]

    tokens0 = jnp.concatenate(
        [initial_tokens, jnp.full((b, max_new), cfg.eot, jnp.int32)], axis=1
    )
    xattn0 = jnp.zeros((b, max_new if capture_xattn else 1, cfg.n_audio_ctx), jnp.float32)

    max_initial_index = round(opts.max_initial_timestamp / 0.02)

    def filters(logits, tokens, pos, last_ts):
        """All Whisper logit rules, batched. pos = absolute position being filled."""
        step = pos - p  # 0-based sampled index
        logits = logits + sup_mask[None, :]
        logits = logits.at[:, cfg.no_timestamps].set(-jnp.inf)
        if opts.suppress_blank:
            blank = jnp.where(step == 0, -jnp.inf, 0.0)
            logits = logits.at[:, opts.blank_id].add(blank)
            logits = logits.at[:, cfg.eot].add(blank)
        if not opts.timestamps:
            is_ts = (vocab_ids >= ts0)[None, :]
            return jnp.where(is_ts, -jnp.inf, logits), last_ts

        last = tokens[:, pos - 1]
        prev = tokens[:, pos - 2]
        last_was_ts = (step >= 1) & (last >= ts0)
        prev_was_ts = (step < 2) | (prev >= ts0)
        is_ts = (vocab_ids >= ts0)[None, :]
        is_text = (vocab_ids < cfg.eot)[None, :]
        # pair grammar
        kill_ts = (last_was_ts & prev_was_ts)[:, None] & is_ts
        kill_text = (last_was_ts & ~prev_was_ts)[:, None] & is_text
        # monotonic timestamps: suppress [ts0, bound)
        bound = jnp.where(last_was_ts & ~prev_was_ts, last_ts, last_ts + 1)
        has_ts = last_ts >= ts0
        kill_mono = (has_ts[:, None]) & is_ts & (vocab_ids[None, :] < bound[:, None])
        # initial step: force a timestamp, cap it at max_initial_timestamp
        init = step == 0
        kill_init_text = init & is_ts.__invert__() & (vocab_ids[None, :] < ts0)
        kill_init_late = init & (vocab_ids[None, :] > ts0 + max_initial_index)
        kill = kill_ts | kill_text | kill_mono | kill_init_text | kill_init_late
        logits = jnp.where(kill, -jnp.inf, logits)
        # timestamp-probability rule
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ts_lp = jax.lax.stop_gradient(
            jax.nn.logsumexp(jnp.where(is_ts, logprobs, -jnp.inf), axis=-1)
        )
        max_text_lp = jnp.max(jnp.where(is_ts, -jnp.inf, logprobs), axis=-1)
        force_ts = (ts_lp > max_text_lp)[:, None] & ~is_ts
        logits = jnp.where(force_ts, -jnp.inf, logits)
        return logits, last_ts

    def cond(state):
        tokens, pos, finished, cache, sum_lp, last_ts, xattn = state
        return (~jnp.all(finished)) & (pos < total)

    def body(state):
        tokens, pos, finished, cache, sum_lp, last_ts, xattn = state
        cur = jax.lax.dynamic_index_in_dim(tokens, pos - 1, axis=1, keepdims=False)
        logits, cache, xw = M.decode_step(
            params,
            cfg,
            cur,
            pos - 1,
            cache,
            alignment_mask=alignment_mask if capture_xattn else None,
        )
        flogits, _ = filters(logits, tokens, pos, last_ts)
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

    state = (
        tokens0,
        jnp.int32(p),
        jnp.zeros((b,), bool),
        cache,
        jnp.zeros((b,), jnp.float32),
        jnp.full((b,), -1, jnp.int32),
        xattn0,
    )
    tokens, pos, finished, cache, sum_lp, last_ts, xattn = jax.lax.while_loop(cond, body, state)
    return tokens[:, p:], pos - p, sum_lp, no_speech_prob, xattn


def greedy_decode(
    params,
    cfg: WhisperConfig,
    xa: jnp.ndarray,
    opts: DecodeOptions,
    prompt_tokens: Optional[list[int]] = None,
    extra_suppress: tuple[int, ...] = (),
    alignment_heads: Optional[np.ndarray] = None,
) -> DecodeResult:
    """Host wrapper: builds initial tokens/masks, runs the jitted loop."""
    init, sot_index = build_initial_tokens(cfg, opts, prompt_tokens)
    b = xa.shape[0]
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

    tokens, n, sum_lp, nsp, xattn = _greedy_loop(
        params,
        cfg,
        opts,
        xa,
        init_b,
        sup,
        jnp.asarray(amask),
        prompt_len=int(init.shape[0]),
        sot_index=sot_index,
        capture_xattn=capture,
    )
    from realtime_whisper_asr_tpu.utils.transfer import device_get

    tokens = device_get(tokens)
    # per-row true length = position of first EOT (+1)
    lengths = np.zeros((b,), np.int64)
    for i in range(b):
        eots = np.nonzero(tokens[i] == cfg.eot)[0]
        lengths[i] = (eots[0] + 1) if eots.size else tokens.shape[1]
    sum_lp = device_get(sum_lp)
    return DecodeResult(
        tokens=tokens,
        lengths=lengths,
        sum_logprob=sum_lp,
        avg_logprob=sum_lp / np.maximum(lengths, 1),
        no_speech_prob=device_get(nsp),
        xattn=device_get(xattn) if capture else None,
    )
