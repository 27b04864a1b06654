"""Pure-JAX Whisper encoder-decoder.

TPU-first re-design of the inference core the reference outsources to
CTranslate2 (reference `asr_components.py:232-265`) and PyTorch whisper
(`一键实时识别麦克风.py:1094-1111`):

- functional params-as-pytree design; every entry point jits cleanly,
- per-layer weights are STACKED along a leading layer axis and applied with
  ``lax.scan`` — one compiled block body regardless of depth (large-v3's 32
  layers compile as fast as tiny's 4),
- static shapes throughout: mel input is (B, 2*n_audio_ctx, n_mels); the
  decoder KV cache is a fixed (L, B, n_text_ctx, H, Dh) buffer written at a
  dynamic position,
- f32 layernorm/softmax islands inside a configurable compute dtype (bf16 on
  TPU), matmuls with ``preferred_element_type=f32`` for MXU accuracy,
- cross-attention K/V precomputed once per encoded window (the basis of
  streaming prefill reuse) and cross-attention pattern capture for DTW word
  timestamps (timestamps.py).

Weight layout convention: linear weights are (in, out) so application is
``x @ w`` (lane-contiguous on TPU); conv weights are (k, in, out).
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from realtime_whisper_asr_tpu.models.whisper.config import WhisperConfig

Params = dict[str, Any]

#: Megatron-style sequence parallelism: when set (a NamedSharding over
#: (B, T, D) with the SEQUENCE dim on the tensor-parallel mesh axis, e.g.
#: P("data", "model", None)), every transformer-block carry in
#: ``encode``/``decode_full`` is constrained to it. The layernorm/residual
#: regions then hold only T/tp of the activations per device and XLA lowers
#: the TP boundary psums into reduce-scatter + all-gather pairs (same bytes
#: on ICI, 1/tp the activation HBM). Trace-time only — None (the default)
#: adds nothing to the compiled program. Inference entry points ignore it
#: (the KV-cached decode carries (B, 1, D) activations; nothing to shard).
_ACT_SHARDING = None


@contextlib.contextmanager
def activation_sharding(sharding):
    """Scope under which encode/decode_full sequence-shard their per-layer
    activations (see _ACT_SHARDING). Pass a ``NamedSharding`` whose spec puts
    the sequence axis on the mesh's model axis; nest-safe."""
    global _ACT_SHARDING
    prev = _ACT_SHARDING
    _ACT_SHARDING = sharding
    try:
        yield
    finally:
        _ACT_SHARDING = prev


def _constrain_act(x: jnp.ndarray) -> jnp.ndarray:
    if _ACT_SHARDING is None:
        return x
    return jax.lax.with_sharding_constraint(x, _ACT_SHARDING)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    """x @ w (+ b). ``w`` is a dense array, an int8 quantized dict
    {"q": int8 (in,out), "s": f32 (out,)}, or a nibble-packed int4-g128 dict
    {"q": int8 (in/2,out), "s": f32 (G,out)} (quant.quantize_decoder_int4;
    detected by the grouped scales' rank — S4 dtypes cannot ride as jit args
    on the axon backend). Both quantized paths dynamically int8-quantize the
    activations (per-row absmax) and run native integer MXU dots — measured
    at the bf16 roofline with HALF the weight HBM traffic for int8 (a
    dequant-then-dot formulation is 2.5× slower: XLA materializes the
    converted matrix). The int4 path bitcasts the packed bytes to S4 pairs
    in-program (a free reinterpretation: trailing dim 2 = [low, high] nibble
    = input rows 2i/2i+1) and dots per 128-input-row group with the group's
    scale applied to the int32 partials — each group is exactly one MXU
    K-tile, so the grouped pair-contraction tiles like the flat dot. Measured
    v5e step time: parity with int8 (XLA materializes the S4→S8 convert);
    the win is residency — half the int8 path's HBM footprint."""
    if isinstance(w, dict):
        x32 = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
        if w["s"].ndim == w["q"].ndim:
            lead = x.shape[:-1]
            half, dout = w["q"].shape
            g = w["s"].shape[0]
            xq2 = xq.reshape(-1, 2 * half)
            from realtime_whisper_asr_tpu.ops.int4_matmul import (
                int4_matmul,
                use_pallas_int4,
            )

            if use_pallas_int4(xq2.shape[0], half, dout, g):
                # Pallas path: streams the PACKED bytes HBM→VMEM and unpacks
                # at the MXU's doorstep — true 4-bit weight traffic. The XLA
                # formulation below materializes the S4→S8 convert in HBM
                # (measured: step-time parity with int8), so decode-sized M
                # on TPU takes the kernel.
                y = int4_matmul(xq2, w["q"], w["s"].astype(jnp.float32))
            else:
                w4 = jax.lax.bitcast_convert_type(w["q"], jnp.int4)  # (in/2,out,2)
                wg = w4.reshape(g, half // g, dout, 2)  # (G, k/2, out, 2)
                xg = xq2.reshape(-1, g, half // g, 2)  # (M, G, k/2, 2)
                p = jax.lax.dot_general(
                    xg, wg, (((2, 3), (1, 3)), ((1,), (0,))),
                    preferred_element_type=jnp.int32,
                )  # (G, M, out) int32 partials
                y = (p.astype(jnp.float32) * w["s"].astype(jnp.float32)[:, None, :]).sum(0)
            y = (y * sx.reshape(-1, 1)).reshape(*lead, dout).astype(x.dtype)
        else:
            y = jax.lax.dot_general(
                xq, w["q"], (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * sx * w["s"].astype(jnp.float32)).astype(x.dtype)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _emb_rows(emb, tokens):
    """Token-embedding gather; ``emb`` dense (V,d) or int8 dict
    {"q": int8 (V,d), "s": f32 (V,)} (per-vocab-row scales)."""
    if isinstance(emb, dict):
        return emb["q"][tokens].astype(jnp.float32) * emb["s"][tokens][..., None]
    return emb[tokens]


def _logits_head(x: jnp.ndarray, emb) -> jnp.ndarray:
    """x @ tok_emb.T -> f32 logits (tied output head). The int8 path halves
    the head's HBM read (133→67 MB/step at large-v3) with the same dynamic
    activation quantization as _linear; per-vocab-row weight scales keep the
    relative logit error ~0.4%, far under softmax decision margins."""
    if isinstance(emb, dict):
        x32 = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, emb["q"], (((xq.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return y.astype(jnp.float32) * sx * emb["s"].astype(jnp.float32)
    return jnp.dot(x, emb.astype(x.dtype).T, preferred_element_type=jnp.float32)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)  # (B,H,T,Dh)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
):
    """q,k,v: (B,H,Tq,Dh)/(B,H,Tk,Dh). Softmax in f32. mask: additive, broadcastable.

    KV with batch 1 against B>1 queries is SHARED (read once, not tiled): the
    beam decoder's cross-attention KV is identical across the K beam rows, and
    tiling it K× made every beam step stream K copies of the ~131 MB cross
    block from HBM (beam.py keeps cross at batch 1; self KV stays per-beam)."""
    scale = q.shape[-1] ** -0.5
    if k.shape[0] == 1 and q.shape[0] != 1:
        scores = jnp.einsum("bhqd,ohkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if mask is not None:
            scores = scores + mask
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,ohkd->bhqd", w.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return (out, w) if return_weights else (out, None)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out = out.astype(v.dtype)
    return (out, w) if return_weights else (out, None)


def _quantize_kv_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., T, Dh) → (int8 rows, f32 per-row scales (..., T, 1))."""
    x32 = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


_BHQD_BHKD = (((3,), (3,)), ((0, 1), (0, 1)))  # contract Dh, batch (B,H)
_BHQK_BHKD = (((3,), (2,)), ((0, 1), (0, 1)))  # contract Tk, batch (B,H)


def _attend_q8(
    q: jnp.ndarray,  # (B,H,Tq,Dh) compute dtype
    k8: jnp.ndarray,  # (B,H,Tk,Dh) int8
    v8: jnp.ndarray,  # (B,H,Tk,Dh) int8
    ks: jnp.ndarray,  # (B,H,Tk,1) f32 per-row key scales
    vs: jnp.ndarray,  # (B,H,Tk,1) f32 per-row value scales
    mask: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
    out_dtype=jnp.bfloat16,
):
    """Attention against int8-quantized KV rows — halves the per-step KV HBM
    read (the decode step is bandwidth-bound; the cross-KV block alone is
    ~260 MB/step at large-v3's 16 s window). Both MXU dots run native
    int8×int8 with dynamically quantized left operands (same recipe as
    _linear — a dequantize-then-dot formulation materializes the converted
    matrix and loses the bandwidth win). Per-row scales factor out of the
    contractions exactly; softmax stays f32."""
    scale = q.shape[-1] ** -0.5
    sq = jnp.maximum(
        jnp.max(jnp.abs(q.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    q8 = jnp.clip(jnp.round(q.astype(jnp.float32) / sq), -127, 127).astype(jnp.int8)
    shared_kv = k8.shape[0] == 1 and q.shape[0] != 1  # see _attend: beam cross KV
    if shared_kv:
        scores = jnp.einsum("bhqd,ohkd->bhqk", q8, k8, preferred_element_type=jnp.int32)
    else:
        scores = jax.lax.dot_general(q8, k8, _BHQD_BHKD, preferred_element_type=jnp.int32)
    scores = scores.astype(jnp.float32) * sq * jnp.swapaxes(ks, -1, -2) * scale
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1)  # (B,H,Tq,Tk) f32
    # fold the per-row value scales into the probabilities, then one int8 dot
    wv = w * jnp.swapaxes(vs, -1, -2)
    sw = jnp.maximum(jnp.max(wv, axis=-1, keepdims=True) / 127.0, 1e-12)
    w8 = jnp.clip(jnp.round(wv / sw), -127, 127).astype(jnp.int8)
    if shared_kv:
        out = jnp.einsum("bhqk,ohkd->bhqd", w8, v8, preferred_element_type=jnp.int32)
    else:
        out = jax.lax.dot_general(w8, v8, _BHQK_BHKD, preferred_element_type=jnp.int32)
    out = (out.astype(jnp.float32) * sw).astype(out_dtype)
    return (out, w) if return_weights else (out, None)


def _attend_beam(
    q: jnp.ndarray,  # (K, H, 1, Dh) per-beam queries
    kc: jnp.ndarray,  # (K, H, T, Dh) PHYSICAL cache rows (never reordered)
    vc: jnp.ndarray,  # (K, H, T, Dh)
    anc: jnp.ndarray,  # (K, K, T) 0/1 ancestry: anc[b,j,t]=1 iff position t of
    #                    beam b's history lives in physical row j
    mask: jnp.ndarray,  # additive (1, 1, 1, T)
):
    """Beam self-attention with ancestry selection instead of cache reorder.

    The classic beam step reorders the whole self-KV cache by parent every
    expansion — 2.22 ms/step at large-v3 K=5 ctx=256 even as a one-hot MXU
    contraction (beam._reorder_rows), i.e. most of the 6.6 ms beam token.
    Attention already streams every (row, t) of the cache each step, so
    selecting a beam's ancestor rows INSIDE the contraction (paged-attention
    style: physical rows + a tiny block table) costs only O(K²·T·Dh) extra
    MXU flops and removes the 2× cache rewrite entirely.

    Numerics: scores are the same whole-row dot products (selection happens
    after the Dh contraction), and the value sum adds the same nonzero terms
    plus exact zeros — bit-differences vs the reorder path are limited to
    f32 reduction-order noise.
    """
    scale = q.shape[-1] ** -0.5
    q2 = q[:, :, 0, :]  # (K, H, Dh)
    s_all = jnp.einsum("bhd,jhtd->bjht", q2, kc,
                       preferred_element_type=jnp.float32) * scale
    anc_f = anc.astype(jnp.float32)
    scores = jnp.einsum("bjht,bjt->bht", s_all, anc_f)
    scores = scores + mask[:, :, 0, :]  # (1,1,T) broadcast over (K,H,T)
    w = jax.nn.softmax(scores, axis=-1)  # (K, H, T) f32
    w2 = (w[:, None, :, :] * anc_f[:, :, None, :]).astype(vc.dtype)  # (K,J,H,T)
    out = jnp.einsum("bjht,jhtd->bhd", w2, vc,
                     preferred_element_type=jnp.float32)
    return out.astype(vc.dtype)[:, :, None, :]  # (K, H, 1, Dh)


def _attend_beam_q8(
    q: jnp.ndarray,  # (K, H, 1, Dh) compute dtype
    k8: jnp.ndarray,  # (K, H, T, Dh) int8 physical rows
    v8: jnp.ndarray,  # (K, H, T, Dh) int8
    ks: jnp.ndarray,  # (K, H, T, 1) f32 per-row key scales
    vs: jnp.ndarray,  # (K, H, T, 1) f32 per-row value scales
    anc: jnp.ndarray,  # (K, K, T) ancestry (see _attend_beam)
    mask: jnp.ndarray,  # additive (1, 1, 1, T)
    out_dtype=jnp.bfloat16,
):
    """int8-KV variant of _attend_beam (same recipe as _attend_q8: both dots
    native int8×int8, per-row scales factored out exactly, softmax f32)."""
    scale = q.shape[-1] ** -0.5
    q32 = q[:, :, 0, :].astype(jnp.float32)  # (K, H, Dh)
    sq = jnp.maximum(jnp.max(jnp.abs(q32), axis=-1, keepdims=True) / 127.0, 1e-12)
    q8 = jnp.clip(jnp.round(q32 / sq), -127, 127).astype(jnp.int8)
    s_all = jnp.einsum("bhd,jhtd->bjht", q8, k8, preferred_element_type=jnp.int32)
    s_all = s_all.astype(jnp.float32) * sq[:, None, :, :] * ks[None, :, :, :, 0] * scale
    anc_f = anc.astype(jnp.float32)
    scores = jnp.einsum("bjht,bjt->bht", s_all, anc_f)
    scores = scores + mask[:, :, 0, :]
    w = jax.nn.softmax(scores, axis=-1)  # (K, H, T)
    wv = w[:, None, :, :] * anc_f[:, :, None, :] * vs[None, :, :, :, 0]  # (K,J,H,T)
    sw = jnp.maximum(jnp.max(wv, axis=(1, 3), keepdims=True) / 127.0, 1e-12)  # (K,1,H,1)
    w8 = jnp.clip(jnp.round(wv / sw), -127, 127).astype(jnp.int8)
    out = jnp.einsum("bjht,jhtd->bhd", w8, v8, preferred_element_type=jnp.int32)
    out = (out.astype(jnp.float32) * sw[:, 0, :, :]).astype(out_dtype)
    return out[:, :, None, :]


def _self_qkv(attn: Params, h: jnp.ndarray, n_head: int):
    """Self-attention projections; uses the fused wqkv weight when present
    (quant.fuse_qkv) — one matmul instead of three on the latency-bound
    batch-1 decode step."""
    if "wqkv" in attn:
        qkv = _linear(h, attn["wqkv"], attn["bqkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = _linear(h, attn["wq"], attn["bq"])
        k = _linear(h, attn["wk"], None)
        v = _linear(h, attn["wv"], attn["bv"])
    return (
        _split_heads(q, n_head),
        _split_heads(k, n_head),
        _split_heads(v, n_head),
    )


def _mha_block(p: Params, x: jnp.ndarray, n_head: int, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Pre-LN self-attention (full-sequence form)."""
    h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"])
    q, k, v = _self_qkv(p["attn"], h, n_head)
    o, _ = _attend(q, k, v, mask)
    return x + _linear(_merge_heads(o), p["attn"]["wo"], p["attn"]["bo"])


def _mlp_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"])
    h = jax.nn.gelu(_linear(h, p["mlp"]["w1"], p["mlp"]["b1"]), approximate=False)
    return x + _linear(h, p["mlp"]["w2"], p["mlp"]["b2"])


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positional embedding for the encoder."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _init_attn(key, d: int, dtype) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = d**-0.5
    return {
        "wq": (jax.random.normal(k1, (d, d)) * s).astype(dtype),
        "bq": jnp.zeros((d,), dtype),
        "wk": (jax.random.normal(k2, (d, d)) * s).astype(dtype),
        "wv": (jax.random.normal(k3, (d, d)) * s).astype(dtype),
        "bv": jnp.zeros((d,), dtype),
        "wo": (jax.random.normal(k4, (d, d)) * s).astype(dtype),
        "bo": jnp.zeros((d,), dtype),
    }


def _init_block(key, d: int, dtype, cross: bool) -> Params:
    keys = jax.random.split(key, 4)
    p = {
        "attn_ln": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "attn": _init_attn(keys[0], d, dtype),
        "mlp_ln": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "mlp": {
            "w1": (jax.random.normal(keys[1], (d, 4 * d)) * d**-0.5).astype(dtype),
            "b1": jnp.zeros((4 * d,), dtype),
            "w2": (jax.random.normal(keys[2], (4 * d, d)) * (4 * d) ** -0.5).astype(dtype),
            "b2": jnp.zeros((d,), dtype),
        },
    }
    if cross:
        p["cross_ln"] = {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
        p["cross"] = _init_attn(keys[3], d, dtype)
    return p


def _stack_blocks(blocks: list[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(cfg: WhisperConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameters (HF-checkpoint loading lives in load.py)."""
    ke, kd, kc1, kc2, kt = jax.random.split(key, 5)
    d = cfg.n_audio_state
    enc_blocks = [
        _init_block(k, d, dtype, cross=False)
        for k in jax.random.split(ke, cfg.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(k, cfg.n_text_state, dtype, cross=True)
        for k in jax.random.split(kd, cfg.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": {
                "w": (jax.random.normal(kc1, (3, cfg.n_mels, d)) * (3 * cfg.n_mels) ** -0.5).astype(dtype),
                "b": jnp.zeros((d,), dtype),
            },
            "conv2": {
                "w": (jax.random.normal(kc2, (3, d, d)) * (3 * d) ** -0.5).astype(dtype),
                "b": jnp.zeros((d,), dtype),
            },
            "pos_emb": jnp.asarray(_sinusoids(cfg.n_audio_ctx, d), dtype),
            "blocks": _stack_blocks(enc_blocks),
            "ln_post": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        },
        "decoder": {
            "tok_emb": (jax.random.normal(kt, (cfg.n_vocab, cfg.n_text_state)) * 0.02).astype(dtype),
            "pos_emb": jnp.zeros((cfg.n_text_ctx, cfg.n_text_state), dtype),
            "blocks": _stack_blocks(dec_blocks),
            "ln": {"g": jnp.ones((cfg.n_text_state,), dtype), "b": jnp.zeros((cfg.n_text_state,), dtype)},
        },
    }


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def encoder_flops(cfg: WhisperConfig, n_tokens: int) -> int:
    """Hand-counted matmul FLOPs for one encode of ``n_tokens`` output tokens
    (= mel frames / 2). XLA's ``cost_analysis()`` reports the FLOPs of ONE
    ``lax.scan`` iteration, undercounting the L-layer encoder L-fold — the
    round-2 '0.5 ms roofline / 2% MFU' claim came from exactly that trap
    (docs/ROADMAP.md round-3 correction). Use this for MFU estimates."""
    d, ff, t, L = cfg.n_audio_state, 4 * cfg.n_audio_state, n_tokens, cfg.n_audio_layer
    per_layer = 4 * 2 * t * d * d + 2 * 2 * t * d * ff + 2 * 2 * t * t * d
    # conv stem: k=3 convs at 2t (stride 1) and t (stride 2) positions
    stem = 2 * (2 * t) * 3 * cfg.n_mels * d + 2 * t * 3 * d * d
    return L * per_layer + stem


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encoder_stem(enc: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """Conv stem (k3 s1 + k3 s2, exact GELU) + positional prefix — the
    pre-transformer part of ``encode``, shared with the pipeline-parallel
    path (parallel/pipeline.py)."""
    dn = ("NHC", "HIO", "NHC")
    x = jax.lax.conv_general_dilated(mel, enc["conv1"]["w"].astype(mel.dtype), (1,), [(1, 1)], dimension_numbers=dn)
    x = jax.nn.gelu(x + enc["conv1"]["b"].astype(mel.dtype), approximate=False)
    x = jax.lax.conv_general_dilated(x, enc["conv2"]["w"].astype(mel.dtype), (2,), [(1, 1)], dimension_numbers=dn)
    x = jax.nn.gelu(x + enc["conv2"]["b"].astype(mel.dtype), approximate=False)
    return x + enc["pos_emb"][: x.shape[1]].astype(x.dtype)


def encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: (B, T, n_mels) -> (B, T//2, d), T ≤ 2*n_audio_ctx.

    Conv stem (k3 s1 + k3 s2, exact GELU) then ``lax.scan`` over stacked
    transformer blocks. T < 3000 uses the positional-embedding prefix — the
    bucketed-window trick that lets streaming encode 8/16 s buffers instead of
    always padding to 30 s (the re-transcription loop's dominant cost).
    """
    enc = params["encoder"]
    x = _encoder_stem(enc, mel)

    def body(h, blk):
        h = _mha_block(blk, h, cfg.n_audio_head, mask=None)
        h = _mlp_block(blk, h)
        return _constrain_act(h), None

    x, _ = jax.lax.scan(body, _constrain_act(x), enc["blocks"])
    return layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"])


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DecoderCache:
    """Static-shape KV cache pytree.

    self_k/self_v: (L, B, H, text_ctx, Dh) — attention layout, written at a
    dynamic position along axis 3 (no per-step transposes on the hot path).
    cross_k/cross_v: (L, B, H, audio_ctx, Dh) — precomputed per window.

    int8 KV mode (``init_cache(..., kv_quant=True)``): the k/v arrays hold
    int8 rows and the *_s fields hold f32 per-row scales (..., T, 1) — halves
    the dominant HBM read of the bandwidth-bound decode step (_attend_q8).
    In bf16 mode the scale fields are None.
    """

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    self_ks: Optional[jnp.ndarray] = None
    self_vs: Optional[jnp.ndarray] = None
    cross_ks: Optional[jnp.ndarray] = None
    cross_vs: Optional[jnp.ndarray] = None

    @property
    def kv_quant(self) -> bool:
        return self.self_ks is not None


jax.tree_util.register_dataclass(
    DecoderCache,
    data_fields=["self_k", "self_v", "cross_k", "cross_v",
                 "self_ks", "self_vs", "cross_ks", "cross_vs"],
    meta_fields=[],
)


def precompute_cross_kv(params: Params, cfg: WhisperConfig, xa: jnp.ndarray):
    """xa: (B, n_audio_ctx, d) encoder output -> stacked cross K/V (L,B,T,H,Dh)."""
    dec = params["decoder"]

    def body(_, blk):
        # K/V come from the raw encoder output (cross_ln only normalizes the query).
        k = _split_heads(_linear(xa, blk["cross"]["wk"], None), cfg.n_text_head)
        v = _split_heads(_linear(xa, blk["cross"]["wv"], blk["cross"]["bv"]), cfg.n_text_head)
        return None, (k, v)  # (B, H, T, Dh) attention layout — no per-step transposes

    _, (ck, cv) = jax.lax.scan(body, None, dec["blocks"])
    return ck, cv  # (L, B, H, T_audio, Dh)


def _precompute_cross_kv_q8(params: Params, cfg: WhisperConfig, xa: jnp.ndarray):
    """int8-KV variant of precompute_cross_kv: quantization runs INSIDE the
    layer scan, so at most ONE layer's bf16 K/V rows are ever live.

    Sizing matters at serving batch: quantizing the full stacked (L,B,H,T,Dh)
    output holds the bf16 stack and its int8 copy alive together — at
    large-v3 B=29 that transient alone is ~7.1 GB bf16 + 3.8 GB int8, and the
    XLA AOT compile refuses the program outright (measured round 5: "Used
    18.81G of 15.75G hbm" — the int8-kv serving cap of 29 rows was
    uncompilable, failing the very capacity story the tier exists for).
    Per-layer quantization bounds the bf16 transient to ~230 MB at B=29."""
    dec = params["decoder"]

    def body(_, blk):
        k = _split_heads(_linear(xa, blk["cross"]["wk"], None), cfg.n_text_head)
        v = _split_heads(_linear(xa, blk["cross"]["wv"], blk["cross"]["bv"]), cfg.n_text_head)
        k8, ks = _quantize_kv_rows(k)
        v8, vs = _quantize_kv_rows(v)
        return None, (k8, ks, v8, vs)

    _, (ck8, cks, cv8, cvs) = jax.lax.scan(body, None, dec["blocks"])
    return ck8, cks, cv8, cvs  # int8 (L,B,H,T,Dh) + f32 (L,B,H,T,1) scales


def init_cache(
    params: Params,
    cfg: WhisperConfig,
    xa: jnp.ndarray,
    text_ctx: Optional[int] = None,
    kv_quant: bool = False,
) -> DecoderCache:
    """text_ctx trims the self-attention cache below cfg.n_text_ctx when the
    caller knows its decode budget (prefill + max_new) — less HBM traffic per
    step. ``kv_quant`` stores both caches as int8 rows + f32 per-row scales
    (the aggressive int8-all mode; see _attend_q8)."""
    b = xa.shape[0]
    h, dh = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head
    tc = text_ctx or cfg.n_text_ctx
    if not kv_quant:
        ck, cv = precompute_cross_kv(params, cfg, xa)
        zeros = jnp.zeros((cfg.n_text_layer, b, h, tc, dh), xa.dtype)
        return DecoderCache(self_k=zeros, self_v=zeros, cross_k=ck, cross_v=cv)
    # per-layer fused quantize: never materializes the full bf16 cross stack
    ck8, cks, cv8, cvs = _precompute_cross_kv_q8(params, cfg, xa)
    z8 = jnp.zeros((cfg.n_text_layer, b, h, tc, dh), jnp.int8)
    zs = jnp.full((cfg.n_text_layer, b, h, tc, 1), 1e-12, jnp.float32)
    return DecoderCache(
        self_k=z8, self_v=z8, cross_k=ck8, cross_v=cv8,
        self_ks=zs, self_vs=zs, cross_ks=cks, cross_vs=cvs,
    )


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B,) int32 — token at position `pos`
    pos: jnp.ndarray,  # scalar int32
    cache: DecoderCache,
    alignment_mask: Optional[jnp.ndarray] = None,  # (L, H) f32 weights for xattn capture
    beam_ancestry: Optional[jnp.ndarray] = None,  # (B, B, T) — see _attend_beam
):
    """One incremental decode step. Returns (logits (B, n_vocab), cache, xattn).

    xattn: (B, n_audio_ctx) alignment-head-averaged cross-attention weights for
    DTW word timestamps, or None if alignment_mask is None.

    beam_ancestry: when the B rows are beams over ONE stream, self-attention
    reads each beam's ancestor KV through the ancestry table instead of a
    per-step cache reorder (_attend_beam); rows still write their own slot.
    """
    dec = params["decoder"]
    kvq = cache.kv_quant
    dtype = jnp.bfloat16 if kvq else cache.self_k.dtype
    x = _emb_rows(dec["tok_emb"], tokens) + dec["pos_emb"][pos]
    x = x[:, None, :].astype(dtype)  # (B,1,d)
    n_head = cfg.n_text_head
    text_ctx = cache.self_k.shape[3]
    t_mask = (jnp.arange(text_ctx) > pos)[None, None, None, :] * jnp.float32(-1e9)

    capture = alignment_mask is not None
    align = alignment_mask if capture else jnp.zeros((cfg.n_text_layer, n_head), jnp.float32)

    def body(h, xs):
        if kvq:
            blk, kc, vc, ck, cv, kcs, vcs, cks, cvs, am = xs
        else:
            blk, kc, vc, ck, cv, am = xs
        # self-attention with cache write at pos
        hn = layer_norm(h, blk["attn_ln"]["g"], blk["attn_ln"]["b"])
        q, k, v = _self_qkv(blk["attn"], hn, n_head)  # each (B,H,1,Dh)
        if kvq:
            k8, ksc = _quantize_kv_rows(k)
            v8, vsc = _quantize_kv_rows(v)
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k8, pos, axis=2)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v8, pos, axis=2)
            kcs = jax.lax.dynamic_update_slice_in_dim(kcs, ksc, pos, axis=2)
            vcs = jax.lax.dynamic_update_slice_in_dim(vcs, vsc, pos, axis=2)
            if beam_ancestry is not None:
                o = _attend_beam_q8(q, kc, vc, kcs, vcs, beam_ancestry, t_mask,
                                    out_dtype=dtype)
            else:
                o, _ = _attend_q8(q, kc, vc, kcs, vcs, t_mask, out_dtype=dtype)
        else:
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k, pos, axis=2)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v, pos, axis=2)
            if beam_ancestry is not None:
                o = _attend_beam(q, kc, vc, beam_ancestry, t_mask)
            else:
                o, _ = _attend(q, kc, vc, t_mask)
        h = h + _linear(_merge_heads(o), blk["attn"]["wo"], blk["attn"]["bo"])
        # cross-attention against precomputed K/V
        hn = layer_norm(h, blk["cross_ln"]["g"], blk["cross_ln"]["b"])
        q = _split_heads(_linear(hn, blk["cross"]["wq"], blk["cross"]["bq"]), n_head)
        if kvq:
            o, w = _attend_q8(q, ck, cv, cks, cvs, None, return_weights=True, out_dtype=dtype)
        else:
            o, w = _attend(q, ck, cv, None, return_weights=True)
        h = h + _linear(_merge_heads(o), blk["cross"]["wo"], blk["cross"]["bo"])
        h = _mlp_block(blk, h)
        # w: (B, H, 1, T_audio); weighted head average for alignment
        xattn_l = jnp.einsum("bhqt,h->bt", w[:, :, :, :], am)
        if kvq:
            return h, (kc, vc, kcs, vcs, xattn_l)
        return h, (kc, vc, xattn_l)

    if kvq:
        xs = (dec["blocks"], cache.self_k, cache.self_v, cache.cross_k, cache.cross_v,
              cache.self_ks, cache.self_vs, cache.cross_ks, cache.cross_vs, align)
        x, (new_k, new_v, new_ks, new_vs, xattn_layers) = jax.lax.scan(body, x, xs)
        new_cache = DecoderCache(
            self_k=new_k, self_v=new_v, cross_k=cache.cross_k, cross_v=cache.cross_v,
            self_ks=new_ks, self_vs=new_vs,
            cross_ks=cache.cross_ks, cross_vs=cache.cross_vs,
        )
    else:
        xs = (dec["blocks"], cache.self_k, cache.self_v, cache.cross_k, cache.cross_v, align)
        x, (new_k, new_v, xattn_layers) = jax.lax.scan(body, x, xs)
        new_cache = DecoderCache(
            self_k=new_k, self_v=new_v, cross_k=cache.cross_k, cross_v=cache.cross_v
        )
    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    logits = _logits_head(x[:, 0, :], dec["tok_emb"])
    xattn = jnp.sum(xattn_layers, axis=0) if capture else None  # (B, n_audio_ctx)
    return logits, new_cache, xattn


def decode_span(
    params: Params,
    cfg: WhisperConfig,
    tokens: jnp.ndarray,  # (B, S) int32 — span of tokens starting at position pos0
    pos0: jnp.ndarray,  # scalar int32
    cache: DecoderCache,
    alignment_mask: Optional[jnp.ndarray] = None,  # (L, H) weights for xattn capture
):
    """Process S tokens at once (prompt/prefix prefill), writing the KV cache.

    Returns (logits (B, S, n_vocab), cache, xattn). Equivalent to S decode_step
    calls but one matmul-shaped pass — this is how carried prompts (reference
    enhanced_asr_processor.py:295-341) AND the stable token prefix of the
    incremental re-decode are absorbed without a per-token loop. xattn is the
    alignment-head-averaged cross-attention (B, S, audio_ctx) when
    alignment_mask is given (word timestamps for prefix tokens), else None.
    """
    dec = params["decoder"]
    b, s = tokens.shape
    n_head = cfg.n_text_head
    kvq = cache.kv_quant
    dtype = jnp.bfloat16 if kvq else cache.self_k.dtype
    pos = pos0 + jnp.arange(s)
    x = (_emb_rows(dec["tok_emb"], tokens) + dec["pos_emb"][pos]).astype(dtype)
    # query q (local index) may attend to cache key j iff j <= pos0 + q
    j = jnp.arange(cache.self_k.shape[3])[None, :]
    qpos = pos[:, None]
    mask = jnp.where(j > qpos, -1e9, 0.0).astype(jnp.float32)[None, None]  # (1,1,S,ctx)

    capture = alignment_mask is not None
    align = alignment_mask if capture else jnp.zeros((cfg.n_text_layer, n_head), jnp.float32)

    def body(h, xs):
        if kvq:
            blk, kc, vc, ck, cv, kcs, vcs, cks, cvs, am = xs
        else:
            blk, kc, vc, ck, cv, am = xs
        hn = layer_norm(h, blk["attn_ln"]["g"], blk["attn_ln"]["b"])
        q, k, v = _self_qkv(blk["attn"], hn, n_head)  # each (B,H,S,Dh)
        if kvq:
            k8, ksc = _quantize_kv_rows(k)
            v8, vsc = _quantize_kv_rows(v)
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k8, pos0, axis=2)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v8, pos0, axis=2)
            kcs = jax.lax.dynamic_update_slice_in_dim(kcs, ksc, pos0, axis=2)
            vcs = jax.lax.dynamic_update_slice_in_dim(vcs, vsc, pos0, axis=2)
            o, _ = _attend_q8(q, kc, vc, kcs, vcs, mask, out_dtype=dtype)
        else:
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k, pos0, axis=2)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v, pos0, axis=2)
            o, _ = _attend(q, kc, vc, mask)
        h = h + _linear(_merge_heads(o), blk["attn"]["wo"], blk["attn"]["bo"])
        hn = layer_norm(h, blk["cross_ln"]["g"], blk["cross_ln"]["b"])
        q = _split_heads(_linear(hn, blk["cross"]["wq"], blk["cross"]["bq"]), n_head)
        if kvq:
            o, w = _attend_q8(q, ck, cv, cks, cvs, None, return_weights=capture,
                              out_dtype=dtype)
        else:
            o, w = _attend(q, ck, cv, None, return_weights=capture)
        h = h + _linear(_merge_heads(o), blk["cross"]["wo"], blk["cross"]["bo"])
        h = _mlp_block(blk, h)
        xattn_l = (
            jnp.einsum("bhst,h->bst", w, am) if capture else jnp.zeros((b, s, 1), jnp.float32)
        )
        if kvq:
            return h, (kc, vc, kcs, vcs, xattn_l)
        return h, (kc, vc, xattn_l)

    if kvq:
        xs = (dec["blocks"], cache.self_k, cache.self_v, cache.cross_k, cache.cross_v,
              cache.self_ks, cache.self_vs, cache.cross_ks, cache.cross_vs, align)
        x, (new_k, new_v, new_ks, new_vs, xattn_layers) = jax.lax.scan(body, x, xs)
        new_cache = DecoderCache(
            self_k=new_k, self_v=new_v, cross_k=cache.cross_k, cross_v=cache.cross_v,
            self_ks=new_ks, self_vs=new_vs,
            cross_ks=cache.cross_ks, cross_vs=cache.cross_vs,
        )
    else:
        xs = (dec["blocks"], cache.self_k, cache.self_v, cache.cross_k, cache.cross_v, align)
        x, (new_k, new_v, xattn_layers) = jax.lax.scan(body, x, xs)
        new_cache = DecoderCache(
            self_k=new_k, self_v=new_v, cross_k=cache.cross_k, cross_v=cache.cross_v
        )
    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    logits = _logits_head(x, dec["tok_emb"])
    xattn = jnp.sum(xattn_layers, axis=0) if capture else None  # (B, S, audio_ctx)
    return logits, new_cache, xattn


def _decoder_block_full(
    blk: Params, h: jnp.ndarray, xa: jnp.ndarray, n_head: int, causal: jnp.ndarray
) -> jnp.ndarray:
    """One decoder block in the full-sequence (teacher-forced) form: causal
    self-attention, full cross-attention over ``xa``, MLP. Shared by
    ``decode_full`` and the pipeline-parallel path (parallel/pipeline.py)."""
    h = _mha_block(blk, h, n_head, causal)
    hn = layer_norm(h, blk["cross_ln"]["g"], blk["cross_ln"]["b"])
    q = _split_heads(_linear(hn, blk["cross"]["wq"], blk["cross"]["bq"]), n_head)
    k = _split_heads(_linear(xa, blk["cross"]["wk"], None), n_head)
    v = _split_heads(_linear(xa, blk["cross"]["wv"], blk["cross"]["bv"]), n_head)
    o, _ = _attend(q, k, v, None)
    h = h + _linear(_merge_heads(o), blk["cross"]["wo"], blk["cross"]["bo"])
    return _mlp_block(blk, h)


def decode_full(
    params: Params, cfg: WhisperConfig, tokens: jnp.ndarray, xa: jnp.ndarray
) -> jnp.ndarray:
    """Teacher-forced decoder: tokens (B,T), xa (B,n_audio_ctx,d) -> logits (B,T,V).

    Used for training (train/), sequence scoring, and architecture parity tests.
    """
    dec = params["decoder"]
    b, t = tokens.shape
    x = _emb_rows(dec["tok_emb"], tokens) + dec["pos_emb"][:t]
    x = x.astype(xa.dtype)
    n_head = cfg.n_text_head
    causal = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)[None, None]

    def body(h, blk):
        return _constrain_act(_decoder_block_full(blk, h, xa, n_head, causal)), None

    x, _ = jax.lax.scan(body, _constrain_act(x), dec["blocks"])
    x = layer_norm(x, dec["ln"]["g"], dec["ln"]["b"])
    return _logits_head(x, dec["tok_emb"])
