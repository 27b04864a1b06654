"""Int8/int4 weight-only quantization for the Whisper decoder.

Incremental decoding at batch 1 is weight-bandwidth-bound (every step streams
the full decoder from HBM); per-output-channel int8 halves that traffic vs
bf16. This mirrors the capability the reference gets from CTranslate2's
``compute_type="int8"`` (`asr_components.py:264`, `一键…py:1147-1175` CPU
fallback), implemented as a pure params transform: linear weights become
``{"q": int8 (in,out), "s": f32 (out,)}`` consumed by model._linear with the
dequant fused into the matmul.

Int4 goes one tier beyond the reference's backend (CTranslate2 has no int4 on
GPU): decoder block linears as ``{"q": int8 (in/2,out) NIBBLE-PACKED,
"s": f32 (G,out)}`` with per-group-of-128-input-rows scales (RTN-g128).
Storage is two int4 values per int8 byte — packed along the INPUT dim, pair
(2i, 2i+1) in (low, high) nibbles — because S4 arrays cannot cross the
host↔device boundary or be passed as jit arguments on the axon TPU backend
(infinite device_put relayout recursion, measured round 4); model._linear
reinterprets the bytes in-program via ``lax.bitcast_convert_type`` (a free
view) and runs a grouped integer dot. Measured on v5e: step-time PARITY with
int8 (XLA materializes the S4→S8 convert instead of fusing it into the dot),
but HALF the weight HBM residency and checkpoint size — the capacity tier for
multi-stream serving. Grouped scales bound the quantization error to each
128-row slab (per-column int4 scales lose ~3× more); the logits head and
encoder stay at int8 (quality-sensitive / MXU-bound respectively).

The encoder stays bf16 by default (MXU-bound, not bandwidth-bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from realtime_whisper_asr_tpu.models.whisper.model import Params

#: includes the fused "wqkv" so fuse_qkv -> quantize_* composes too (absmax
#: scales are per output column, so quantizing the fused weight is identical
#: to fusing the quantized parts); without it the largest per-layer decode
#: weights silently stayed dense in that order
_LINEAR_KEYS = {"wq", "wk", "wv", "wqkv", "wo", "w1", "w2"}


def _quantize_weight(w: jnp.ndarray) -> dict:
    """(in, out) -> {"q": int8, "s": f32 (out,)} with per-column absmax scales."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w32 / s[None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def _quantize_tree(tree):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k in _LINEAR_KEYS and hasattr(v, "ndim") and v.ndim >= 2:
                if v.ndim == 2:
                    out[k] = _quantize_weight(v)
                else:  # stacked layers (L, in, out): per-layer per-column scales
                    w32 = v.astype(jnp.float32)
                    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=1) / 127.0, 1e-12)  # (L,out)
                    q = jnp.clip(jnp.round(w32 / s[:, None, :]), -127, 127).astype(jnp.int8)
                    out[k] = {"q": q, "s": s}
            else:
                out[k] = _quantize_tree(v)
        return out
    return tree


#: int4 scale-group size along the INPUT dim. 128 = one MXU K-tile, so the
#: grouped dot's per-group (128→out) partials tile exactly like the flat dot.
INT4_GROUP = 128


def _pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 values in [-7,7], (…, in, out) -> nibble-packed int8 (…, in/2, out):
    byte = (q[2i] & 0xF) | (q[2i+1] << 4). Pure int8 bit ops — NO S4 array is
    ever materialized outside a jitted program (eager S4 intermediates would
    hit the axon device_put recursion this layout exists to avoid)."""
    lo, hi = q[..., 0::2, :], q[..., 1::2, :]
    return jnp.bitwise_or(jnp.bitwise_and(lo, 0xF), jnp.left_shift(hi, 4))


def _unpack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _pack_int4 via sign-extending int8 shifts (no S4 arrays):
    (…, in/2, out) packed -> (…, in, out) int8 values."""
    lo = jnp.right_shift(jnp.left_shift(q, 4), 4)  # arithmetic: sign-extends
    hi = jnp.right_shift(q, 4)
    w = jnp.stack([lo, hi], axis=-2)  # (…, in/2, 2, out): index = 2i + j
    *lead, half, _, dout = w.shape
    return w.reshape(*lead, half * 2, dout)


def _dequant(w):
    """Dense f32 view of a dense / int8 / packed-int4 weight (requantization
    path; int4 is detected by its grouped scales — s.ndim == q.ndim)."""
    if not isinstance(w, dict):
        return jnp.asarray(w, jnp.float32)
    s = jnp.asarray(w["s"], jnp.float32)
    if s.ndim == w["q"].ndim:
        # int4 per-group: q packed (..., in/2, out), s (..., G, out)
        q = _unpack_int4(w["q"]).astype(jnp.float32)
        g = s.shape[-2]
        shp = q.shape
        qg = q.reshape(*shp[:-2], g, shp[-2] // g, shp[-1])
        return (qg * s[..., :, None, :]).reshape(shp)
    # int8: s (..., out)
    return jnp.asarray(w["q"], jnp.float32) * s[..., None, :]


def _quantize_weight_int4(w, group: int = INT4_GROUP) -> dict:
    """(…, in, out) -> {"q": packed int8 (…, in/2, out), "s": f32 (…, G, out)}
    with per-group absmax scales over ``group`` input rows (G = in/group; one
    group if indivisible). Accepts dense or already-int8 weights (requantizes
    through f32)."""
    w32 = _dequant(w)
    *lead, din, dout = w32.shape
    g = din // group if (din % group == 0 and din >= group) else 1
    wg = w32.reshape(*lead, g, din // g, dout)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-12)  # (…, g, out)
    q = jnp.clip(jnp.round(wg / s[..., :, None, :]), -7, 7)
    return {"q": _pack_int4(q.reshape(*lead, din, dout).astype(jnp.int8)), "s": s}


def _is_int4(w) -> bool:
    """Packed-int4 leaves carry grouped scales: s (…, G, out) has the SAME
    rank as q (…, in/2, out); int8 per-column scales (…, out) have one less."""
    return (isinstance(w, dict) and set(w) == {"q", "s"}
            and w["s"].ndim == w["q"].ndim)


def _quantize_tree_int4(tree):
    if isinstance(tree, dict):
        if _is_int4(tree):
            return tree  # already int4 (idempotent)
        out = {}
        for k, v in tree.items():
            is_w = (k in _LINEAR_KEYS) and (
                (hasattr(v, "ndim") and v.ndim >= 2)
                or (isinstance(v, dict) and set(v) == {"q", "s"})
            )
            out[k] = _quantize_weight_int4(v) if is_w else _quantize_tree_int4(v)
        return out
    return tree


def quantize_decoder_int4(params: Params) -> Params:
    """Decoder block linears to int4-g128 + the tied logits head to int8
    (the head stays int8: its per-vocab-row error margins sit directly under
    the softmax decision, and at 67 MB it is no longer the bandwidth hot spot
    once the blocks drop to ~0.45 GB)."""
    out = dict(params)
    dec = dict(params["decoder"])
    dec["blocks"] = _quantize_tree_int4(params["decoder"]["blocks"])
    out["decoder"] = dec
    return quantize_logits_head(out)


def quantize_all_int4(params: Params) -> Params:
    """int4-g128 decoder blocks + int8 encoder blocks + int8 logits head —
    the most aggressive sensible tier (the encoder is MXU-bound, so int4
    there buys ~nothing and risks mel-level error amplification)."""
    out = quantize_decoder_int4(params)
    enc = dict(out["encoder"])
    enc["blocks"] = _quantize_tree(out["encoder"]["blocks"])
    out["encoder"] = enc
    return out


def quantize_decoder(params: Params) -> Params:
    """Return params with decoder block linears quantized to int8 (weights
    shared with the input copy are left dense: tok_emb/pos_emb/layernorms)."""
    out = dict(params)
    dec = dict(params["decoder"])
    dec["blocks"] = _quantize_tree(params["decoder"]["blocks"])
    out["decoder"] = dec
    return out


def quantize_logits_head(params: Params) -> Params:
    """int8-quantize the tied tok_emb with per-VOCAB-ROW scales: halves the
    logits head's per-step HBM read (133→67 MB at large-v3; the decode step
    is weight-bandwidth-bound). model._emb_rows/_logits_head consume the dict
    form for both the gather and the tied output matmul."""
    out = dict(params)
    dec = dict(out["decoder"])
    if isinstance(dec["tok_emb"], dict):
        return out  # already quantized (pre-quantized checkpoint)
    w32 = dec["tok_emb"].astype(jnp.float32)  # (V, d)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=1) / 127.0, 1e-12)  # (V,)
    q = jnp.clip(jnp.round(w32 / s[:, None]), -127, 127).astype(jnp.int8)
    dec["tok_emb"] = {"q": q, "s": s}
    out["decoder"] = dec
    return out


def quantize_all(params: Params) -> Params:
    """Quantize encoder and decoder block linears (encoder conv/emb stay
    dense) plus the tied logits head."""
    out = quantize_decoder(params)
    enc = dict(out["encoder"])
    enc["blocks"] = _quantize_tree(out["encoder"]["blocks"])
    out["encoder"] = enc
    return quantize_logits_head(out)


def detect_quantization(params: Params) -> str | None:
    """Return "int8" / "int8-all" / "int4" / "int4-all" if ``params`` carry
    pre-quantized linears (e.g. restored from a checkpoint saved after a
    quantize_* transform; the deployment analog of CTranslate2's pre-quantized
    model dirs), else None. All quantize_* transforms are idempotent, so
    re-applying a requested quantization on pre-quantized params is safe —
    this is for reporting."""

    def _q_kind(tree) -> str | None:
        if isinstance(tree, dict):
            if set(tree) == {"q", "s"}:
                return "int4" if _is_int4(tree) else "int8"
            for v in tree.values():
                k = _q_kind(v)
                if k is not None:
                    return k
        return None

    dec = _q_kind(params.get("decoder", {}).get("blocks", {}))
    if dec is None:
        return None
    enc = _q_kind(params.get("encoder", {}).get("blocks", {}))
    return dec + ("-all" if enc is not None else "")


# ---------------------------------------------------------------------------
# QKV fusion (inference-time transform)
# ---------------------------------------------------------------------------


def _concat_weights(ws: list, axis: int):
    """Concat dense arrays or quantized {"q","s"} dicts along the output axis.
    Scales always concat along THEIR last axis — the output axis in every
    layout (int8 flat (out,), int8 stacked (L,out), int4 flat (G,out), int4
    stacked (L,G,out)); int4 groups partition the shared INPUT dim, so q/k/v
    group boundaries line up by construction."""
    if isinstance(ws[0], dict):
        return {
            "q": jnp.concatenate([w["q"] for w in ws], axis=axis),
            "s": jnp.concatenate([w["s"] for w in ws], axis=-1),
        }
    return jnp.concatenate(ws, axis=axis)


def _fuse_attn(attn: dict) -> dict:
    """wq/wk/wv → one wqkv (in, 3d) + bqkv (bk is zero in Whisper), halving
    the per-layer launch count of the latency-bound batch-1 decode step.
    Works on dense or int8-quantized weights, stacked (L, in, out) or flat."""
    if "wqkv" in attn or "wk" not in attn:
        return attn
    wq, wk, wv = attn["wq"], attn["wk"], attn["wv"]
    ndim = wq["q"].ndim if isinstance(wq, dict) else wq.ndim
    axis = ndim - 1  # output axis (flat: 1; stacked: 2)
    bq, bv = attn["bq"], attn["bv"]
    bk = jnp.zeros_like(bq)
    out = {k: v for k, v in attn.items() if k in ("wo", "bo")}
    out["wqkv"] = _concat_weights([wq, wk, wv], axis)
    out["bqkv"] = jnp.concatenate([bq, bk, bv], axis=-1)
    return out


def _fuse_tree(tree):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k == "attn" and isinstance(v, dict):
                out[k] = _fuse_attn(v)
            else:
                out[k] = _fuse_tree(v)
        return out
    return tree


def fuse_qkv(params: Params) -> Params:
    """Fuse self-attention q/k/v projections in BOTH encoder and decoder
    blocks (cross-attention keeps its separate wq — its k/v are precomputed
    per window). Composes with quantization in either order. Inference-only:
    the training/sharding paths keep the canonical unfused layout."""
    return _fuse_tree(params)
