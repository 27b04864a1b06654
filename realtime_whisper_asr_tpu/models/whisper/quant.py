"""Int8 weight-only quantization for the Whisper decoder.

Incremental decoding at batch 1 is weight-bandwidth-bound (every step streams
the full decoder from HBM); per-output-channel int8 halves that traffic vs
bf16. This mirrors the capability the reference gets from CTranslate2's
``compute_type="int8"`` (`asr_components.py:264`, `一键…py:1147-1175` CPU
fallback), implemented as a pure params transform: linear weights become
``{"q": int8 (in,out), "s": f32 (out,)}`` consumed by model._linear with the
dequant fused into the matmul.

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
    """Return "int8" / "int8-all" if ``params`` carry pre-quantized linears
    (e.g. restored from a checkpoint saved after quantize_decoder/quantize_all;
    the deployment analog of CTranslate2's pre-quantized model dirs), else
    None. All quantize_* transforms are idempotent, so re-applying a requested
    quantization on pre-quantized params is safe — this is for reporting."""

    def _has_q(tree) -> bool:
        if isinstance(tree, dict):
            if set(tree) == {"q", "s"}:
                return True
            return any(_has_q(v) for v in tree.values())
        return False

    if not _has_q(params.get("decoder", {}).get("blocks", {})):
        return None
    return "int8-all" if _has_q(params.get("encoder", {}).get("blocks", {})) else "int8"


# ---------------------------------------------------------------------------
# QKV fusion (inference-time transform)
# ---------------------------------------------------------------------------


def _concat_weights(ws: list, axis: int):
    """Concat dense arrays or int8 {"q","s"} dicts along the output axis."""
    if isinstance(ws[0], dict):
        return {
            "q": jnp.concatenate([w["q"] for w in ws], axis=axis),
            "s": jnp.concatenate([w["s"] for w in ws], axis=axis - 1 if axis > 0 else axis),
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
