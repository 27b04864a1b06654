"""HF-format Whisper checkpoint → stacked JAX params.

The reference downloads CTranslate2 conversions of the OpenAI checkpoints into
``models_fast/`` (reference `一键实时识别麦克风.py:1097,1115`, `先看这个，cursor
不用看/2.py`). Here the on-disk interchange format is the HuggingFace layout
(config.json + model.safetensors), converted to this framework's stacked
(layer-leading) pytree at load time. No network access is assumed: loading
requires a local directory; tests convert in-memory random HF models instead.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from realtime_whisper_asr_tpu.models.whisper.config import WhisperConfig
from realtime_whisper_asr_tpu.models.whisper.model import Params


def config_from_hf(hf_cfg: Mapping[str, Any], name: str = "hf") -> WhisperConfig:
    return WhisperConfig(
        name=name,
        n_mels=hf_cfg["num_mel_bins"],
        n_audio_ctx=hf_cfg.get("max_source_positions", 1500),
        n_audio_state=hf_cfg["d_model"],
        n_audio_head=hf_cfg["encoder_attention_heads"],
        n_audio_layer=hf_cfg["encoder_layers"],
        n_vocab=hf_cfg["vocab_size"],
        n_text_ctx=hf_cfg.get("max_target_positions", 448),
        n_text_state=hf_cfg["d_model"],
        n_text_head=hf_cfg["decoder_attention_heads"],
        n_text_layer=hf_cfg["decoder_layers"],
    )


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _attn(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "wq": _np(sd[f"{prefix}.q_proj.weight"]).T,
        "bq": _np(sd[f"{prefix}.q_proj.bias"]),
        "wk": _np(sd[f"{prefix}.k_proj.weight"]).T,
        "wv": _np(sd[f"{prefix}.v_proj.weight"]).T,
        "bv": _np(sd[f"{prefix}.v_proj.bias"]),
        "wo": _np(sd[f"{prefix}.out_proj.weight"]).T,
        "bo": _np(sd[f"{prefix}.out_proj.bias"]),
    }


def _ln(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"g": _np(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}


def _block(sd: Mapping[str, Any], prefix: str, cross: bool) -> dict:
    p = {
        "attn_ln": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "attn": _attn(sd, f"{prefix}.self_attn"),
        "mlp_ln": _ln(sd, f"{prefix}.final_layer_norm"),
        "mlp": {
            "w1": _np(sd[f"{prefix}.fc1.weight"]).T,
            "b1": _np(sd[f"{prefix}.fc1.bias"]),
            "w2": _np(sd[f"{prefix}.fc2.weight"]).T,
            "b2": _np(sd[f"{prefix}.fc2.bias"]),
        },
    }
    if cross:
        p["cross_ln"] = _ln(sd, f"{prefix}.encoder_attn_layer_norm")
        p["cross"] = _attn(sd, f"{prefix}.encoder_attn")
    return p


def _stack(blocks: list[dict]) -> dict:
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def params_from_hf_state_dict(
    sd: Mapping[str, Any], cfg: WhisperConfig, dtype=jnp.float32
) -> Params:
    """Convert an HF WhisperModel/WhisperForConditionalGeneration state dict.

    Accepts torch tensors or numpy arrays; tolerates the ``model.`` prefix and
    ignores the tied ``proj_out.weight``.
    """
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    enc_blocks = [_block(sd, f"encoder.layers.{i}", cross=False) for i in range(cfg.n_audio_layer)]
    dec_blocks = [_block(sd, f"decoder.layers.{i}", cross=True) for i in range(cfg.n_text_layer)]

    raw = {
        "encoder": {
            "conv1": {
                "w": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                "b": _np(sd["encoder.conv1.bias"]),
            },
            "conv2": {
                "w": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                "b": _np(sd["encoder.conv2.bias"]),
            },
            "pos_emb": _np(sd["encoder.embed_positions.weight"]),
            "blocks": _stack(enc_blocks),
            "ln_post": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "tok_emb": _np(sd["decoder.embed_tokens.weight"]),
            "pos_emb": _np(sd["decoder.embed_positions.weight"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln(sd, "decoder.layer_norm"),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), raw)


def load_checkpoint_dir(path: str, dtype=jnp.bfloat16) -> tuple[WhisperConfig, Params]:
    """Load an HF-layout local directory (config.json + *.safetensors)."""
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, name=os.path.basename(os.path.normpath(path)))

    sd: dict[str, np.ndarray] = {}
    try:
        from safetensors import safe_open  # ships with transformers' deps
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("safetensors not available; cannot load checkpoint") from e
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    return cfg, params_from_hf_state_dict(sd, cfg, dtype)
