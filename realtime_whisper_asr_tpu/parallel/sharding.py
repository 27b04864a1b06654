"""Parameter sharding rules for the stacked-layer Whisper pytree.

Megatron-style tensor parallelism over the ``model`` mesh axis:

- attention wq/wk/wv shard the OUTPUT (head) dim; wo shards the INPUT dim —
  one psum per attention block, inserted by XLA from the shardings;
- MLP w1 shards the hidden dim, w2 the input dim — one psum per MLP;
- the token embedding shards the model dim (logits contraction reduces over
  it, again one psum);
- layernorms, convs, positional embeddings replicate.

All rules address the stacked layout (leading layer axis from
models/whisper/model.py), so specs lead with None for block params.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _attn_spec(prefix_none: int):
    lead = (None,) * prefix_none
    return {
        "wq": P(*lead, None, "model"),
        "bq": P(*lead, "model"),
        "wk": P(*lead, None, "model"),
        "wv": P(*lead, None, "model"),
        "bv": P(*lead, "model"),
        "wo": P(*lead, "model", None),
        "bo": P(*lead, None),
    }


def _ln_spec(prefix_none: int):
    lead = (None,) * prefix_none
    return {"g": P(*lead, None), "b": P(*lead, None)}


def _block_spec(cross: bool):
    spec = {
        "attn_ln": _ln_spec(1),
        "attn": _attn_spec(1),
        "mlp_ln": _ln_spec(1),
        "mlp": {
            "w1": P(None, None, "model"),
            "b1": P(None, "model"),
            "w2": P(None, "model", None),
            "b2": P(None, None),
        },
    }
    if cross:
        spec["cross_ln"] = _ln_spec(1)
        spec["cross"] = _attn_spec(1)
    return spec


def whisper_param_shardings(mesh: Mesh) -> Any:
    """PartitionSpec pytree matching init_params' structure."""
    spec = {
        "encoder": {
            "conv1": {"w": P(None, None, "model"), "b": P("model")},
            "conv2": {"w": P(None, None, "model"), "b": P("model")},
            "pos_emb": P(None, "model"),
            "blocks": _block_spec(cross=False),
            "ln_post": _ln_spec(0),
        },
        "decoder": {
            "tok_emb": P(None, "model"),
            "pos_emb": P(None, "model"),
            "blocks": _block_spec(cross=True),
            "ln": _ln_spec(0),
        },
    }
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec,
                        is_leaf=lambda x: isinstance(x, P))


def _adapt_to_quantized(sharding: Any, params: Any) -> Any:
    """Walk ``params`` alongside the dense sharding tree, expanding each
    sharding leaf that meets an int8 ``{"q", "s"}`` pair (quant.py) into
    shardings for both members: ``q`` keeps the dense weight's spec and the
    per-output-column scales ``s`` drop the contraction (second-to-last)
    axis — e.g. a (L, in, out) wq at P(None, None, 'model') gives s (L, out)
    at P(None, 'model'); a 'model'-input-sharded wo leaves s replicated; the
    (V,) per-vocab-row tok_emb scales replicate. This is what lets the
    int8/int8-all serving artifacts shard over the same Megatron rules as
    the dense checkpoint."""
    if isinstance(params, dict):
        if set(params) == {"q", "s"} and not isinstance(sharding, dict):
            q, s = params["q"], params["s"]
            axes = tuple(sharding.spec)
            # pad to q's rank (PartitionSpec may omit trailing None entries)
            axes = axes + (None,) * (q.ndim - len(axes))
            if s.shape == tuple(q.shape[:-2]) + tuple(q.shape[-1:]):
                s_axes = axes[:-2] + axes[-1:]  # per-output-column (linears)
            elif s.shape == tuple(q.shape[:-1]):
                s_axes = axes[:-1]  # per-row (tok_emb vocab scales)
            else:  # unknown layout: replicate the (tiny) scales
                s_axes = (None,) * s.ndim
            return {"q": sharding,
                    "s": NamedSharding(sharding.mesh, P(*s_axes))}
        return {k: _adapt_to_quantized(sharding[k], v) for k, v in params.items()}
    return sharding


def shard_params(params: Any, mesh: Mesh) -> Any:
    shardings = _adapt_to_quantized(whisper_param_shardings(mesh), params)
    return jax.tree.map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh, *trailing_none: int) -> NamedSharding:
    """Batch-leading sharding: P('data', None, ...)."""
    return NamedSharding(mesh, P("data", *([None] * (trailing_none[0] if trailing_none else 2))))


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """Megatron-SP activation sharding for (B, T, D) carries: batch on the
    data axis AND sequence on the model axis. Feed to
    ``models.whisper.model.activation_sharding`` — the layernorm/residual
    regions between TP blocks then keep 1/tp of the sequence per device and
    XLA replaces each TP-boundary all-reduce with a reduce-scatter +
    all-gather pair (identical ICI bytes, tp× less activation memory)."""
    return NamedSharding(mesh, P("data", "model", None))
