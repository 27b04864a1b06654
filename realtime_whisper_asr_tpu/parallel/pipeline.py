"""Pipeline parallelism (GPipe) over the stacked layer axis via shard_map.

The scan-stacked layer layout (models/whisper/model.py) makes Whisper's
transformer stacks natively pipeline-shardable: the ``(L, ...)`` parameter
pytree splits evenly across a ``stage`` mesh axis, each stage scans its L/S
local layers, and activations rotate stage→stage+1 with ``lax.ppermute``
while stage 0 ingests a fresh microbatch each step — M microbatches drain in
M+S-1 steps (bubble fraction (S-1)/(M+S-1)). ``apply_stage`` is wrapped in
``jax.checkpoint``: GPipe's per-microbatch rematerialization, so backward
recomputes one stage×microbatch at a time instead of storing every layer's
activations. The whole thing is differentiable (shard_map + ppermute have
exact transposes); numerics are locked against the plain ``lax.scan`` stacks
in tests/test_parallel.py.

No reference analog (the reference is strictly single-device, SURVEY.md
§2.4); this is the TPU-native scale-out path for model sizes whose layer
stack exceeds one chip's HBM — each stage holds 1/S of the blocks, rotations
ride ICI neighbor links.

Composition note: this v1 pipelines over a dedicated ('stage',) mesh. dp×pp
and tp-within-stage compose in principle (shard_map's other axes left auto),
but are not wired here — dp×tp(+SP) via make_sharded_train_step remains the
recommended layout whenever the model fits per-chip.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from realtime_whisper_asr_tpu.models.whisper import model as M
from realtime_whisper_asr_tpu.models.whisper.config import WhisperConfig


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    """1-D ('stage',) mesh over the first ``n_stages`` devices."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), ("stage",))


def _pp_inner(x_mb, blocks_local, *, body: Callable, n_micro: int, n_stages: int):
    """shard_map body: one device = one stage holding ``blocks_local``
    (L/S leading-axis rows); ``x_mb`` is the replicated microbatched
    activation pytree with leading (M, ...) axis."""
    stage = jax.lax.axis_index("stage")
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @jax.checkpoint  # GPipe rematerialization: one stage×microbatch at a time
    def apply_stage(c):
        y, _ = jax.lax.scan(lambda cc, blk: (body(cc, blk), None), c, blocks_local)
        return y

    def step(carry, t):
        cur, outs = carry
        # stage 0 ingests microbatch t; downstream stages consume what rotated
        # in at the end of the previous step. Clipped gathers + masked setters
        # keep the warmup/drain bubble steps harmless (their values are never
        # collected).
        ingest = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            ),
            x_mb,
        )
        cur = jax.tree.map(lambda i, c: jnp.where(stage == 0, i, c), ingest, cur)
        y = apply_stage(cur)
        y_rot = jax.tree.map(lambda a: jax.lax.ppermute(a, "stage", perm), y)
        # the last stage's finished microbatch (t - (S-1)) lands on stage 0
        oi = t - (n_stages - 1)
        outs = jax.tree.map(
            lambda o, yr: jnp.where(
                (stage == 0) & (oi >= 0),
                o.at[jnp.clip(oi, 0, n_micro - 1)].set(yr),
                o,
            ),
            outs,
            y_rot,
        )
        return (y_rot, outs), None

    cur0 = jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_mb)
    outs0 = jax.tree.map(jnp.zeros_like, x_mb)
    (_, outs), _ = jax.lax.scan(
        step, (cur0, outs0), jnp.arange(n_micro + n_stages - 1)
    )
    # stage 0 holds the collected outputs; broadcast so out_specs=P() is sound
    return jax.tree.map(
        lambda o: jax.lax.psum(jnp.where(stage == 0, o, jnp.zeros_like(o)), "stage"),
        outs,
    )


def pipeline_blocks(mesh: Mesh, body: Callable, x_mb, blocks):
    """Run a stacked block pytree as an S-stage pipeline over microbatches.

    ``x_mb``: activation pytree, every leaf leading with the (M, ...)
    microbatch axis, replicated across stages. ``blocks``: the (L, ...)
    stacked params (L divisible by the mesh's stage count). ``body(h, blk)``
    is the per-layer function from the equivalent ``lax.scan``. Returns a
    pytree shaped like ``x_mb``. Token-exact vs the scan (same per-layer float
    ops in the same order; only the schedule differs)."""
    n_stages = mesh.shape["stage"]
    n_layers = jax.tree.leaves(blocks)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    n_micro = jax.tree.leaves(x_mb)[0].shape[0]
    inner = functools.partial(
        _pp_inner, body=body, n_micro=n_micro, n_stages=n_stages
    )
    f = jax.shard_map(
        inner, mesh=mesh, in_specs=(P(), P("stage")), out_specs=P(),
        check_vma=False,
    )
    return f(x_mb, blocks)


def _microbatch(x: jnp.ndarray, n_micro: int) -> jnp.ndarray:
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    return x.reshape((n_micro, b // n_micro) + x.shape[1:])


def pp_encode(params, cfg: WhisperConfig, mel: jnp.ndarray, mesh: Mesh,
              n_micro: int) -> jnp.ndarray:
    """Pipeline-parallel ``model.encode``: stem and final LN replicated,
    transformer stack pipelined. mel (B, T, n_mels) -> (B, T//2, d)."""
    enc = params["encoder"]
    x = M._encoder_stem(enc, mel)
    x_mb = _microbatch(x, n_micro)

    def body(h, blk):
        h = M._mha_block(blk, h, cfg.n_audio_head, mask=None)
        return M._mlp_block(blk, h)

    y = pipeline_blocks(mesh, body, x_mb, enc["blocks"])
    y = y.reshape((-1,) + y.shape[2:])
    return M.layer_norm(y, enc["ln_post"]["g"], enc["ln_post"]["b"])


def pp_decode_full(params, cfg: WhisperConfig, tokens: jnp.ndarray,
                   xa: jnp.ndarray, mesh: Mesh, n_micro: int) -> jnp.ndarray:
    """Pipeline-parallel ``model.decode_full``: the (h, xa) pair rotates
    through stages together so every stage cross-attends over its
    microbatch's own encoder output. tokens (B,S), xa (B,T,d) -> (B,S,V)."""
    dec = params["decoder"]
    b, t = tokens.shape
    x = M._emb_rows(dec["tok_emb"], tokens) + dec["pos_emb"][:t]
    x = x.astype(xa.dtype)
    causal = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)[None, None]
    n_head = cfg.n_text_head

    def body(hx, blk):
        h, xam = hx
        return (M._decoder_block_full(blk, h, xam, n_head, causal), xam)

    h_mb, _ = pipeline_blocks(
        mesh, body, (_microbatch(x, n_micro), _microbatch(xa, n_micro)),
        dec["blocks"],
    )
    h = h_mb.reshape((-1,) + h_mb.shape[2:])
    h = M.layer_norm(h, dec["ln"]["g"], dec["ln"]["b"])
    return M._logits_head(h, dec["tok_emb"])


def pp_param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding pytree: stacked block leaves P('stage') on the layer
    axis, everything else replicated."""

    def spec(path, leaf):
        names = {getattr(p, "key", None) for p in path}
        if "blocks" in names:
            return NamedSharding(mesh, P("stage"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def make_pp_train_step(cfg: WhisperConfig, mesh: Mesh, n_micro: int,
                       optimizer=None):
    """(train_step, shard_batch) with the same batch contract as
    make_sharded_train_step, but layers pipeline-sharded over ('stage',)
    instead of dp×tp. Loss math is identical to train.loss_fn (sum nll /
    sum mask over the whole batch) — microbatching only reschedules it."""
    import optax

    from realtime_whisper_asr_tpu.train.train_step import TrainState

    optimizer = optimizer or optax.adamw(1e-5)
    repl = NamedSharding(mesh, P())

    def loss_fn_pp(params, mel, tokens_in, tokens_out, mask):
        xa = pp_encode(params, cfg, mel, mesh, n_micro)
        logits = pp_decode_full(params, cfg, tokens_in, xa, mesh, n_micro)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, tokens_out[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def step_fn(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn_pp)(
            state.params, batch["mel"], batch["tokens_in"],
            batch["tokens_out"], batch["mask"],
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, state.step + 1), loss

    def shard_batch(batch):
        return {k: jax.device_put(v, repl) for k, v in batch.items()}

    return jax.jit(step_fn, donate_argnums=(0,)), shard_batch


def make_pp_train_state(cfg: WhisperConfig, key, mesh: Mesh, optimizer=None):
    """Init TrainState with pipeline shardings (blocks split over stages
    BEFORE optimizer.init so Adam moments inherit the layout)."""
    import optax

    from realtime_whisper_asr_tpu.train.train_step import TrainState

    optimizer = optimizer or optax.adamw(1e-5)
    params = M.init_params(cfg, key, jnp.float32)
    params = jax.tree.map(jax.device_put, params, pp_param_shardings(mesh, params))
    opt_state = optimizer.init(params)
    step = jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P()))
    return TrainState(params, opt_state, step), optimizer
