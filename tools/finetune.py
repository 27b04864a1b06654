"""End-to-end Whisper fine-tuning recipe on TPU (single chip or dp×tp mesh).

The reference is inference-only; this closes the framework's training story:
manifest → bucketed data pipeline (train/data.py) → sharded teacher-forced
train step (train/train_step.py) → orbax train-state checkpoints with resume →
a native inference checkpoint loadable by ``TPUWhisperASR(checkpoint_dir=...)``.

Usage::

    python tools/finetune.py --manifest train.jsonl --model tiny \
        --out /ckpts/run1 --epochs 2 --batch-size 8 --lr 1e-5 \
        [--val-manifest val.jsonl] [--mesh 2x4] [--init-checkpoint DIR] \
        [--resume] [--save-every 200]

``--mesh DxT`` shards over a data×model mesh (needs D*T visible devices; on a
CPU host set XLA_FLAGS=--xla_force_host_platform_device_count=8). Without it,
training runs single-device with the same step function on a 1x1 mesh.

The manifest is JSONL: {"wav": path, "text": str, "language"?: str} per line
(train/data.py). WAVs must be 16 kHz mono (io.read_wav).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger("finetune")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--val-manifest", default=None)
    ap.add_argument("--model", default="tiny", help="config name (tiny..large-v3, test-tiny)")
    ap.add_argument("--init-checkpoint", default=None,
                    help="native or HF checkpoint dir to start from (else random init)")
    ap.add_argument("--out", required=True, help="output dir (train state + final checkpoint)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--warmup-steps", type=int, default=50)
    ap.add_argument("--weight-decay", type=float, default=0.01)
    ap.add_argument("--mesh", default=None, help="DxT data x model mesh, e.g. 2x4")
    ap.add_argument("--sequence-parallel", action="store_true",
                    help="Megatron-SP: shard per-layer activations along the "
                         "sequence over the model axis (tp x less activation "
                         "memory on long-audio batches; numerically identical)")
    ap.add_argument("--pipeline-stages", type=int, default=None,
                    help="GPipe pipeline parallelism: split the layer stacks "
                         "across N stage devices (layer counts must divide by "
                         "N; mutually exclusive with --mesh/--sequence-parallel)")
    ap.add_argument("--microbatches", type=int, default=2,
                    help="microbatches per step under --pipeline-stages "
                         "(batch-size must divide evenly)")
    ap.add_argument("--save-every", type=int, default=500, help="steps between train-state saves")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the train state in --out if present")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from realtime_whisper_asr_tpu.models import whisper as W
    from realtime_whisper_asr_tpu.models.whisper.checkpoint import (
        is_native_checkpoint,
        load_checkpoint,
        load_train_state,
        save_checkpoint,
        save_train_state,
    )
    from realtime_whisper_asr_tpu.models.whisper.tokenizer import get_tokenizer
    from realtime_whisper_asr_tpu.train import (
        DataPipeline,
        TrainState,
        loss_fn,
        make_sharded_train_step,
        make_train_state,
        prepare_batch,
    )

    # ---- mesh
    pp = args.pipeline_stages
    if pp:
        if args.mesh or args.sequence_parallel:
            raise SystemExit("--pipeline-stages is mutually exclusive with "
                             "--mesh / --sequence-parallel")
        if args.batch_size % args.microbatches:
            raise SystemExit(f"--batch-size {args.batch_size} must divide by "
                             f"--microbatches {args.microbatches}")
        from realtime_whisper_asr_tpu.parallel import make_pp_mesh

        d, t = 1, 1
        mesh = make_pp_mesh(pp)
        logger.info("pipeline mesh: stages=%d microbatches=%d on %s", pp,
                    args.microbatches, jax.devices()[0].platform)
    else:
        if args.mesh:
            d, t = (int(x) for x in args.mesh.lower().split("x"))
        else:
            d, t = 1, 1
        devs = np.array(jax.devices()[: d * t])
        if devs.size < d * t:
            raise SystemExit(f"mesh {d}x{t} needs {d * t} devices, have {len(jax.devices())}")
        mesh = Mesh(devs.reshape(d, t), ("data", "model"))
        logger.info("mesh: data=%d model=%d on %s", d, t, devs[0].platform)

    # ---- model init
    if args.init_checkpoint:
        if is_native_checkpoint(args.init_checkpoint):
            cfg, params = load_checkpoint(args.init_checkpoint, jnp.float32)
        else:
            cfg, params = W.load_checkpoint_dir(args.init_checkpoint, jnp.float32)
        logger.info("initialized %s from %s", cfg.name, args.init_checkpoint)
    else:
        cfg = W.get_config(args.model)
        params = None
        logger.info("random-initializing %s", cfg.name)
    tokenizer = get_tokenizer(cfg, args.init_checkpoint)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup_steps,
        decay_steps=max(args.max_steps or 10_000, args.warmup_steps + 1),
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=args.weight_decay),
    )
    if pp:
        from realtime_whisper_asr_tpu.parallel import (
            make_pp_train_state,
            make_pp_train_step,
            pp_param_shardings,
        )

        for nm, nl in (("encoder", cfg.n_audio_layer), ("decoder", cfg.n_text_layer)):
            if nl % pp:
                raise SystemExit(f"{nm} has {nl} layers, not divisible by "
                                 f"--pipeline-stages {pp}")
        state, optimizer = make_pp_train_state(
            cfg, jax.random.PRNGKey(args.seed), mesh, optimizer=optimizer
        )
        if params is not None:
            params = jax.tree.map(jax.device_put, params,
                                  pp_param_shardings(mesh, params))
            state = TrainState(params, optimizer.init(params), state.step)
        train_step, shard_batch = make_pp_train_step(
            cfg, mesh, n_micro=args.microbatches, optimizer=optimizer
        )
    else:
        state, optimizer = make_train_state(
            cfg, jax.random.PRNGKey(args.seed), mesh=mesh, optimizer=optimizer
        )
        if params is not None:
            from realtime_whisper_asr_tpu.parallel.sharding import whisper_param_shardings

            params = jax.tree.map(jax.device_put, params, whisper_param_shardings(mesh))
            state = TrainState(params, optimizer.init(params), state.step)
        train_step, shard_batch = make_sharded_train_step(
            cfg, mesh, optimizer, sequence_parallel=args.sequence_parallel
        )

    state_dir = os.path.join(args.out, "train_state")
    if args.resume and os.path.isdir(state_dir):
        state = load_train_state(state_dir, state)
        logger.info("resumed at step %d", int(state.step))

    # ---- data
    pipe = DataPipeline(args.manifest, cfg, tokenizer,
                        batch_size=args.batch_size, seed=args.seed)
    # dp sharding needs B % data == 0; drop stragglers when sharded
    # dp needs B % data == 0; pp needs B % microbatches == 0 — both hold only
    # for full batches, so drop stragglers when either is sharded
    pipe.drop_last = d > 1 or bool(pp)

    eval_loss = jax.jit(
        lambda p, mel, ti, to, m: loss_fn(p, cfg, mel, ti, to, m)
    )

    def run_eval(params) -> float:
        vp = DataPipeline(args.val_manifest, cfg, tokenizer,
                          batch_size=args.batch_size, seed=1)
        tot, n = 0.0, 0
        for batch in vp.epochs(1):
            b = prepare_batch(batch, cfg)
            tot += float(eval_loss(params, b["mel"], b["tokens_in"],
                                   b["tokens_out"], b["mask"]))
            n += 1
        return tot / max(n, 1)

    # ---- loop
    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    losses: list[float] = []
    step0 = int(state.step)
    stop = False
    for batch in pipe.epochs(args.epochs):
        b = prepare_batch(batch, cfg, shard_fn=shard_batch)
        state, loss = train_step(state, b)
        losses.append(float(loss))
        step = int(state.step)
        if step % args.log_every == 0:
            logger.info("step %d loss %.4f (%.2f steps/s)", step,
                        float(np.mean(losses[-args.log_every:])),
                        (step - step0) / max(time.time() - t0, 1e-6))
        if args.save_every and step % args.save_every == 0:
            save_train_state(state_dir, state)
            logger.info("saved train state at step %d", step)
        if args.max_steps and step - step0 >= args.max_steps:
            stop = True
            break
    final_loss = float(np.mean(losses[-20:])) if losses else float("nan")

    # ---- save: resumable train state + inference checkpoint
    save_train_state(state_dir, state)
    ckpt_dir = os.path.join(args.out, "checkpoint")
    save_checkpoint(ckpt_dir, jax.device_get(state.params), cfg)
    logger.info("wrote inference checkpoint to %s (load with "
                "TPUWhisperASR(checkpoint_dir=...))", ckpt_dir)

    if args.val_manifest:
        vl = run_eval(state.params)
        logger.info("validation loss: %.4f", vl)
        print(f'{{"final_train_loss": {final_loss:.4f}, "val_loss": {vl:.4f}, '
              f'"steps": {int(state.step)}, "stopped_early": {str(stop).lower()}}}')
    else:
        print(f'{{"final_train_loss": {final_loss:.4f}, "steps": {int(state.step)}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
