"""Train the Silero-class VAD on the synthetic corpus and package the weights.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_vad.py \
        [--steps 1500] [--out realtime_whisper_asr_tpu/models/vad/weights/silero_like.npz]

Trains with BCE over per-frame labels (synthetic speech/noise mixtures,
models/vad/synthetic.py), reports held-out AUC against the EnergyVAD baseline
(the accuracy margin the packaged weights must keep — tests/test_vad.py locks
it), and writes the npz the SileroLikeVAD loads by default.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_batch(rng: np.random.Generator, batch: int, seconds: float):
    from realtime_whisper_asr_tpu.models.vad.synthetic import FRAME, synth_example

    n_frames = int(seconds * 16000) // FRAME
    audio = np.zeros((batch, n_frames, FRAME), np.float32)
    labels = np.zeros((batch, n_frames), np.float32)
    for b in range(batch):
        a, l = synth_example(rng, seconds)
        audio[b] = a[: n_frames * FRAME].reshape(n_frames, FRAME)
        labels[b] = l[:n_frames]
    return audio, labels


def auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based ROC AUC (no sklearn dependency)."""
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def eval_auc(prob_fn_factory, rng: np.random.Generator, n_clips: int = 24) -> float:
    from realtime_whisper_asr_tpu.models.vad.synthetic import FRAME, synth_example

    scores, labels = [], []
    for _ in range(n_clips):
        a, l = synth_example(rng, 4.0)
        frames = a[: len(l) * FRAME].reshape(len(l), FRAME)
        vad = prob_fn_factory()
        scores.append(np.asarray(vad(frames), np.float64))
        labels.append(l)
    return auc(np.concatenate(scores), np.concatenate(labels))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "realtime_whisper_asr_tpu",
            "models", "vad", "weights", "silero_like.npz",
        ),
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from realtime_whisper_asr_tpu.models.vad import silero_like as S

    params = S.init_vad_params(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, audio, labels):
        logits = jax.vmap(lambda a: S.vad_sequence_logits(p, a))(audio)  # (B, T)
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    @jax.jit
    def train_step(p, s, audio, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, audio, labels)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for step in range(args.steps):
        audio, labels = make_batch(rng, args.batch, args.seconds)
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(audio), jnp.asarray(labels))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d} loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"wrote {out}")

    # held-out eval (fresh seed): trained model vs EnergyVAD
    from realtime_whisper_asr_tpu.models.vad import EnergyVAD

    eval_rng = np.random.default_rng(args.seed + 10_000)
    trained = eval_auc(lambda: S.SileroLikeVAD.load_npz(out), eval_rng)
    eval_rng = np.random.default_rng(args.seed + 10_000)
    energy = eval_auc(EnergyVAD, eval_rng)
    print(f"held-out AUC: silero_like={trained:.4f} energy={energy:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
