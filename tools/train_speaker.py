"""Train the speaker embedder on synthetic speakers and package the weights.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_speaker.py \
        [--steps 600] [--out realtime_whisper_asr_tpu/models/weights/speaker_nn.npz]

NT-Xent over batches of P speakers x K utterances (a synthetic "speaker" =
fixed formant anatomy + pitch register, models/vad/synthetic.sample_speaker;
utterances vary phrase/contour/noise). Reports held-out same-vs-different
cosine AUC + the EER threshold, which ships inside the npz as the tracker's
default decision threshold (models/speaker.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def batch_features(rng, n_speakers: int, k: int, snr_prob: float = 0.6):
    from realtime_whisper_asr_tpu.models.speaker import utterance_features
    from realtime_whisper_asr_tpu.models.vad.synthetic import (
        sample_speaker,
        synth_speaker_utterance,
    )

    feats, labels = [], []
    for s in range(n_speakers):
        spk = sample_speaker(rng)
        for _ in range(k):
            snr = float(rng.uniform(5, 25)) if rng.random() < snr_prob else None
            sec = float(rng.uniform(1.2, 3.0))
            a = synth_speaker_utterance(rng, spk, seconds=sec, snr_db=snr)
            feats.append(utterance_features(a))
            labels.append(s)
    return np.stack(feats), np.asarray(labels, np.int32)


def auc_and_eer(sims: np.ndarray, same: np.ndarray) -> tuple[float, float]:
    order = np.argsort(sims)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(sims) + 1)
    pos = same > 0.5
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    a = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    # EER threshold scan
    ths = np.unique(sims)
    best_th, best_gap = 0.5, 1e9
    for th in ths:
        far = float((sims[~pos] >= th).mean())
        frr = float((sims[pos] < th).mean())
        if abs(far - frr) < best_gap:
            best_gap, best_th = abs(far - frr), float(th)
    return float(a), best_th


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--corpus-speakers", type=int, default=160)
    ap.add_argument("--corpus-utts", type=int, default=5)
    ap.add_argument("--speakers-per-batch", type=int, default=24)
    ap.add_argument("--utts-per-speaker", type=int, default=2)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--temp", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "realtime_whisper_asr_tpu", "models",
        "weights", "speaker_nn.npz"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from realtime_whisper_asr_tpu.models.speaker import (
        EMB_DIM,
        FEAT_DIM,
        SpeakerEmbedder,
        init_speaker_params,
    )

    rng = np.random.default_rng(args.seed)

    # pregenerate the corpus ONCE (harmonic synthesis dominates wall time);
    # training then resamples minibatches from the feature matrix
    t_gen = time.time()
    corpus_x, corpus_y = batch_features(rng, args.corpus_speakers, args.corpus_utts)
    print(f"corpus: {len(corpus_x)} utterances / {args.corpus_speakers} speakers "
          f"({time.time() - t_gen:.0f}s)")
    f_mu = corpus_x.mean(axis=0).astype(np.float32)
    f_sd = (corpus_x.std(axis=0) + 1e-6).astype(np.float32)
    corpus_xn = (corpus_x - f_mu) / f_sd
    by_speaker = {s: np.flatnonzero(corpus_y == s) for s in np.unique(corpus_y)}

    params = {k: jnp.asarray(v) for k, v in init_speaker_params(args.seed).items()
              if k.startswith(("w", "b"))}

    def fwd(p, x):
        h = jax.nn.relu(x @ p["w1"] + p["b1"])
        h = jax.nn.relu(h @ p["w2"] + p["b2"])
        e = h @ p["w3"] + p["b3"]
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-9)

    def ntxent(p, x, labels):
        e = fwd(p, x)  # (N, D)
        sims = e @ e.T / args.temp
        n = x.shape[0]
        mask_self = jnp.eye(n, dtype=bool)
        same = labels[:, None] == labels[None, :]
        pos = same & ~mask_self
        logits = jnp.where(mask_self, -1e9, sims)
        logz = jax.nn.logsumexp(logits, axis=1)
        pos_lp = jnp.where(pos, logits, -1e9)
        pos_logz = jax.nn.logsumexp(pos_lp, axis=1)
        return jnp.mean(logz - pos_logz)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    step_fn = jax.jit(
        lambda p, s, x, y: (lambda l, g: (l, *_apply(p, s, g)))(
            *jax.value_and_grad(ntxent)(p, x, y)
        )
    )

    def _apply(p, s, g):
        up, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, up), s2

    t0 = time.time()
    for step in range(1, args.steps + 1):
        spk_ids = rng.choice(len(by_speaker), size=args.speakers_per_batch, replace=False)
        rows = np.concatenate([
            rng.choice(by_speaker[s], size=args.utts_per_speaker, replace=False)
            for s in spk_ids
        ])
        xn, y = corpus_xn[rows], corpus_y[rows]
        loss, params, opt_state = step_fn(params, opt_state, jnp.asarray(xn), jnp.asarray(y))
        if step % 50 == 0 or step == 1:
            print(f"step {step} loss {float(loss):.4f} ({time.time() - t0:.0f}s)")

    # ---- held-out eval: same/diff cosine AUC + EER threshold
    np_params = {k: np.asarray(v) for k, v in params.items()}
    np_params["f_mu"], np_params["f_sd"] = f_mu, f_sd
    eval_rng = np.random.default_rng(args.seed + 1000)
    xs, ys = batch_features(eval_rng, 40, 3, snr_prob=0.5)
    from realtime_whisper_asr_tpu.models.speaker import embed

    e = embed(np_params, xs)
    sims, same = [], []
    for i in range(len(e)):
        for j in range(i + 1, len(e)):
            sims.append(float(np.dot(e[i], e[j])))
            same.append(1.0 if ys[i] == ys[j] else 0.0)
    sims, same = np.asarray(sims), np.asarray(same)
    a, th = auc_and_eer(sims, same)

    # baseline: raw normalized features, cosine
    xr = (xs - f_mu) / f_sd
    xr = xr / np.maximum(np.linalg.norm(xr, axis=1, keepdims=True), 1e-9)
    sims_b = np.asarray([float(np.dot(xr[i], xr[j]))
                         for i in range(len(xr)) for j in range(i + 1, len(xr))])
    ab, _ = auc_and_eer(sims_b, same)
    print(f"held-out speaker AUC: trained {a:.4f} vs raw-feature baseline {ab:.4f}; "
          f"EER threshold {th:.3f}")

    np_params["threshold"] = np.float32(th)
    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    emb = SpeakerEmbedder(params=np_params)
    emb.save_npz(out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
