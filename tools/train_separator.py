"""Train the neural vocal separator on synthetic speech+music mixtures.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_separator.py \
        [--steps 1200] [--out realtime_whisper_asr_tpu/models/weights/separation_nn.npz]

The reference's neural separation is trained Demucs (`/root/reference/
vocal_separation.py:47-222`); this image has no network for weights, so the
compact spectral-mask net (models/separation_nn.py) is trained here on
generatable mixtures: harmonic+formant speech surrogates (models/vad/
synthetic.py) over music beds / tones / hum / noise at random SNR. Loss is
time-domain L1 of the masked reconstruction against clean speech. Reports
held-out SI-SNR improvement over the unprocessed mixture — the margin
tests/test_separation.py locks for the packaged weights.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CLIP = 16384  # ~1 s @ 16 kHz, the smallest streaming bucket


def make_batch(rng: np.random.Generator, batch: int):
    from realtime_whisper_asr_tpu.models.vad.synthetic import synth_nonspeech, synth_speech

    mix = np.zeros((batch, CLIP), np.float32)
    clean = np.zeros((batch, CLIP), np.float32)
    seconds = CLIP / 16000
    for b in range(batch):
        speech, _ = synth_speech(rng, seconds + 0.1)
        noise = synth_nonspeech(rng, seconds + 0.1)
        speech, noise = speech[:CLIP], noise[:CLIP]
        snr_db = rng.uniform(-5.0, 15.0)
        sp = np.sqrt(np.mean(speech**2) + 1e-9)
        npow = np.sqrt(np.mean(noise**2) + 1e-9)
        g = (sp / npow) * 10 ** (-snr_db / 20)
        level = rng.uniform(0.1, 0.9)
        mix[b] = (speech + g * noise) * level
        clean[b] = speech * level
    return mix, clean


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    s = (np.dot(est, ref) / (np.dot(ref, ref) + 1e-9)) * ref
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + 1e-9) / (np.dot(e, e) + 1e-9)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "realtime_whisper_asr_tpu",
            "models", "weights", "separation_nn.npz",
        ),
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from realtime_whisper_asr_tpu.models import separation_nn as S

    params = S.init_separator_params(jax.random.PRNGKey(args.seed))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, mix, clean):
        est = jax.vmap(lambda a: S.separate_vocals(p, a))(mix)
        return jnp.mean(jnp.abs(est - clean))

    @jax.jit
    def train_step(p, s, mix, clean):
        loss, grads = jax.value_and_grad(loss_fn)(p, mix, clean)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for step in range(args.steps):
        mix, clean = make_batch(rng, args.batch)
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(mix), jnp.asarray(clean))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d} loss {float(loss):.5f} ({time.time()-t0:.0f}s)", flush=True)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"wrote {out}")

    # held-out SI-SNR improvement (fresh seed)
    sep = S.NeuralSeparator.load_npz(out)
    eval_rng = np.random.default_rng(args.seed + 10_000)
    gains = []
    for _ in range(16):
        mix, clean = make_batch(eval_rng, 1)
        est = sep.separate(mix[0])
        gains.append(si_snr(est, clean[0]) - si_snr(mix[0], clean[0]))
    print(f"held-out SI-SNR improvement: {np.mean(gains):.2f} dB (n=16)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
