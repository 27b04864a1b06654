"""Train the neural vocal separator on synthetic speech+interference mixtures.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/train_separator.py \
        [--steps 2500] [--arch v2] \
        [--out realtime_whisper_asr_tpu/models/weights/separation_nn.npz]

The reference's neural separation is trained Demucs (`/root/reference/
vocal_separation.py:47-222`); this image has no network for weights, so the
spectral-mask net (models/separation_nn.py) is trained here on generatable
mixtures. Round-3 hard corpus (VERDICT r2 #7): reverberant speech (synthetic
RIRs, RT60 0.1–0.45 s), SNR sweep −10..15 dB, interference drawn from music
beds / hum / tones / noise (models/vad/synthetic.py) plus percussion and
DUAL simultaneous sources. The training target is the (reverberant) speech —
the frontend's job is removing interference for ASR, not dereverberation.

Loss: time-domain L1 + 0.5·log-magnitude spectral L1. Reports held-out
SI-SNR improvement PER CONDITION — the overall margin
tests/test_separation.py locks for the packaged weights.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SR = 16000
CLIP = 16384  # ~1 s @ 16 kHz, the smallest streaming bucket
CONDITIONS = ("music", "hum", "tone", "noise", "percussion", "dual")


def synth_percussion(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """Kick/hat-style impulse train + noise bursts (a beat the chordal music
    bed lacks; broadband transients are the hardest masking case)."""
    n = int(seconds * SR)
    sig = np.zeros(n, np.float32)
    period = int(SR * rng.uniform(0.3, 0.6))
    t_dec = np.exp(-np.arange(2000) / rng.uniform(200, 600))
    for start in range(rng.integers(0, period), n, period):
        end = min(start + 2000, n)
        burst = rng.standard_normal(end - start).astype(np.float32) * t_dec[: end - start]
        f = rng.uniform(60, 120)
        thump = np.sin(2 * np.pi * f * np.arange(end - start) / SR) * t_dec[: end - start]
        sig[start:end] += burst * 0.5 + thump.astype(np.float32)
    peak = np.abs(sig).max() + 1e-9
    return sig / peak


def make_rir(rng: np.random.Generator, rt60: float) -> np.ndarray:
    """Exponentially decaying noise RIR (image-method surrogate)."""
    n = max(int(rt60 * SR), 64)
    h = rng.standard_normal(n).astype(np.float32)
    h *= np.exp(-3.0 * np.log(10) * np.arange(n) / n)
    h[0] = 1.0
    return h / (np.sqrt(np.sum(h**2)) + 1e-9)


def _interference(rng: np.random.Generator, cond: str, seconds: float) -> np.ndarray:
    from realtime_whisper_asr_tpu.models.vad.synthetic import synth_nonspeech

    if cond == "percussion":
        return synth_percussion(rng, seconds)
    if cond == "dual":
        a = _interference(rng, str(rng.choice(CONDITIONS[:5])), seconds)
        b = _interference(rng, str(rng.choice(CONDITIONS[:5])), seconds)
        out = a + b * rng.uniform(0.3, 1.0)
        return out / (np.abs(out).max() + 1e-9)
    # map named conditions onto synth_nonspeech kinds by rejection
    kind_of = {"noise": (0, 1), "hum": (2,), "tone": (3,), "music": (4,)}
    want = kind_of[cond]
    for _ in range(64):
        state = rng.integers(0, 2**31)
        r2 = np.random.default_rng(state)
        kind = int(np.random.default_rng(state).integers(0, 5))
        if kind in want:
            return synth_nonspeech(r2, seconds)
    return synth_nonspeech(rng, seconds)


def make_example(rng: np.random.Generator, cond: str | None = None,
                 snr_db: float | None = None, reverb: bool | None = None):
    """One (mix, target) pair; target = (possibly reverberant) speech."""
    from realtime_whisper_asr_tpu.models.vad.synthetic import synth_speech

    seconds = CLIP / SR
    cond = cond or str(np.random.default_rng(rng.integers(2**31)).choice(CONDITIONS))
    speech, _ = synth_speech(rng, seconds + 0.1)
    speech = speech[:CLIP]
    if reverb if reverb is not None else (rng.random() < 0.35):
        rir = make_rir(rng, rng.uniform(0.1, 0.45))
        speech = np.convolve(speech, rir)[:CLIP].astype(np.float32)
        speech /= np.abs(speech).max() + 1e-9
    noise = _interference(rng, cond, seconds + 0.1)[:CLIP]
    snr = snr_db if snr_db is not None else rng.uniform(-10.0, 15.0)
    sp = np.sqrt(np.mean(speech**2) + 1e-9)
    npow = np.sqrt(np.mean(noise**2) + 1e-9)
    g = (sp / npow) * 10 ** (-snr / 20)
    level = rng.uniform(0.1, 0.9)
    return (speech + g * noise) * level, speech * level, cond


def make_batch(rng: np.random.Generator, batch: int):
    mix = np.zeros((batch, CLIP), np.float32)
    clean = np.zeros((batch, CLIP), np.float32)
    for b in range(batch):
        mix[b], clean[b], _ = make_example(rng)
    return mix, clean


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    s = (np.dot(est, ref) / (np.dot(ref, ref) + 1e-9)) * ref
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + 1e-9) / (np.dot(e, e) + 1e-9)))


def evaluate(sep, seed: int, per_cond: int = 8) -> dict:
    """Held-out SI-SNR improvement by condition (and overall)."""
    out = {}
    gains_all = []
    for cond in CONDITIONS:
        # zlib.crc32, NOT hash(): str hashes are salted per process
        # (PYTHONHASHSEED), which made the held-out corpus — and the locked
        # SI-SNR floor in tests/test_separation.py — vary run to run
        rng = np.random.default_rng((seed, zlib.crc32(cond.encode())))
        gains = []
        for _ in range(per_cond):
            mix, clean, _ = make_example(rng, cond=cond)
            est = sep.separate(mix)
            gains.append(si_snr(est, clean) - si_snr(mix, clean))
        out[cond] = round(float(np.mean(gains)), 2)
        gains_all += gains
    out["overall"] = round(float(np.mean(gains_all)), 2)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", choices=["v1", "v2", "v2s"], default="v2",
                    help="v2s = the 'small' packaged variant (same dilated "
                         "receptive field, ~2.6x fewer MACs)")
    ap.add_argument("--ckpt-every", type=int, default=250,
                    help="save params+opt state every N steps (crash resume)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint .npz written by --ckpt-every to resume from")
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

    if args.arch == "v2":
        params = S.init_separator_params_v2(jax.random.PRNGKey(args.seed))
    elif args.arch == "v2s":
        params = S.init_separator_params_v2(
            jax.random.PRNGKey(args.seed), channels=S.V2_SMALL_CHANNELS
        )
    else:
        params = S.init_separator_params(jax.random.PRNGKey(args.seed))

    rng = np.random.default_rng(args.seed)
    start_step = 0
    if args.resume:
        # restore params FIRST: dil and the optimizer treedef must derive
        # from the checkpoint's architecture, not from --arch's fresh init
        # (resuming a v1 ckpt under the default --arch v2 would otherwise
        # unflatten against the wrong treedef / train with wrong dilations)
        ck = np.load(args.resume, allow_pickle=False)
        params = {k[2:]: jnp.asarray(ck[k]) for k in ck.files if k.startswith("p/")}
    dil, _ = S.arch_of(params)

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    if args.resume:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        opt_leaves = [jnp.asarray(ck[f"o/{i}"]) for i in range(len(leaves))]
        opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)
        start_step = int(ck["step"])
        rng = np.random.default_rng()
        rng.bit_generator.state = json.loads(str(ck["rng"]))
        print(f"resumed from {args.resume} at step {start_step}", flush=True)

    def loss_fn(p, mix, clean):
        est = jax.vmap(lambda a: S.separate_vocals(p, a, dil=dil))(mix)
        l_time = jnp.mean(jnp.abs(est - clean))
        spec_e = jax.vmap(lambda a: S._stft(a)[0])(est)
        spec_c = jax.vmap(lambda a: S._stft(a)[0])(clean)
        l_spec = jnp.mean(jnp.abs(jnp.log1p(jnp.abs(spec_e)) - jnp.log1p(jnp.abs(spec_c))))
        return l_time + 0.5 * l_spec

    @jax.jit
    def train_step(p, s, mix, clean):
        loss, grads = jax.value_and_grad(loss_fn)(p, mix, clean)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    ckpt_path = os.path.abspath(args.out) + ".ckpt.npz"

    def save_ckpt(step: int) -> None:
        blob = {f"p/{k}": np.asarray(v) for k, v in params.items()}
        for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
            blob[f"o/{i}"] = np.asarray(leaf)
        blob["step"] = np.asarray(step)
        blob["rng"] = np.asarray(json.dumps(rng.bit_generator.state))
        tmp = ckpt_path + ".tmp.npz"
        np.savez(tmp, **blob)
        os.replace(tmp, ckpt_path)

    t0 = time.time()
    for step in range(start_step, args.steps):
        mix, clean = make_batch(rng, args.batch)
        params, opt_state, loss = train_step(params, opt_state, jnp.asarray(mix), jnp.asarray(clean))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d} loss {float(loss):.5f} ({time.time()-t0:.0f}s)", flush=True)
        if args.ckpt_every and step and step % args.ckpt_every == 0:
            save_ckpt(step + 1)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"wrote {out}")

    sep = S.NeuralSeparator.load_npz(out)
    sep.use_device = False
    report = evaluate(sep, seed=args.seed + 10_000)
    print("held-out SI-SNR improvement by condition (dB):")
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
