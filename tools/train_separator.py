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


# ---------------------------------------------------------------------------
# 4-stem corpus (VERDICT r3 #5 — reference Demucs drums/bass/other/vocals,
# vocal_separation.py:187-213). Stem order matches separation_nn.STEM_NAMES.

def synth_bass(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """Low-register note line (40–180 Hz fundamentals + one octave), the
    spectral band the drums' thumps overlap — the hard pair to split."""
    n = int(seconds * SR)
    sig = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        dur = min(int(SR * rng.uniform(0.25, 0.8)), n - pos)
        f = rng.uniform(40, 180)
        t = np.arange(dur) / SR
        note = np.sin(2 * np.pi * f * t) + 0.3 * np.sin(2 * np.pi * 2 * f * t)
        env = np.exp(-np.arange(dur) / (SR * rng.uniform(0.15, 0.5)))
        sig[pos : pos + dur] += (note * env).astype(np.float32)
        pos += dur
    return sig / (np.abs(sig).max() + 1e-9)


def make_example_4stem(rng: np.random.Generator, degradation: str | None = None):
    """(mix, stems (4, CLIP)) with random per-stem gains and dropout — the
    softmax mask net must learn both separation and absence. ``degradation``
    optionally passes the mixture through one of DEGRADATIONS (codec /
    compress / bleed / crowd — the real-music conditions, VERDICT r4 #7)."""
    from realtime_whisper_asr_tpu.models.vad.synthetic import synth_speech

    seconds = CLIP / SR
    vocals, _ = synth_speech(rng, seconds + 0.1)
    vocals = vocals[:CLIP]
    if rng.random() < 0.3:
        rir = make_rir(rng, rng.uniform(0.1, 0.4))
        vocals = np.convolve(vocals, rir)[:CLIP].astype(np.float32)
        vocals /= np.abs(vocals).max() + 1e-9
    raw = [
        vocals,
        synth_percussion(rng, seconds),
        synth_bass(rng, seconds),
        _interference(rng, "music", seconds + 0.1)[:CLIP],
    ]
    stems = np.zeros((4, CLIP), np.float32)
    for i, s in enumerate(raw):
        s = np.asarray(s[:CLIP], np.float32)
        rms = np.sqrt(np.mean(s**2) + 1e-9)
        present = rng.random() < (0.95 if i == 0 else 0.75)
        gain_db = rng.uniform(-9.0, 3.0) if i else 0.0
        if present:
            stems[i] = s / rms * 10 ** (gain_db / 20)
    level = rng.uniform(0.02, 0.15)
    stems *= level
    mix = stems.sum(axis=0)
    if degradation is not None:
        mix, stems = apply_degradation(rng, degradation, mix, stems)
    return mix, stems


def make_batch_4stem(rng: np.random.Generator, batch: int,
                     degrade_prob: float = 0.0):
    mix = np.zeros((batch, CLIP), np.float32)
    stems = np.zeros((batch, 4, CLIP), np.float32)
    for b in range(batch):
        deg = None
        if degrade_prob and rng.random() < degrade_prob:
            deg = str(rng.choice(DEGRADATIONS[1:]))
        mix[b], stems[b] = make_example_4stem(rng, degradation=deg)
    return mix, stems


# ---------------------------------------------------------------------------
# Real-music degradations (VERDICT r4 #7): the synthetic 4-stem corpus is
# clean by construction; real music arrives lossy-coded, loudness-war
# compressed, mono-downmixed with inter-channel bleed, and crowd-noised
# (reference variant breadth being approximated: vocal_separation.py:98-129).
# Each degradation transforms the MIXTURE the net sees; targets stay the
# clean stems (SI-SNRi then measures separation under distortion) except
# compression, whose time-varying gain is applied to targets too — a
# separator should not be scored on undoing a mastering gain ride.

DEGRADATIONS = ("clean", "codec", "compress", "bleed", "crowd")


def degrade_codec(rng: np.random.Generator, x: np.ndarray) -> np.ndarray:
    """Lossy-codec surrogate: per-frame spectral hole punching (keep only the
    strongest 8–25 % of bins — perceptual coders drop masked content), a hard
    5.5–7.8 kHz band limit, and an 8–11-bit PCM re-quantization."""
    n = len(x)
    frame, hop = 512, 256
    win = np.hanning(frame).astype(np.float32)
    pad = np.concatenate([x, np.zeros(frame, np.float32)])
    out = np.zeros(n + frame, np.float32)
    wsum = np.zeros(n + frame, np.float32)
    keep = rng.uniform(0.08, 0.25)
    cut_bin = int(rng.uniform(5500.0, 7800.0) / (SR / frame))
    for i in range(0, n, hop):
        seg = pad[i : i + frame] * win
        S = np.fft.rfft(seg)
        mag = np.abs(S)
        S[mag < np.quantile(mag, 1.0 - keep)] = 0
        S[cut_bin:] = 0
        out[i : i + frame] += np.fft.irfft(S).astype(np.float32) * win
        wsum[i : i + frame] += win * win
    y = out[:n] / np.maximum(wsum[:n], 1e-3)
    q = 2.0 ** (1 - int(rng.integers(8, 12)))
    peak = np.abs(y).max() + 1e-9
    return (np.round(y / peak / q) * q * peak).astype(np.float32)


def compress_gain(rng: np.random.Generator, mix: np.ndarray) -> np.ndarray:
    """Loudness-war gain trajectory: one-pole envelope follower (30–150 ms),
    4–10:1 ratio above a program-dependent threshold."""
    from scipy.signal import lfilter

    a = np.exp(-1.0 / (rng.uniform(0.03, 0.15) * SR))
    env = lfilter([1.0 - a], [1.0, -a], np.abs(mix)).astype(np.float32)
    thresh = float(np.quantile(env, rng.uniform(0.3, 0.6))) + 1e-6
    ratio = rng.uniform(4.0, 10.0)
    gain = np.ones_like(env)
    over = env > thresh
    gain[over] = (thresh / env[over]) ** (1.0 - 1.0 / ratio)
    return gain


def degrade_bleed(rng: np.random.Generator, mix: np.ndarray,
                  stems: np.ndarray) -> np.ndarray:
    """Stereo-bleed-to-mono surrogate: each stem leaks a 4–15 ms delayed,
    lowpassed copy into the downmix (comb-filter coloration a mask trained on
    clean sums never saw)."""
    y = mix.copy()
    for s in stems:
        if np.sqrt(np.mean(s**2)) < 1e-6:
            continue
        d = int(rng.uniform(0.004, 0.015) * SR)
        leaked = np.zeros_like(s)
        leaked[d:] = s[:-d]
        leaked = np.convolve(leaked, np.ones(8, np.float32) / 8.0, mode="same")
        y += rng.uniform(0.1, 0.3) * leaked
    return y.astype(np.float32)


def crowd_babble(rng: np.random.Generator, seconds: float) -> np.ndarray:
    """6–10 overlapping speech-like voices (live-recording crowd bed) —
    adversarial for a vocals mask because it IS speech-shaped."""
    from realtime_whisper_asr_tpu.models.vad.synthetic import synth_speech

    n = int(seconds * SR)
    out = np.zeros(n, np.float32)
    for _ in range(int(rng.integers(6, 11))):
        v, _ = synth_speech(rng, seconds + 0.05)
        g = rng.uniform(0.2, 1.0)
        off = int(rng.integers(0, max(1, n // 4)))
        seg = v[: n - off]
        out[off : off + len(seg)] += g * seg
    return out / (np.abs(out).max() + 1e-9)


def apply_degradation(rng: np.random.Generator, deg: str, mix: np.ndarray,
                      stems: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mix', stems') under the named degradation (see DEGRADATIONS)."""
    if deg == "clean":
        return mix, stems
    if deg == "codec":
        return degrade_codec(rng, mix), stems
    if deg == "compress":
        g = compress_gain(rng, mix)
        return (mix * g).astype(np.float32), (stems * g).astype(np.float32)
    if deg == "bleed":
        return degrade_bleed(rng, mix, stems), stems
    if deg == "crowd":
        bed = crowd_babble(rng, len(mix) / SR)[: len(mix)]
        rms = np.sqrt(np.mean(mix**2) + 1e-9)
        return (mix + bed * rms * rng.uniform(0.15, 0.5)).astype(np.float32), stems
    raise ValueError(f"unknown degradation {deg!r}")


def evaluate_4stem(sep, seed: int, n: int = 24) -> dict:
    """Held-out per-stem SI-SNR improvement over the mixture baseline (the
    table VERDICT r3 #5 asks for), plus the 2-stem frontend comparison via
    ``evaluate`` (sep.separate == the vocals stem)."""
    from realtime_whisper_asr_tpu.models.separation_nn import STEM_NAMES

    rng = np.random.default_rng((seed, zlib.crc32(b"4stem")))
    gains = {name: [] for name in STEM_NAMES}
    for _ in range(n):
        mix, stems = make_example_4stem(rng)
        est = sep.separate_stems(mix)
        for i, name in enumerate(STEM_NAMES):
            if np.sqrt(np.mean(stems[i] ** 2)) < 1e-6:
                continue  # stem absent in this example
            gains[name].append(si_snr(est[name], stems[i]) - si_snr(mix, stems[i]))
    return {name: round(float(np.mean(g)), 2) for name, g in gains.items() if g}


def evaluate_4stem_conditions(sep, seed: int, n: int = 16) -> dict:
    """Per-degradation × per-stem SI-SNR improvement table (VERDICT r4 #7 —
    the per-condition table the 2-stem net already has, for the 4-stem head,
    under the real-music degradations)."""
    from realtime_whisper_asr_tpu.models.separation_nn import STEM_NAMES

    table: dict = {}
    for deg in DEGRADATIONS:
        rng = np.random.default_rng((seed, zlib.crc32(deg.encode())))
        gains = {name: [] for name in STEM_NAMES}
        for _ in range(n):
            mix, stems = make_example_4stem(rng, degradation=deg)
            est = sep.separate_stems(mix)
            for i, name in enumerate(STEM_NAMES):
                if np.sqrt(np.mean(stems[i] ** 2)) < 1e-6:
                    continue
                gains[name].append(si_snr(est[name], stems[i]) - si_snr(mix, stems[i]))
        table[deg] = {name: round(float(np.mean(g)), 2)
                      for name, g in gains.items() if g}
    return table


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
    ap.add_argument("--arch", choices=["v1", "v2", "v2s", "v2x4"], default="v2",
                    help="v2s = the 'small' packaged variant (same dilated "
                         "receptive field, ~2.6x fewer MACs); v2x4 = 4-stem "
                         "softmax head (drums/bass/other/vocals, VERDICT r3 #5)")
    ap.add_argument("--degrade-prob", type=float, default=0.0,
                    help="fraction of 4-stem training mixtures passed through "
                         "a random real-music degradation (codec/compress/"
                         "bleed/crowd) — robustness fine-tuning")
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
    elif args.arch == "v2x4":
        params = S.init_separator_params_v2(jax.random.PRNGKey(args.seed), n_stems=4)
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

    n_stems = S.n_stems_of(params)
    if n_stems > 1 and os.path.abspath(args.out) == os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "realtime_whisper_asr_tpu",
                     "models", "weights", "separation_nn.npz")
    ):
        # don't clobber the packaged 2-stem frontend weights with a 4-stem net
        args.out = S.VARIANT_WEIGHTS["4stem"]
        print(f"--arch v2x4 with default --out: writing {args.out}", flush=True)

    def loss_fn(p, mix, clean):
        # clean: (B, CLIP) for 1-stem nets, (B, C, CLIP) for stem nets; the
        # same time-L1 + 0.5*log-magnitude-L1 applies per stem
        if n_stems > 1:
            est = jax.vmap(lambda a: S.separate_stems_device(p, a, dil=dil))(mix)
            spec = jax.vmap(jax.vmap(lambda a: S._stft(a)[0]))
        else:
            est = jax.vmap(lambda a: S.separate_vocals(p, a, dil=dil))(mix)
            spec = jax.vmap(lambda a: S._stft(a)[0])
        l_time = jnp.mean(jnp.abs(est - clean))
        spec_e, spec_c = spec(est), spec(clean)
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
        mix, clean = (
            make_batch_4stem(rng, args.batch, degrade_prob=args.degrade_prob)
            if n_stems > 1 else make_batch(rng, args.batch)
        )
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
    if n_stems > 1:
        report4 = evaluate_4stem(sep, seed=args.seed + 10_000)
        print("held-out per-stem SI-SNR improvement (dB):")
        print(json.dumps(report4, indent=1))
        table = evaluate_4stem_conditions(sep, seed=args.seed + 10_000)
        print("per-degradation per-stem SI-SNR improvement (dB):")
        print(json.dumps(table, indent=1))
        # the vocals stem doubles as the ASR frontend: score it on the SAME
        # 2-stem hard corpus the packaged default is locked against
        report = evaluate(sep, seed=args.seed + 10_000)
        print("vocals-as-frontend SI-SNR improvement by condition (dB):")
        print(json.dumps(report, indent=1))
    else:
        report = evaluate(sep, seed=args.seed + 10_000)
        print("held-out SI-SNR improvement by condition (dB):")
        print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
