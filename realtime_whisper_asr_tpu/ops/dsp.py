"""Device DSP ops: FIR band-pass (vocal isolation) and phase-vocoder stretch.

TPU-native replacements for the reference's scipy Butterworth ``filtfilt``
(85–3400 Hz band-pass, `vocal_separation.py:338-356`) and librosa's
``time_stretch`` (`speech_rate_audio_processor.py:116-123`):

- band-pass: linear-phase windowed-sinc FIR applied by FFT convolution (one
  jitted call; zero phase like filtfilt, no IIR state → static shapes)
- time-stretch: STFT phase vocoder built on the same matmul-DFT machinery as
  the log-mel frontend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000


@functools.lru_cache(maxsize=8)
def fir_bandpass(low_hz: float, high_hz: float, numtaps: int = 513, sampling_rate: int = SR) -> np.ndarray:
    """Linear-phase band-pass FIR via windowed sinc (Hann)."""
    assert numtaps % 2 == 1
    m = np.arange(numtaps) - (numtaps - 1) / 2
    def lowpass(fc):
        x = 2 * fc / sampling_rate
        h = x * np.sinc(x * m)
        return h
    h = lowpass(high_hz) - lowpass(low_hz)
    h *= np.hanning(numtaps)
    # normalize passband gain at the geometric center frequency
    fc = np.sqrt(low_hz * high_hz)
    gain = np.abs(np.sum(h * np.exp(-2j * np.pi * fc / sampling_rate * m)))
    return (h / max(gain, 1e-9)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("low_hz", "high_hz", "numtaps"))
def bandpass_filter(audio: jnp.ndarray, low_hz: float = 85.0, high_hz: float = 3400.0,
                    numtaps: int = 513) -> jnp.ndarray:
    """(N,) float32 -> band-passed (N,), zero-phase, via FFT convolution."""
    h = jnp.asarray(fir_bandpass(low_hz, high_hz, numtaps))
    n = audio.shape[0]
    pad = numtaps // 2
    x = jnp.pad(audio.astype(jnp.float32), (pad, pad), mode="reflect")
    fft_len = int(2 ** np.ceil(np.log2(x.shape[0] + numtaps)))
    X = jnp.fft.rfft(x, fft_len)
    H = jnp.fft.rfft(h, fft_len)
    y = jnp.fft.irfft(X * H, fft_len)
    # linear-phase FIR delay = pad; plus the reflect pad offset
    return y[2 * pad : 2 * pad + n]


@functools.partial(jax.jit, static_argnames=("rate", "n_fft", "hop", "carry_phase"))
def time_stretch(audio: jnp.ndarray, rate: float, n_fft: int = 1024, hop: int = 256,
                 phase_in: jnp.ndarray | None = None, carry_phase: bool = False,
                 phase_at: jnp.ndarray | None = None):
    """Phase-vocoder time stretch; rate>1 speeds up (shorter output).

    Output length ≈ len(audio)/rate. Pitch-preserving, matching librosa
    ``effects.time_stretch`` semantics (reference speech_rate_audio_processor
    .py:116-123). Static output shape per (len, rate) pair.

    ``carry_phase``: streaming mode — the synthesis phase starts from
    ``phase_in`` ((n_fft//2+1,) f32) instead of the chunk's own analysis
    phase, and the call returns ``(out, phase_out)`` where ``phase_out`` is
    the accumulated phase at the crop boundary. Stretching consecutive mic
    chunks independently restarts the vocoder's phase at every boundary —
    a click per chunk; threading phase_out→phase_in keeps the synthesized
    timeline phase-continuous across chunks (pipeline/stretch.py does this).
    """
    audio = audio.astype(jnp.float32)
    n = audio.shape[0]
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    pad = n_fft // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[idx] * window
    stft = jnp.fft.rfft(frames, axis=-1)  # (T, F)

    # resample frame positions at the new rate; synthesize extra tail frames
    # so the cropped [pad, pad+target) region has FULL overlap-add coverage —
    # partial coverage at the edge divides by a small win_acc, which amplifies
    # synthesized-phase incoherence into a click (measured 1.7x input peak)
    target = int(n / rate)
    out_frames = max(int(n_frames / rate), (pad + target + hop - 1) // hop + 1)
    steps = jnp.arange(out_frames) * rate
    lo = jnp.clip(steps.astype(jnp.int32), 0, n_frames - 2)
    # clamp: tail steps can exceed lo+1 once lo saturates at n_frames-2;
    # frac>1 would put a NEGATIVE weight on |stft[lo]| (phase-flipped energy
    # ⇒ click at the very end of any rate<1 stretch)
    frac = jnp.clip((steps - lo)[:, None], 0.0, 1.0)
    mag = (1 - frac) * jnp.abs(stft[lo]) + frac * jnp.abs(stft[lo + 1])

    # phase accumulation: expected per-hop advance + wrapped deviation
    expected = (2 * jnp.pi * hop * jnp.fft.rfftfreq(n_fft))[None, :].astype(jnp.float32)
    dev = jnp.angle(stft[lo + 1]) - jnp.angle(stft[lo]) - expected
    dev = dev - 2 * jnp.pi * jnp.round(dev / (2 * jnp.pi))
    advance = expected + dev  # (out_frames, F)
    if carry_phase:
        phase0 = phase_in.astype(jnp.float32)[None, :]
    else:
        phase0 = jnp.angle(stft[lo[0]])[None, :]
    phases = phase0 + jnp.concatenate(
        [jnp.zeros_like(phase0), jnp.cumsum(advance[:-1], axis=0)], axis=0
    )
    spec = mag * jnp.exp(1j * phases)

    # overlap-add inverse STFT
    out_len = out_frames * hop + n_fft
    wave = jnp.fft.irfft(spec, n_fft, axis=-1) * window
    out = jnp.zeros(out_len, jnp.float32)
    win_acc = jnp.zeros(out_len, jnp.float32)
    pos = jnp.arange(out_frames) * hop
    out = out.at[pos[:, None] + jnp.arange(n_fft)[None, :]].add(wave)
    win_acc = win_acc.at[pos[:, None] + jnp.arange(n_fft)[None, :]].add(window * window)
    out = out / jnp.maximum(win_acc, 1e-6)
    if carry_phase:
        # The NEXT chunk's synthesis frame j sits at padded position j*hop,
        # i.e. its frame pad//hop is the one centered on the join — so the
        # phase to hand over is the one pad//hop frames BEFORE this chunk's
        # content-boundary frame: phases_new[pad//hop] == phases_old[k_join]
        # requires phase_in = phases_old[k_join - pad//hop] (the intervening
        # advances re-accumulate from the new chunk's own analysis). Padded
        # callers (pipeline/stretch.py buckets) pass phase_at = (pad +
        # real_len/rate)//hop as a traced scalar, since their content ends
        # before the padded crop.
        k_join = (phase_at if phase_at is not None
                  else min((pad + target) // hop, out_frames - 1))
        # hand over the phase pad//hop frames BEFORE the join: the next
        # call's frame pad//hop is the one centered on its emitted start, and
        # its own advances re-accumulate the intervening hops (measured: the
        # boundary-frame phase applied at frame 0 made joins WORSE — 8.2x the
        # typical sample-to-sample delta vs 4.9x uncarried vs ~2.5-3.7x here;
        # prepending raw input context on top measured ~2.2x, not worth the
        # extra bucket pressure)
        k_ret = jnp.clip(k_join - pad // hop, 0, out_frames - 1)
        return out[pad : pad + target], phases[k_ret]
    return out[pad : pad + target]
