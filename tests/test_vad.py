"""Silero-class VAD: standard-gate cell parity with torch, weight-layout
conversion, streaming-state continuity, and the trained-weights accuracy
margin over the energy baseline (VERDICT round-1 item 3)."""

import numpy as np
import pytest

from realtime_whisper_asr_tpu.models.vad import EnergyVAD, SileroLikeVAD
from realtime_whisper_asr_tpu.models.vad import silero_like as S
from realtime_whisper_asr_tpu.models.vad.synthetic import FRAME, synth_example, synth_speech


def test_torch_layout_converter_and_cell_parity():
    """Convert a torch module stack (Linear/Conv1d/LSTM standard gates) and
    check numerical parity — proof real torch weights drop in losslessly."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    proj = torch.nn.Linear(S.N_FREQ, S.ENC)
    conv = torch.nn.Conv1d(S.ENC, S.ENC, S.CONV_K)
    lstm = torch.nn.LSTM(S.ENC, S.HIDDEN, batch_first=True)
    head = torch.nn.Linear(S.HIDDEN, 1)
    sd = {}
    for name, mod in (("proj", proj), ("conv", conv), ("lstm", lstm), ("head", head)):
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    params = S.params_from_torch_state_dict(sd)

    rng = np.random.default_rng(0)
    frames = rng.standard_normal((20, FRAME)).astype(np.float32) * 0.3

    # torch reference forward (same architecture semantics)
    with torch.no_grad():
        feats = torch.from_numpy(np.asarray(S.frame_features(frames)))
        x = torch.relu(proj(feats))  # (T, ENC)
        xt = torch.cat([torch.zeros(S.CONV_K - 1, S.ENC), x], dim=0)
        y = torch.relu(conv(xt.T[None]))[0].T  # causal via left zero-pad
        out, _ = lstm(y[None])
        want = torch.sigmoid(head(out[0])).numpy()[:, 0]

    got, _ = S.vad_scan(params, frames, S.init_state())
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # and the numpy streaming microkernel agrees too
    vad = SileroLikeVAD(params=params)
    np.testing.assert_allclose(vad(frames), want, atol=1e-5)


def test_streaming_state_continuity():
    """Feeding frame-by-frame must equal one batched scan (conv tail + LSTM
    state carried across calls) — the property per-frame VADIterator use needs."""
    params = {k: np.asarray(v) for k, v in S.init_vad_params(__import__("jax").random.PRNGKey(1)).items()}
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((16, FRAME)).astype(np.float32) * 0.2
    whole = SileroLikeVAD(params=params)(frames)
    vad = SileroLikeVAD(params=params)
    per_frame = np.concatenate([vad(frames[i : i + 1]) for i in range(len(frames))])
    np.testing.assert_allclose(per_frame, whole, atol=1e-6)


def _auc(scores, labels):
    order = np.argsort(scores)
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def _eval_auc(factory, seed=123, n_clips=12):
    rng = np.random.default_rng(seed)
    scores, labels = [], []
    for _ in range(n_clips):
        a, l = synth_example(rng, 4.0)
        frames = a[: len(l) * FRAME].reshape(len(l), FRAME)
        vad = factory()
        scores.append(np.asarray(vad(frames), np.float64))
        labels.append(l)
    return _auc(np.concatenate(scores), np.concatenate(labels))


def test_packaged_weights_exist_and_load_by_default():
    vad = SileroLikeVAD()
    assert vad.trained, "packaged weights missing (tools/train_vad.py output)"


def test_trained_vad_beats_energy_baseline_auc():
    """The committed weights must discriminate speech better than the energy
    heuristic on held-out synthetic data (incl. loud tones/music where energy
    fails) — the margin that makes silero_like default-able."""
    silero_auc = _eval_auc(SileroLikeVAD)
    energy_auc = _eval_auc(EnergyVAD)
    assert silero_auc > 0.93, f"silero_like AUC {silero_auc:.3f}"
    assert silero_auc > energy_auc + 0.05, (silero_auc, energy_auc)


def test_vad_iterator_integration_events():
    """Trained VAD + VADIterator on a speech-silence-speech stream yields
    ordered start/end events (the VAC contract)."""
    from realtime_whisper_asr_tpu.streaming import VADIterator

    rng = np.random.default_rng(7)
    speech, _ = synth_speech(rng, 2.0)
    # force a speech-active signal: take the loudest 1 s stretch
    env = np.convolve(speech**2, np.ones(1600) / 1600, mode="same")
    i0 = int(np.argmax(env))
    burst = speech[max(0, i0 - 8000) : max(0, i0 - 8000) + 16000]
    silence = np.zeros(16000, np.float32)
    stream = np.concatenate([silence, burst, silence, burst, silence])
    it = VADIterator(SileroLikeVAD(), threshold=0.5, min_silence_duration_ms=300)
    events = []
    for i in range(0, len(stream) - 1600, 1600):
        events.extend(it(stream[i : i + 1600]))
    kinds = ["start" if "start" in e else "end" for e in events]
    assert kinds.count("start") >= 2
    # events alternate start/end
    for a, b in zip(kinds, kinds[1:]):
        assert a != b


def test_synth_example_labels_shape():
    rng = np.random.default_rng(0)
    a, l = synth_example(rng, 3.0)
    assert len(a) == 48000 and len(l) == 48000 // FRAME
    assert set(np.unique(l)) <= {0.0, 1.0}
