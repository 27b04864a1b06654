"""Training data pipeline tests: manifest, bucketing, prefetch, determinism."""

import json

import numpy as np
import pytest

from realtime_whisper_asr_tpu.io import write_wav
from realtime_whisper_asr_tpu.models import whisper as W
from realtime_whisper_asr_tpu.models.whisper.tokenizer import MockTokenizer
from realtime_whisper_asr_tpu.train import (
    DataPipeline,
    prepare_batch,
    read_manifest,
    tokenize_example,
)
from realtime_whisper_asr_tpu.train.data import _audio_bucket, _token_bucket

SR = 16000


@pytest.fixture(scope="module")
def cfg():
    return W.get_config("tiny")


@pytest.fixture(scope="module")
def tok(cfg):
    return MockTokenizer(cfg)


def _write_manifest(tmp_path, specs):
    """specs: list of (seconds, text). Returns manifest path."""
    rng = np.random.default_rng(0)
    path = tmp_path / "manifest.jsonl"
    with open(path, "w") as f:
        for i, (sec, text) in enumerate(specs):
            wav = tmp_path / f"clip{i}.wav"
            write_wav(str(wav), rng.standard_normal(int(sec * SR)).astype(np.float32) * 0.1)
            f.write(json.dumps({"wav": str(wav), "text": text, "language": "en"}) + "\n")
    return str(path)


def test_read_manifest_errors(tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"wav": "x"}\n')  # missing text
    with pytest.raises(ValueError):
        read_manifest(str(p))
    (tmp_path / "empty.jsonl").write_text("")
    with pytest.raises(ValueError):
        read_manifest(str(tmp_path / "empty.jsonl"))


def test_tokenize_example_teacher_forcing(cfg, tok):
    ti, to, m = tokenize_example(cfg, tok, "hello world", "en")
    # shifted-by-one alignment
    assert len(ti) == len(to) == len(m)
    np.testing.assert_array_equal(ti[1:], to[:-1])
    assert to[-1] == cfg.eot
    sot_len = len(cfg.sot_sequence("en", "transcribe", timestamps=False))
    # mask covers exactly text+EOT predictions
    assert m.sum() == len(to) - (sot_len - 1)
    assert (m[: sot_len - 1] == 0).all()


def test_truncated_example_keeps_eot_target(tmp_path, cfg, tok):
    """Over-budget examples are cut to max_text_tokens but must still
    supervise termination: the last target position becomes EOT with mask 1
    (a mid-sequence chop would bias fine-tuning toward non-termination)."""
    long_text = " ".join(f"w{i}" for i in range(200))
    man = _write_manifest(tmp_path, [(1.0, long_text)])
    pipe = DataPipeline(man, cfg, tok, batch_size=1, max_text_tokens=32)
    _, ti, to, m = pipe._load_example(pipe.entries[0])
    assert len(ti) == len(to) == len(m) == 32
    assert to[-1] == cfg.eot
    assert m[-1] == 1.0


def test_bucketing_static_shapes(tmp_path, cfg, tok):
    man = _write_manifest(
        tmp_path,
        [(2.0, "a b"), (3.0, "c d e"), (12.0, "f g"), (2.5, "h i j k"), (2.2, "l")],
    )
    pipe = DataPipeline(man, cfg, tok, batch_size=2, seed=1)
    shapes = set()
    total = 0
    for batch in pipe.epochs(1):
        b, nb = batch["audio"].shape
        assert nb in (8 * SR, 16 * SR, 30 * SR)
        assert batch["tokens_in"].shape == batch["tokens_out"].shape == batch["mask"].shape
        assert _token_bucket(batch["tokens_in"].shape[1]) == batch["tokens_in"].shape[1]
        shapes.add((nb, batch["tokens_in"].shape[1]))
        total += b
    assert total == 5  # nothing dropped
    # short clips share the 8 s bucket; the 12 s clip is alone in 16 s
    assert any(nb == 8 * SR for nb, _ in shapes)
    assert any(nb == 16 * SR for nb, _ in shapes)


def test_epoch_shuffling_deterministic(tmp_path, cfg, tok):
    man = _write_manifest(tmp_path, [(1.0, f"t {i}") for i in range(6)])
    p1 = DataPipeline(man, cfg, tok, batch_size=3, seed=7)
    p2 = DataPipeline(man, cfg, tok, batch_size=3, seed=7)
    b1 = [b["tokens_in"].tobytes() for b in p1.epochs(2)]
    b2 = [b["tokens_in"].tobytes() for b in p2.epochs(2)]
    assert b1 == b2
    # different seed should (overwhelmingly) differ
    p3 = DataPipeline(man, cfg, tok, batch_size=3, seed=8)
    b3 = [b["tokens_in"].tobytes() for b in p3.epochs(2)]
    assert b1 != b3


def test_prepare_batch_and_train_step(tmp_path, cfg, tok):
    """End-to-end: manifest → batch → mel → one (unsharded) train step."""
    import jax
    import jax.numpy as jnp
    import optax

    from realtime_whisper_asr_tpu.train import loss_fn

    man = _write_manifest(tmp_path, [(1.0, "x y"), (1.2, "z w")])
    pipe = DataPipeline(man, cfg, tok, batch_size=2, seed=0)
    batch = next(iter(pipe.epochs(1)))
    dev = prepare_batch(batch, cfg)
    assert dev["mel"].shape[0] == 2 and dev["mel"].shape[2] == cfg.n_mels

    params = W.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    loss = loss_fn(params, cfg, dev["mel"].astype(jnp.float32),
                   jnp.asarray(dev["tokens_in"]), jnp.asarray(dev["tokens_out"]),
                   jnp.asarray(dev["mask"]))
    assert np.isfinite(float(loss))


def test_prefetch_surfaces_worker_errors(cfg, tok, tmp_path):
    from realtime_whisper_asr_tpu.train import ManifestEntry

    pipe = DataPipeline([ManifestEntry(wav=str(tmp_path / "missing.wav"), text="x")],
                        cfg, tok, batch_size=1)
    with pytest.raises(Exception):
        list(pipe.epochs(1))


def test_audio_bucket_edges():
    assert _audio_bucket(1) == 8 * SR
    assert _audio_bucket(8 * SR) == 8 * SR
    assert _audio_bucket(8 * SR + 1) == 16 * SR
    assert _audio_bucket(40 * SR) == 30 * SR


def test_finetune_recipe_end_to_end(tmp_path, cfg, tok):
    """tools/finetune.py: manifest -> sharded steps -> resumable train state ->
    native inference checkpoint loadable by TPUWhisperASR. The full training
    story in one run (2x2 mesh on the virtual-device CPU backend)."""
    import sys

    sys.path.insert(0, ".")
    from tools.finetune import main as finetune_main

    rng = np.random.default_rng(0)
    manifest = tmp_path / "train.jsonl"
    with open(manifest, "w") as f:
        for i in range(8):
            wav = tmp_path / f"c{i}.wav"
            write_wav(str(wav), rng.standard_normal(SR).astype(np.float32) * 0.1)
            f.write(json.dumps({"wav": str(wav), "text": f"w{i} w{i + 1}"}) + "\n")

    out = tmp_path / "run"
    rc = finetune_main([
        "--manifest", str(manifest), "--val-manifest", str(manifest),
        "--model", "test-tiny", "--out", str(out),
        "--epochs", "1", "--batch-size", "4", "--lr", "1e-4",
        "--mesh", "2x2", "--save-every", "1", "--log-every", "1",
    ])
    assert rc == 0
    assert (out / "train_state").is_dir()
    assert (out / "checkpoint").is_dir()

    # the produced checkpoint drives inference directly
    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.asr import TPUWhisperASR

    asr = TPUWhisperASR(checkpoint_dir=str(out / "checkpoint"), dtype=jnp.float32)
    asr.transcribe_kargs["max_total_tokens"] = 8
    segs = asr.transcribe(rng.standard_normal(SR).astype(np.float32) * 0.1)
    assert isinstance(segs.tokens, list)

    # resume continues from the saved step
    rc = finetune_main([
        "--manifest", str(manifest), "--model", "test-tiny", "--out", str(out),
        "--epochs", "1", "--batch-size", "4", "--mesh", "2x2", "--resume",
        "--max-steps", "1", "--save-every", "0", "--log-every", "1",
    ])
    assert rc == 0


def test_finetune_pipeline_parallel(tmp_path, cfg, tok):
    """tools/finetune.py --pipeline-stages: the GPipe path trains, saves a
    resumable state, and produces a loadable inference checkpoint (2 stages x
    2 microbatches on the virtual-device CPU backend)."""
    import sys

    sys.path.insert(0, ".")
    from tools.finetune import main as finetune_main

    rng = np.random.default_rng(0)
    manifest = tmp_path / "train.jsonl"
    with open(manifest, "w") as f:
        for i in range(4):
            wav = tmp_path / f"p{i}.wav"
            write_wav(str(wav), rng.standard_normal(SR).astype(np.float32) * 0.1)
            f.write(json.dumps({"wav": str(wav), "text": f"w{i}"}) + "\n")

    out = tmp_path / "pprun"
    rc = finetune_main([
        "--manifest", str(manifest), "--model", "test-tiny", "--out", str(out),
        "--epochs", "1", "--batch-size", "4", "--lr", "1e-4",
        "--pipeline-stages", "2", "--microbatches", "2",
        "--max-steps", "2", "--save-every", "1", "--log-every", "1",
    ])
    assert rc == 0
    assert (out / "checkpoint").is_dir()

    import jax.numpy as jnp

    from realtime_whisper_asr_tpu.asr import TPUWhisperASR

    asr = TPUWhisperASR(checkpoint_dir=str(out / "checkpoint"), dtype=jnp.float32)
    asr.transcribe_kargs["max_total_tokens"] = 8
    segs = asr.transcribe(rng.standard_normal(SR).astype(np.float32) * 0.1)
    assert isinstance(segs.tokens, list)

    # guard-rails: incompatible flag combos fail fast
    with pytest.raises(SystemExit):
        finetune_main([
            "--manifest", str(manifest), "--model", "test-tiny",
            "--out", str(out), "--pipeline-stages", "2", "--mesh", "2x2",
        ])
    with pytest.raises(SystemExit):
        finetune_main([
            "--manifest", str(manifest), "--model", "test-tiny",
            "--out", str(out), "--pipeline-stages", "2",
            "--batch-size", "4", "--microbatches", "3",
        ])
