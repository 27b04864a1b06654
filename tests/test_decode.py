"""Decode-loop tests: timestamp grammar, EOT handling, prompts, offline ASR API.

Random weights (test-tiny config) — assertions are structural: the logit-filter
grammar must hold for ANY model, which makes it a strong test of the filter
masks without needing real checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_whisper_asr_tpu.asr import TPUWhisperASR, Segment
from realtime_whisper_asr_tpu.models import whisper as W
from realtime_whisper_asr_tpu.models.whisper import decode as D
from realtime_whisper_asr_tpu.models.whisper.tokenizer import MockTokenizer


@pytest.fixture(scope="module")
def asr():
    return TPUWhisperASR(cfg=W.get_config("test-tiny"), model_size="test-tiny",
                         dtype=jnp.float32, word_timestamps=True)


def _audio(seconds=4.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000
    return (0.3 * np.sin(2 * np.pi * 300 * t) + 0.1 * rng.standard_normal(t.shape)).astype(
        np.float32
    )


def test_timestamp_grammar(asr):
    cfg = asr.cfg
    xa = asr._encode_window(_audio())
    res = D.greedy_decode(asr.params, cfg, xa, D.DecodeOptions(timestamps=True))
    ids = res.tokens[0][: res.lengths[0]].tolist()
    # random weights may never sample EOT; then the loop must stop at max_new
    assert ids[-1] == cfg.eot or len(ids) == D.DecodeOptions().max_new_tokens
    body = ids[:-1] if ids[-1] == cfg.eot else ids
    assert body, "decoded nothing"
    ts0 = cfg.timestamp_begin
    # rule: first sampled token is a timestamp within max_initial_timestamp
    assert body[0] >= ts0 and body[0] <= ts0 + 50
    # rule: monotonic timestamps
    ts = [t for t in body if t >= ts0]
    assert ts == sorted(ts)
    # rule: no two consecutive timestamps followed by a third
    for a, b, c in zip(body, body[1:], body[2:]):
        assert not (a >= ts0 and b >= ts0 and c >= ts0)
    # rule: suppressed specials never sampled
    for t in body:
        assert t not in {cfg.sot, cfg.sot_prev, cfg.sot_lm, cfg.no_speech, cfg.no_timestamps}


def test_no_timestamps_mode(asr):
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=1))
    res = D.greedy_decode(asr.params, cfg, xa, D.DecodeOptions(timestamps=False))
    ids = res.tokens[0][: res.lengths[0]].tolist()
    assert all(t < cfg.timestamp_begin for t in ids[:-1])
    assert res.avg_logprob[0] <= 0.0


def test_prompt_bucketing_no_retrace(asr):
    """Different prompt lengths within one bucket must hit the same trace."""
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=2))
    opts = D.DecodeOptions(timestamps=True)
    before = D._greedy_loop._cache_size()
    D.greedy_decode(asr.params, cfg, xa, opts, prompt_tokens=[100, 200, 300])
    mid = D._greedy_loop._cache_size()
    D.greedy_decode(asr.params, cfg, xa, opts, prompt_tokens=[111, 222])
    D.greedy_decode(asr.params, cfg, xa, opts, prompt_tokens=[1, 2, 3, 4])
    after = D._greedy_loop._cache_size()
    assert mid == before + 1
    assert after == mid  # same bucket -> no retrace


def test_prefix_forced_decode_matches_unforced(asr):
    """Forcing the greedy path's own prefix must reproduce the same transcript
    (grammar state seeded correctly through the prefill)."""
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=7))
    opts = D.DecodeOptions(timestamps=True, max_new_tokens=48)
    base = D.greedy_decode(asr.params, cfg, xa, opts)
    base_ids = base.tokens[0][: base.lengths[0]].tolist()
    body = base_ids[:-1] if base_ids[-1] == cfg.eot else base_ids
    if len(body) < 8:
        pytest.skip("random model decoded too little to split")
    k = len(body) // 2
    forced = D.greedy_decode(asr.params, cfg, xa, opts, prefix_tokens=body[:k])
    forced_ids = forced.tokens[0][: forced.lengths[0]].tolist()
    # note: bucketed prefill position shifts can perturb logits at f32 noise
    # level; require agreement over the vast majority of the continuation
    n_match = sum(a == b for a, b in zip(forced_ids, base_ids))
    assert n_match >= 0.9 * min(len(forced_ids), len(base_ids))


def test_prefix_with_word_timestamps(asr):
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=8))
    opts = D.DecodeOptions(timestamps=True, word_timestamps=True, max_new_tokens=32)
    base = D.greedy_decode(asr.params, cfg, xa, opts)
    ids = base.tokens[0][: base.lengths[0]].tolist()
    body = ids[:-1] if ids and ids[-1] == cfg.eot else ids
    if len(body) < 6:
        pytest.skip("too short")
    res = D.greedy_decode(asr.params, cfg, xa, opts, prefix_tokens=body[:4])
    assert res.xattn is not None
    # xattn rows must cover prefix + sampled tokens
    assert res.xattn.shape[1] >= res.lengths[0] - 1


def test_transcribe_segments(asr):
    segs = asr.transcribe(_audio(6.0, seed=3))
    assert isinstance(segs, list)
    for s in segs:
        assert isinstance(s, Segment)
        assert 0.0 <= s.start <= s.end <= 31.0
        for w in s.words:
            assert s.start - 0.5 <= w.start <= w.end or w.start <= w.end
    words = asr.ts_words(segs)
    begs = [b for b, e, w in words]
    assert begs == sorted(begs)
    ends = asr.segments_end_ts(segs)
    assert ends == sorted(ends)


def test_transcribe_with_prompt_and_translate(asr):
    asr.set_translate_task()
    try:
        segs = asr.transcribe(_audio(2.0, seed=4), init_prompt="w100 w200 w300")
        assert isinstance(segs, list)
    finally:
        asr.task = "transcribe"


def test_detect_language(asr):
    lang, prob = asr.detect_language(_audio(2.0, seed=5))
    assert lang in W.LANGUAGES
    assert 0.0 < prob <= 1.0


def test_mock_tokenizer_roundtrip():
    tok = MockTokenizer(W.get_config("test-tiny"))
    ids = [5, 17, 30000]
    assert tok.encode(tok.decode(ids)) == ids


def test_beam_decode_runs_and_respects_grammar(asr):
    from realtime_whisper_asr_tpu.models.whisper.beam import beam_decode

    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=11))
    opts = D.DecodeOptions(timestamps=True, beam_size=3, max_new_tokens=32,
                           word_timestamps=True)
    res = beam_decode(asr.params, cfg, xa, opts)
    ids = res.tokens[0][: res.lengths[0]].tolist()
    body = ids[:-1] if ids and ids[-1] == cfg.eot else ids
    assert body
    ts0 = cfg.timestamp_begin
    ts = [t for t in body if t >= ts0]
    assert ts == sorted(ts)
    assert res.xattn is not None and res.xattn.shape[1] >= len(body)
    # beam keeps cumulative scores in the same regime as greedy (beam ≥ greedy
    # is NOT a theorem once the greedy path leaves the beam; random weights
    # produce near-flat distributions where that happens constantly)
    greedy = D.greedy_decode(asr.params, cfg, xa,
                             D.DecodeOptions(timestamps=True, max_new_tokens=32))
    assert res.sum_logprob[0] >= greedy.sum_logprob[0] * 1.2


def test_beam_with_forced_prefix(asr):
    """beam_size>1 × prefix_ids (the incremental-prefix streaming mode): the
    forced prefix must survive verbatim at the front of the winner and the
    continuation must keep the timestamp grammar (VERDICT #5 interplay;
    the prefill seeds every beam with the same forced tokens, beam.py:88)."""
    from realtime_whisper_asr_tpu.models.whisper.beam import beam_decode

    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=12))
    opts = D.DecodeOptions(timestamps=True, beam_size=3, max_new_tokens=24)
    base = beam_decode(asr.params, cfg, xa, opts)
    ids = base.tokens[0][: base.lengths[0]].tolist()
    body = ids[:-1] if ids and ids[-1] == cfg.eot else ids
    if len(body) < 6:
        pytest.skip("random model decoded too little to split")
    k = len(body) // 2
    res = beam_decode(asr.params, cfg, xa, opts, prefix_tokens=body[:k])
    out = res.tokens[0][: res.lengths[0]].tolist()
    assert out[:k] == body[:k]  # forced prefix is verbatim
    ts0 = cfg.timestamp_begin
    ts = [t for t in out if t >= ts0]
    assert ts == sorted(ts)  # grammar state seeded through the prefix


def test_beam_fused_capture_matches_eager_span(asr):
    """The winner's alignment capture is accumulated IN the decode loop
    (per-step rows gathered with the cache on beam reselect, prefill rows
    reused at batch 1 — round 4 retired the second re-prefill pass, VERDICT
    r3 #4). Every row except the last must equal an eager decode_span capture
    of the same winning span to uint8 resolution; the final row follows the
    greedy convention (repeat-padded at the loop bound / zeros when every
    beam froze before the EOT query step, decode.py _unpack_packed_rows)."""
    import jax.numpy as jnp2

    from realtime_whisper_asr_tpu.models.whisper import decode as D2
    from realtime_whisper_asr_tpu.models.whisper import model as M
    from realtime_whisper_asr_tpu.models.whisper.beam import beam_decode

    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=13))
    opts = D.DecodeOptions(timestamps=True, beam_size=3, max_new_tokens=16,
                           word_timestamps=True)
    res = beam_decode(asr.params, cfg, xa, opts)
    seq = res.tokens[0][: res.lengths[0]]
    init, _, n_prefix = D.build_initial_tokens(cfg, opts, None, None)
    p = len(init)
    max_new, _ = D.plan_decode_budget(cfg, opts, p, n_prefix)
    # rebuild the exact span the device program captured: bucketed init ++
    # sampled body (tokens after the prefix), EOT-padded to max_new
    body = seq[n_prefix:]
    span = np.full(p + max_new, cfg.eot, np.int32)
    span[:p] = init
    span[p : p + len(body)] = body
    amask = D2._amask_dev(cfg, None)
    cache = M.init_cache(asr.params, cfg, jnp2.asarray(xa), text_ctx=len(span))
    _, _, cap = M.decode_span(
        asr.params, cfg, jnp2.asarray(span)[None], jnp2.int32(0), cache,
        alignment_mask=amask,
    )
    ref = np.asarray(cap)[0, p - n_prefix : p - n_prefix + len(seq)]
    got = res.xattn[0]
    assert got.shape == ref.shape, (got.shape, ref.shape)
    # uint8 quantization: half a step + float slack
    np.testing.assert_allclose(got[:-1], ref[:-1], atol=1.0 / 255.0)
    last_ok = (
        np.allclose(got[-1], ref[-1], atol=1.0 / 255.0)  # loop computed it
        or np.allclose(got[-1], got[-2], atol=1.0 / 255.0)  # repeat-padded
        or not got[-1].any()  # all beams froze before the EOT query step
    )
    assert last_ok


def test_beam_batch_matches_sequential(asr):
    """Batched beam (vmapped rows) must produce each row's single-stream beam
    result exactly — beam is a first-class serving mode, not batch-1 only."""
    from realtime_whisper_asr_tpu.models.whisper.beam import (
        beam_decode,
        beam_decode_batch,
    )

    cfg = asr.cfg
    opts = D.DecodeOptions(timestamps=True, beam_size=3, max_new_tokens=16,
                           word_timestamps=True)
    xa1, xa2 = asr._encode_window(_audio(seed=21)), asr._encode_window(_audio(seed=22))
    stable = D.greedy_decode(asr.params, cfg, xa1, opts).tokens[0][:3].tolist()
    reqs = [
        {"prompt_tokens": None, "prefix_tokens": stable},
        {"prompt_tokens": None, "prefix_tokens": None},
    ]
    xab = jnp.concatenate([xa1, xa2], axis=0)
    got = beam_decode_batch(asr.params, cfg, xab, opts, reqs)
    # single-row references at the SAME planned (bucketed) prefill length —
    # a different prompt bucket legitimately shifts decode positions
    rows, p, max_new, cap = D.plan_batch_aux(cfg, opts, reqs)
    for i, xa in enumerate((xa1, xa2)):
        (ref,) = beam_decode_batch(
            asr.params, cfg, xa, opts, [reqs[i]],
            planned=([rows[i]], p, max_new, cap),
        )
        li, lr = int(got[i].lengths[0]), int(ref.lengths[0])
        assert li == lr, (i, got[i].tokens, ref.tokens)
        np.testing.assert_array_equal(got[i].tokens[0][:li], ref.tokens[0][:lr])
        assert got[i].xattn is not None


def test_beam_with_kv_quant_runs_and_respects_grammar(asr):
    """VERDICT r2 #5: beam no longer strips kv_quant — int8 KV beams obey the
    same timestamp grammar and produce a usable result."""
    from realtime_whisper_asr_tpu.models.whisper.beam import beam_decode

    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=23))
    opts = D.DecodeOptions(timestamps=True, beam_size=3, max_new_tokens=16)
    res = beam_decode(asr.params, cfg, xa, opts, kv_quant=True)
    ids = res.tokens[0][: res.lengths[0]].tolist()
    body = ids[:-1] if ids and ids[-1] == cfg.eot else ids
    assert body
    ts0 = cfg.timestamp_begin
    ts = [t for t in body if t >= ts0]
    assert ts == sorted(ts)


def test_beam_reaches_batched_serving_path(asr):
    """transcribe_batch with beam_size > 1 routes through the batched beam
    dispatch/finalize — the serving scheduler needs no special casing."""
    old_beam = asr.beam_size
    asr.beam_size = 3
    try:
        items = [
            {"key": "b1", "audio": _audio(seconds=2.0, seed=24)},
            {"key": "b2", "audio": _audio(seconds=2.0, seed=25)},
        ]
        st = asr.transcribe_batch_dispatch(items)
        assert st["handle"].get("beam") is True
        out = asr.transcribe_batch_finalize(st)
        assert len(out) == 2
        for r in out:
            assert isinstance(r.tokens, list)
    finally:
        asr.beam_size = old_beam
        for k in ("b1", "b2"):
            asr.drop_stream(k)


def test_temperature_sampling_differs_and_is_seeded(asr):
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=12))
    o = D.DecodeOptions(timestamps=False, max_new_tokens=16, temperature=0.8)
    import realtime_whisper_asr_tpu.models.whisper.decode as DD
    init, sot, npfx = DD.build_initial_tokens(cfg, o)
    import jax.numpy as jnp
    # prepacked aux rows carry the temperature VALUE themselves (it rides as
    # a traced scalar; opts.temperature is only the sampled/argmax jit key)
    a1 = jnp.asarray(DD.pack_aux(init, npfx, sot, -1, seed=1, temperature=o.temperature))
    a2 = jnp.asarray(DD.pack_aux(init, npfx, sot, -1, seed=2, temperature=o.temperature))
    r1 = D.greedy_decode(asr.params, cfg, xa, o, aux_device=a1)
    r1b = D.greedy_decode(asr.params, cfg, xa, o, aux_device=a1)
    r2 = D.greedy_decode(asr.params, cfg, xa, o, aux_device=a2)
    assert np.array_equal(r1.tokens, r1b.tokens)  # same seed -> deterministic
    assert not np.array_equal(r1.tokens, r2.tokens)  # different seed -> differs


def test_combo_int8_prefix_word_timestamps(asr):
    """The production large-model combo: quantized decoder + forced prefix +
    timestamps + DTW capture, all in one decode."""
    from realtime_whisper_asr_tpu.models.whisper.quant import quantize_decoder

    cfg = asr.cfg
    qparams = quantize_decoder(asr.params)
    xa = asr._encode_window(_audio(seed=21))
    opts = D.DecodeOptions(timestamps=True, word_timestamps=True,
                           max_new_tokens=32, max_total_tokens=48)
    base = D.greedy_decode(qparams, cfg, xa, opts)
    ids = base.tokens[0][: base.lengths[0]].tolist()
    body = ids[:-1] if ids and ids[-1] == cfg.eot else ids
    if len(body) < 6:
        import pytest as _pytest

        _pytest.skip("too short")
    res = D.greedy_decode(qparams, cfg, xa, opts, prefix_tokens=body[:5])
    n = int(res.lengths[0])
    # exact budget: prefix(5) + generated <= max_total(48)
    assert n <= 48 + 1  # +1 tolerates the EOT slot
    assert res.xattn is not None and res.xattn.shape[1] >= n - 1
    ts0 = cfg.timestamp_begin
    got = res.tokens[0][:n].tolist()
    ts = [t for t in got if t >= ts0]
    assert ts == sorted(ts)


def test_token_density_cap(asr):
    """max_tokens_per_second caps the per-window transcript at
    8 + rate x window_seconds (anti-hallucination guard; random weights
    never emit EOT, so without the cap decode runs to max_new_tokens)."""
    audio = _audio(seconds=2.0, seed=31)
    asr.max_tokens_per_second = 4.0
    asr.transcribe_kargs["max_new_tokens"] = 96
    try:
        res = asr.transcribe(audio)
    finally:
        asr.max_tokens_per_second = None
        asr.transcribe_kargs.pop("max_new_tokens", None)
    # cap = 8 + 4*2 = 16 tokens for the 2 s window
    assert len(res.tokens) <= 16, len(res.tokens)
    # disabled -> runs past the density cap
    res2 = asr.transcribe(audio)
    assert len(res2.tokens) > 16


def test_token_density_cap_batched_per_row(asr):
    """transcribe_batch folds max_tokens_per_second into each ROW's dynamic
    max_new_cap (aux bundle) — per-row window lengths get per-row caps, and
    the cap no longer rides static opts (which minted a new XLA program per
    distinct window length). Random weights never emit EOT, so each row runs
    exactly to its own cap."""
    short = _audio(seconds=2.0, seed=31)   # cap = 8 + 4*2 = 16
    long = _audio(seconds=4.0, seed=32)    # cap = 8 + 4*4 = 24
    asr.max_tokens_per_second = 4.0
    asr.transcribe_kargs["max_new_tokens"] = 96
    try:
        res = asr.transcribe_batch([
            {"key": "a", "audio": short},
            {"key": "b", "audio": long},
        ])
    finally:
        asr.max_tokens_per_second = None
        asr.transcribe_kargs.pop("max_new_tokens", None)
    assert len(res) == 2
    n_short, n_long = len(res[0].tokens), len(res[1].tokens)
    assert n_short <= 16, n_short
    assert n_long <= 24, n_long
    # the longer window's looser cap is actually granted (not the group min)
    assert n_long > 16, n_long


def test_max_total_tokens_enforced_exactly(asr):
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=22))
    opts = D.DecodeOptions(timestamps=False, max_new_tokens=224, max_total_tokens=7)
    res = D.greedy_decode(asr.params, cfg, xa, opts)
    body = res.tokens[0][: res.lengths[0]].tolist()
    if body and body[-1] == cfg.eot:
        body = body[:-1]
    assert len(body) <= 7, f"cap violated: {len(body)} tokens"


def test_batched_decode_matches_sequential(asr):
    """greedy_decode_batch over rows at DIFFERENT streaming states (no prefix /
    forced prefix / prompt) must reproduce each row's sequential decode —
    batching is the serving capacity lever and must be a pure reshape."""
    cfg = asr.cfg
    opts = D.DecodeOptions(timestamps=True, word_timestamps=True, max_new_tokens=16)

    xs = [_audio(seed=s) for s in (0, 1, 2)]
    xas = [asr._encode_window(x) for x in xs]

    # sequential references with batch-compatible prefill bucket:
    # row 1's prefix decode -> take its stable tokens
    ref0 = D.greedy_decode(asr.params, cfg, xas[0], opts)
    stable = ref0.tokens[0][:6].tolist()
    requests = [
        {"prompt_tokens": None, "prefix_tokens": None, "seed": 0},
        {"prompt_tokens": None, "prefix_tokens": stable, "seed": 0},
        {"prompt_tokens": [41, 42, 43], "prefix_tokens": None, "seed": 0},
    ]
    rows, p, _, _ = D.plan_batch_aux(cfg, opts, requests)
    # parity contract: batched == sequential AT THE SAME prefill bucket (bucket
    # padding shifts position embeddings, so differing buckets differ legally)
    seq = [
        D.greedy_decode(
            asr.params, cfg, xas[i], opts,
            prompt_tokens=requests[i]["prompt_tokens"],
            prefix_tokens=requests[i]["prefix_tokens"],
            bucket=p,
        )
        for i in range(3)
    ]

    import jax.numpy as jnp2
    xa_batch = jnp2.concatenate(xas, axis=0)
    got = D.greedy_decode_batch(asr.params, cfg, xa_batch, opts, requests)

    assert len(got) == 3
    for i in range(3):
        li, ls = int(got[i].lengths[0]), int(seq[i].lengths[0])
        assert li == ls, (i, got[i].tokens[0][:li], seq[i].tokens[0][:ls])
        np.testing.assert_array_equal(got[i].tokens[0][:li], seq[i].tokens[0][:ls])
        assert got[i].xattn is not None and got[i].xattn.shape == seq[i].xattn.shape
        np.testing.assert_allclose(
            got[i].no_speech_prob, seq[i].no_speech_prob, atol=1e-5
        )


def test_asr_transcribe_batch_end_to_end(asr):
    """transcribe_batch: B streams with per-stream device buffers, one
    bundled upload, batched encode+decode, per-stream segment parsing."""
    items = [
        {"key": "s1", "audio": _audio(seconds=3.0, seed=0)},
        {"key": "s2", "audio": _audio(seconds=5.0, seed=1), "init_prompt": "w3 w4"},
        {"key": "s3", "audio": _audio(seconds=2.0, seed=2)},
    ]
    asr.transcribe_kargs["max_total_tokens"] = 12
    try:
        out = asr.transcribe_batch(items)
    finally:
        asr.transcribe_kargs.pop("max_total_tokens", None)
    assert len(out) == 3
    for res in out:
        assert isinstance(res.tokens, list)
        for seg in res:
            assert seg.end >= seg.start
    # per-stream device buffers exist for every key (B was padded to 4 with a
    # duplicated row, which must not corrupt stream state)
    for key in ("s1", "s2", "s3"):
        dev_buf, mirror = asr._buffers[key]
        assert len(mirror) > 0
    # growing one stream's audio afterwards still works (append path)
    asr.set_active_stream("s2")
    more = np.concatenate([items[1]["audio"], _audio(seconds=1.0, seed=3)])
    res2 = asr.transcribe(more, init_prompt="w3 w4")
    assert isinstance(res2.tokens, list)


def test_asr_batch_of_one_equals_transcribe(asr):
    audio = _audio(seconds=3.0, seed=5)
    asr.set_active_stream("solo")
    ref = asr.transcribe(audio)
    got = asr.transcribe_batch([{"key": "solo", "audio": audio}])[0]
    assert got.tokens == ref.tokens


def test_beam_with_prefix_and_cap(asr):
    """Beam + forced prefix + exact total cap (weak-spot interplay from the
    round-1 review): prefix must survive verbatim, grammar must hold, and the
    cap must bound prefix+generated."""
    from realtime_whisper_asr_tpu.models.whisper.beam import beam_decode

    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=21))
    base = D.greedy_decode(asr.params, cfg, xa, D.DecodeOptions(timestamps=True, max_new_tokens=24))
    ids = base.tokens[0][: base.lengths[0]].tolist()
    body = ids[:-1] if ids and ids[-1] == cfg.eot else ids
    if len(body) < 6:
        pytest.skip("too short")
    prefix = body[:5]
    opts = D.DecodeOptions(timestamps=True, beam_size=3, max_new_tokens=24,
                           max_total_tokens=12, word_timestamps=True)
    res = beam_decode(asr.params, cfg, xa, opts, prefix_tokens=prefix)
    out = res.tokens[0][: res.lengths[0]].tolist()
    assert out[:5] == prefix
    body2 = out[:-1] if out[-1] == cfg.eot else out
    assert len(body2) <= 12
    ts0 = cfg.timestamp_begin
    ts = [t for t in body2 if t >= ts0]
    assert ts == sorted(ts)
    assert res.xattn is not None


def test_beam_with_temperature_ladder(asr):
    """beam_size>1 + temperature_fallback: the ladder re-decodes with greedy
    SAMPLING at rising temperature (faster-whisper switches decode modes the
    same way) and must return a parseable result + advance the seed."""
    asr.beam_size = 3
    asr.temperature_fallback = True
    asr.logprob_threshold = 1e9  # force 'bad' -> full ladder engages
    seed0 = asr._sample_seed
    try:
        segs = asr.transcribe(_audio(3.0, seed=22))
        assert isinstance(segs.tokens, list)
        assert asr._sample_seed == seed0 + 5  # 0.2..1.0 retries, seeded
    finally:
        asr.beam_size = 1
        asr.temperature_fallback = False
        asr.logprob_threshold = -1.0
        asr._sample_seed = seed0


def test_fused_qkv_matches_unfused():
    """quant.fuse_qkv is an exact inference-time rewrite: same tokens, logits,
    and xattn as the canonical layout, dense and int8."""
    from realtime_whisper_asr_tpu.models.whisper.quant import fuse_qkv, quantize_decoder

    cfg = W.get_config("test-tiny")
    params = W.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 2 * cfg.n_audio_ctx, cfg.n_mels)) * 0.3,
                      jnp.float32)
    opts = D.DecodeOptions(timestamps=True, word_timestamps=True, max_new_tokens=16)

    for transform in (lambda p: p, quantize_decoder):
        base = transform(params)
        fused = fuse_qkv(base)
        # fused tree really dropped the separate projections
        assert "wqkv" in jax.tree.leaves(
            {"k": list(fused["decoder"]["blocks"]["attn"].keys())}, is_leaf=lambda x: isinstance(x, list)
        )[0]
        xa = W.encode(base, cfg, mel)
        xa_f = W.encode(fused, cfg, mel)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xa_f), atol=1e-5)
        ref = D.greedy_decode(base, cfg, xa, opts)
        got = D.greedy_decode(fused, cfg, xa_f, opts)
        n = int(ref.lengths[0])
        assert int(got.lengths[0]) == n
        np.testing.assert_array_equal(got.tokens[0][:n], ref.tokens[0][:n])
        np.testing.assert_allclose(got.xattn, ref.xattn, atol=1e-4)


def test_upload_planner_grow_shift_full(asr):
    """The per-tick upload plan must pick grow (append), shift (front trim,
    device-side), or full — and the device buffer must equal the s16-quantized
    audio regardless of which path ran."""
    from realtime_whisper_asr_tpu import asr as A

    rng = np.random.default_rng(7)
    a = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    b = (rng.standard_normal(8000) * 0.2).astype(np.float32)
    c = (rng.standard_normal(4000) * 0.2).astype(np.float32)

    def expected(audio):
        q = np.clip(np.round(audio * 32768.0), -32768, 32767) / 32768.0
        return q.astype(np.float32)

    key = "planner-test"
    asr.set_active_stream(key)
    aux = np.zeros(A.D.AUX_LEN, np.float32)

    plan = asr._plan_upload(key, a)
    assert plan["kind"] == "full"
    asr._sync_audio_and_aux(a, aux)
    buf = np.asarray(asr._buffers[key][0])
    np.testing.assert_array_equal(buf[: len(a)], expected(a))
    assert (buf[len(a) :] == 0).all()

    ab = np.concatenate([a, b])
    assert asr._plan_upload(key, ab)["kind"] == "grow"
    asr._sync_audio_and_aux(ab, aux)
    buf = np.asarray(asr._buffers[key][0])
    np.testing.assert_array_equal(buf[: len(ab)], expected(ab))

    k = 6000
    trimmed = np.concatenate([ab[k:], c])
    assert asr._plan_upload(key, trimmed)["kind"] == "shift"
    asr._sync_audio_and_aux(trimmed, aux)
    buf = np.asarray(asr._buffers[key][0])
    np.testing.assert_array_equal(buf[: len(trimmed)], expected(trimmed))
    assert (buf[len(trimmed) :] == 0).all()

    # unrelated audio: back to full
    d = (rng.standard_normal(12000) * 0.2).astype(np.float32)
    assert asr._plan_upload(key, d)["kind"] == "full"
    asr.drop_stream(key)


def test_prefetch_audio_makes_tick_upload_aux_only(asr):
    """prefetch_audio lands the buffer off the tick path; the tick's plan then
    degenerates to an empty-words grow (aux-only blob), the device ring holds
    the right audio, and transcription is unchanged."""
    from realtime_whisper_asr_tpu import asr as A

    key = "prefetch-test"
    asr.set_active_stream(key)
    audio = _audio(seconds=2.0, seed=11)

    assert asr.prefetch_audio(audio, key=key) is True
    plan = asr._plan_upload(key, audio)
    assert plan["kind"] == "grow" and plan["n_new"] == 0 and len(plan["words"]) == 0
    # re-prefetching the identical buffer is a no-op
    assert asr.prefetch_audio(audio, key=key) is False
    # growing the buffer prefetches only the suffix, incrementally
    longer = np.concatenate([audio, _audio(seconds=1.0, seed=12)])
    assert asr.prefetch_audio(longer, key=key) is True
    buf = np.asarray(asr._buffers[key][0])
    q = np.clip(np.round(longer * 32768.0), -32768, 32767) / 32768.0
    np.testing.assert_array_equal(buf[: len(longer)], q.astype(np.float32))
    asr.drop_stream(key)

    # end-to-end: same tokens with and without prefetch
    ref = asr.transcribe(audio).tokens
    asr.set_active_stream(key)
    asr.prefetch_audio(audio, key=key)
    got = asr.transcribe(audio).tokens
    asr.drop_stream(key)
    assert got == ref


def test_online_insert_prefetches_to_stream_key(asr):
    """OnlineASRProcessor.insert_audio_chunk prefetches the growing buffer
    under ITS stream key — the serving contract that a prefetch never lands in
    another stream's device ring."""
    from realtime_whisper_asr_tpu.streaming import OnlineASRProcessor

    online = OnlineASRProcessor(asr)
    online.stream_key = "sid-42"
    asr.set_active_stream("sid-other")
    chunk = _audio(seconds=1.0, seed=13)
    online.insert_audio_chunk(chunk)
    assert "sid-42" in asr._buffers
    assert "sid-other" not in asr._buffers
    np.testing.assert_array_equal(asr._buffers["sid-42"][1], chunk)
    asr.drop_stream("sid-42")


def test_shift_detection_on_periodic_audio(asr):
    """Periodic audio has many signature matches; any verified shift is
    content-correct, and unverifiable audio must fall back to full."""
    key = "periodic-test"
    asr.set_active_stream(key)
    from realtime_whisper_asr_tpu import asr as A

    aux = np.zeros(A.D.AUX_LEN, np.float32)
    tone = np.tile(np.sin(np.linspace(0, 2 * np.pi, 160, endpoint=False)), 200).astype(
        np.float32
    )
    asr._sync_audio_and_aux(tone, aux)
    trimmed = tone[4800:]  # exact period multiple: many candidates, all correct
    plan = asr._plan_upload(key, trimmed)
    assert plan["kind"] in ("shift", "grow", "full")
    asr._sync_audio_and_aux(trimmed, aux)
    buf = np.asarray(asr._buffers[key][0])
    q = np.clip(np.round(trimmed * 32768.0), -32768, 32767) / 32768.0
    np.testing.assert_array_equal(buf[: len(trimmed)], q.astype(np.float32))
    assert (buf[len(trimmed) : len(tone)] == 0).all()
    asr.drop_stream(key)


def test_speculative_draft_is_lossless(asr):
    """Self-speculative decode (draft tokens verified in the prefill span)
    must be token-for-token identical to the plain loop — for a true-tail
    draft, a garbage draft, and a full-hypothesis draft — because the
    verifier IS select_next itself (decode.py _greedy_loop)."""
    cfg = asr.cfg
    opts = D.DecodeOptions(timestamps=True, word_timestamps=True, max_new_tokens=24)
    xa = asr._encode_window(_audio(seed=11))

    base = D.greedy_decode(asr.params, cfg, xa, opts)
    ids0 = base.tokens[0][: base.lengths[0]].tolist()
    pfx = ids0[:3]

    ref = D.greedy_decode(asr.params, cfg, xa, opts, prefix_tokens=pfx)
    ref_ids = ref.tokens[0][: ref.lengths[0]].tolist()

    for draft in (ref_ids[3:12], [5, 7, 11, 13], ref_ids[3:4]):
        got = D.greedy_decode(
            asr.params, cfg, xa, opts, prefix_tokens=pfx, draft_tokens=draft
        )
        ids = got.tokens[0][: got.lengths[0]].tolist()
        assert ids == ref_ids, (draft, ref_ids, ids)
        # word-timestamp capture parity: accepted draft rows come from the
        # prefill block and must match the loop's own capture exactly
        np.testing.assert_allclose(
            got.xattn[0][: len(ids)], ref.xattn[0][: len(ref_ids)], atol=2.5 / 255
        )
        assert abs(float(got.avg_logprob[0]) - float(ref.avg_logprob[0])) < 1e-3

    # no prefix at all: draft = the whole previous hypothesis (agree2's first
    # incremental tick) must also reproduce the baseline
    got = D.greedy_decode(asr.params, cfg, xa, opts, draft_tokens=ids0[:16])
    assert got.tokens[0][: got.lengths[0]].tolist() == ids0


def test_speculative_draft_batched_mixed_rows(asr):
    """Batched decode with drafts on some rows only: every row must match the
    same-bucket no-draft batch (rows without draft verify zero tokens)."""
    cfg = asr.cfg
    opts = D.DecodeOptions(timestamps=True, word_timestamps=True, max_new_tokens=16)
    xa1 = asr._encode_window(_audio(seed=0))
    ref0 = D.greedy_decode(asr.params, cfg, xa1, opts)
    stable = ref0.tokens[0][:4].tolist()
    tail = ref0.tokens[0][4:10].tolist()
    xab = jnp.concatenate([xa1, asr._encode_window(_audio(seed=1))], axis=0)

    reqs_nodraft = [
        {"prompt_tokens": None, "prefix_tokens": stable, "seed": 0},
        {"prompt_tokens": None, "prefix_tokens": None, "seed": 0},
    ]
    reqs_draft = [dict(reqs_nodraft[0], draft_tokens=tail), dict(reqs_nodraft[1])]
    ref = D.greedy_decode_batch(asr.params, cfg, xab, opts, reqs_nodraft)
    got = D.greedy_decode_batch(asr.params, cfg, xab, opts, reqs_draft)
    for i in range(2):
        li, lr = int(got[i].lengths[0]), int(ref[i].lengths[0])
        assert li == lr
        np.testing.assert_array_equal(got[i].tokens[0][:li], ref[i].tokens[0][:lr])


def test_batch_draft_bucket_gates_on_all_rows(asr):
    """Mixed groups (some rows draft-less) must skip the draft bucket
    entirely: batch-min acceptance would zero the win while every row pays
    the +DRAFT_MAX prefill span."""
    cfg = asr.cfg
    opts = D.DecodeOptions(max_new_tokens=16)

    def rows(drafts):
        reqs = [
            {"prompt_tokens": None, "prefix_tokens": None, "seed": 0,
             "draft_tokens": d or None}
            for d in drafts
        ]
        init_rows, _, _, _ = D.plan_batch_aux(cfg, opts, reqs)
        return init_rows

    assert D.batch_draft_bucket(rows([[5, 7], [9, 11]])) == D.DRAFT_MAX
    assert D.batch_draft_bucket(rows([[5, 7], []])) == 0
    assert D.batch_draft_bucket(rows([[], []])) == 0


def test_online_processor_emits_draft(asr):
    """prepare_request carries the previous hypothesis tail as draft_ids under
    both prefix policies (the self-speculative streaming contract)."""
    from realtime_whisper_asr_tpu.streaming import OnlineASRProcessor

    for policy in ("agree2", "last"):
        online = OnlineASRProcessor(asr, prefix_policy=policy)
        online.insert_audio_chunk(_audio(seconds=2.0, seed=3))
        online.process_iter()
        online.insert_audio_chunk(_audio(seconds=1.0, seed=4))
        req = online.prepare_request()
        assert req.get("draft_ids"), (policy, req.keys())
        hist = online._token_history[-1]
        n_pfx = len(req.get("prefix_ids") or [])
        assert req["draft_ids"] == hist[n_pfx:][:16]


def test_int8_kv_cache_decode(asr):
    """int8 KV caches (int8-all mode): decode obeys the timestamp grammar,
    forced prefixes survive verbatim, the self-speculative draft stays
    lossless WITHIN the mode, and DTW xattn stays close to the bf16-KV path
    (the quantization halves the bandwidth-bound step's dominant HBM read)."""
    cfg = asr.cfg
    opts = D.DecodeOptions(timestamps=True, word_timestamps=True, max_new_tokens=16)
    xa = asr._encode_window(_audio(seed=29))

    ref = D.greedy_decode(asr.params, cfg, xa, opts, kv_quant=False)
    got = D.greedy_decode(asr.params, cfg, xa, opts, kv_quant=True)
    ids = got.tokens[0][: got.lengths[0]].tolist()
    ts0, last = cfg.timestamp_begin, -1
    for t in ids:
        if t >= ts0:
            assert t >= last
            last = t
    # xattn capture parity across cache modes (softmax weights, f32 capture)
    n = min(int(ref.lengths[0]), int(got.lengths[0]))
    np.testing.assert_allclose(
        got.xattn[0][:n], ref.xattn[0][:n], atol=0.05
    )

    pfx = ids[:4]
    a = D.greedy_decode(asr.params, cfg, xa, opts, prefix_tokens=pfx, kv_quant=True)
    ids_a = a.tokens[0][: a.lengths[0]].tolist()
    assert ids_a[:4] == pfx
    b = D.greedy_decode(
        asr.params, cfg, xa, opts, prefix_tokens=pfx,
        draft_tokens=ids_a[4:12], kv_quant=True,
    )
    assert b.tokens[0][: b.lengths[0]].tolist() == ids_a


def test_speculative_draft_fuzz(asr):
    """Fuzz the lossless property: random prefixes and random draft contents
    (true tails, corrupted tails, random ids, wrong lengths) must never change
    the decoded tokens relative to the same-prefix no-draft decode."""
    cfg = asr.cfg
    opts = D.DecodeOptions(timestamps=True, word_timestamps=False, max_new_tokens=16)
    rng = np.random.default_rng(31)
    for seed in range(4):
        xa = asr._encode_window(_audio(seconds=3.0, seed=40 + seed))
        base = D.greedy_decode(asr.params, cfg, xa, opts)
        ids0 = base.tokens[0][: base.lengths[0]].tolist()
        n_pfx = int(rng.integers(0, max(len(ids0) - 2, 1)))
        pfx = ids0[:n_pfx] or None
        ref = D.greedy_decode(asr.params, cfg, xa, opts, prefix_tokens=pfx)
        ref_ids = ref.tokens[0][: ref.lengths[0]].tolist()
        true_tail = ref_ids[n_pfx:]
        drafts = [
            true_tail[: int(rng.integers(1, max(len(true_tail), 2)))],
            [int(x) for x in rng.integers(0, cfg.eot, size=6)],
            (true_tail[:3] + [int(rng.integers(0, cfg.eot))] + true_tail[4:10]),
        ]
        for draft in drafts:
            if not draft:
                continue
            got = D.greedy_decode(
                asr.params, cfg, xa, opts, prefix_tokens=pfx, draft_tokens=draft
            )
            assert got.tokens[0][: got.lengths[0]].tolist() == ref_ids, (
                seed, n_pfx, draft[:6], ref_ids,
                got.tokens[0][: got.lengths[0]].tolist(),
            )


def test_d2h_modes_token_identical(asr, monkeypatch):
    """decode.enqueue_d2h / fetch_d2h: the three eager-download modes (off /
    async / thread) must be pure plumbing — identical tokens and logprobs,
    and the thread-mode registry must drain after every fetch (no leak of
    pending futures or device arrays)."""
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seed=5))
    opts = D.DecodeOptions(timestamps=True)
    outs = {}
    for mode in ("off", "async", "thread"):
        monkeypatch.setenv("RWA_D2H_MODE", mode)
        res = D.greedy_decode(asr.params, cfg, xa, opts)
        outs[mode] = (res.tokens[0][: res.lengths[0]].tolist(),
                      float(res.sum_logprob[0]))
        assert not D._PENDING_D2H, f"pending D2H registry leaked in {mode=}"
    assert outs["off"] == outs["async"] == outs["thread"], outs
    # batched dispatch/finalize path through the same registry
    monkeypatch.setenv("RWA_D2H_MODE", "thread")
    handle = D.greedy_decode_batch_dispatch(
        asr.params, cfg, jnp.concatenate([xa, xa]), opts,
        requests=[{"prompt_tokens": None, "prefix_tokens": None},
                  {"prompt_tokens": None, "prefix_tokens": None}],
    )
    assert D._PENDING_D2H, "thread mode should register the pending download"
    rows = D.greedy_decode_batch_finalize(handle)
    assert not D._PENDING_D2H
    # identical rows must decode identically through the threaded fetch
    # (batched-vs-sequential parity at matched buckets is covered by
    # test_batched_decode_matches_sequential)
    a, b = (r.tokens[0][: r.lengths[0]].tolist() for r in rows)
    assert a == b and a, (a, b)


def test_sync_many_per_row_path_matches_and_bounds_traces(asr):
    """B>1 groups apply upload plans row-by-row: buffers must land exactly as
    the fused B==1 path lands them, for every kind (full/grow/shift/empty) —
    AND the per-row program's jit-signature count must depend only on the
    (kind, len-bucket) pairs used, never on the batch's per-position pattern
    (the fused program retraced combinatorially on serving churn)."""
    from realtime_whisper_asr_tpu import asr as A

    rng = np.random.default_rng(21)

    def mk(n, seed):
        return (np.random.default_rng(seed).standard_normal(n) * 0.2).astype(np.float32)

    def expected(audio):
        q = np.clip(np.round(audio * 32768.0), -32768, 32767) / 32768.0
        return q.astype(np.float32)

    keys = ["row-a", "row-b", "row-c"]
    a0, b0, c0 = mk(16000, 1), mk(12000, 2), mk(8000, 3)
    aux = np.zeros((3, A.D.AUX_LEN), np.float32)
    aux[:, 0] = [7.0, 8.0, 9.0]

    # tick 1: all three are fresh -> all "full" through the per-row path
    aux_dev = asr._sync_many(keys, [a0, b0, c0], aux)
    np.testing.assert_array_equal(np.asarray(aux_dev)[:, 0], aux[:, 0])
    for k, audio in zip(keys, [a0, b0, c0]):
        buf = np.asarray(asr._buffers[k][0])
        np.testing.assert_array_equal(buf[: len(audio)], expected(audio))
        assert (buf[len(audio):] == 0).all()

    # tick 2: mixed kinds at different positions — grow / shift / unchanged
    a1 = np.concatenate([a0, mk(4000, 4)])          # grow
    b1 = np.concatenate([b0[5000:], mk(3000, 5)])   # front trim -> shift
    c1 = c0                                         # grow with nothing new
    plans = [asr._plan_upload(k, x) for k, x in zip(keys, [a1, b1, c1])]
    assert [p["kind"] for p in plans] == ["grow", "shift", "grow"]
    assert plans[2]["n_new"] == 0
    asr._sync_many(keys, [a1, b1, c1], aux)
    for k, audio in zip(keys, [a1, b1, c1]):
        buf = np.asarray(asr._buffers[k][0])
        np.testing.assert_array_equal(buf[: len(audio)], expected(audio))
    # every (kind, len-bucket) this session uses is now traced
    n_sigs_before = A._apply_plan_row_jit._cache_size()

    # tick 3: the SAME kinds permuted across positions — with the fused
    # program this was a fresh XLA compile; per-row it must hit the cache
    a2 = np.concatenate([a1[5000:], mk(3000, 6)])   # shift
    b2 = np.concatenate([b1, mk(4000, 7)])          # grow
    c2 = c1                                         # unchanged
    plans = [asr._plan_upload(k, x) for k, x in zip(keys, [a2, b2, c2])]
    assert [p["kind"] for p in plans] == ["shift", "grow", "grow"]
    asr._sync_many(keys, [a2, b2, c2], aux)
    for k, audio in zip(keys, [a2, b2, c2]):
        buf = np.asarray(asr._buffers[k][0])
        np.testing.assert_array_equal(buf[: len(audio)], expected(audio))
    assert A._apply_plan_row_jit._cache_size() == n_sigs_before, (
        "permuting plan kinds across batch positions must not mint new "
        "per-row signatures (only a genuinely new (kind, len-bucket) may)"
    )

    # tick 4: a DIFFERENT raw blob total (three grow suffixes instead of two)
    # from already-seen (kind, len-bucket) pairs. The blob's shape is part of
    # every row program's jit key — without power-of-two blob padding this
    # new total re-traced all rows mid-serving even though no new static
    # signature exists (round-3 review finding).
    a3 = np.concatenate([a2, mk(4000, 8)])
    b3 = np.concatenate([b2, mk(4000, 9)])
    c3 = np.concatenate([c2, mk(4000, 10)])
    plans = [asr._plan_upload(k, x) for k, x in zip(keys, [a3, b3, c3])]
    assert [p["kind"] for p in plans] == ["grow", "grow", "grow"]
    asr._sync_many(keys, [a3, b3, c3], aux)
    for k, audio in zip(keys, [a3, b3, c3]):
        buf = np.asarray(asr._buffers[k][0])
        np.testing.assert_array_equal(buf[: len(audio)], expected(audio))
    assert A._apply_plan_row_jit._cache_size() == n_sigs_before, (
        "a new sum-of-row-buckets total within the same power-of-two blob "
        "bucket must not re-trace the per-row programs"
    )
    for k in keys:
        asr.drop_stream(k)


def test_single_text_prefix_timestamp_grammar(asr):
    """hist2 regression: with a ONE-token text prefix, history length at
    step 1 is exactly 2 (prefix + first sample), so the penultimate token is
    the text prefix — NOT a timestamp. The old (step>=2)|(n_prefix>1) gate
    forced prev_was_ts there, inverting kill_ts/kill_text: a step-0 timestamp
    could be followed by text, violating whisper's pairing rule (a timestamp
    entered from text must be followed by a timestamp or EOT)."""
    cfg = asr.cfg
    ts0 = cfg.timestamp_begin
    xa = asr._encode_window(_audio())
    checked = 0
    for seed in range(16):
        res = D.greedy_decode(
            asr.params, cfg, xa,
            D.DecodeOptions(timestamps=True, temperature=0.8, max_new_tokens=24),
            prefix_tokens=[100], seed=seed,
        )
        seq = res.tokens[0][: res.lengths[0]].tolist()
        for i in range(1, len(seq) - 1):
            if seq[i] >= ts0 and seq[i - 1] < cfg.eot:
                checked += 1
                assert seq[i + 1] >= ts0 or seq[i + 1] >= cfg.eot, (seed, i, seq)
    assert checked, "no text->timestamp transition sampled; weak test inputs"


def test_temperature_rides_aux_one_trace(asr):
    """The retry ladder's rungs must share ONE compiled program: temperature
    rides the aux bundle as a traced scalar; only sampled-vs-argmax is a jit
    key. Same (temperature, seed) stays deterministic."""
    cfg = asr.cfg
    xa = asr._encode_window(_audio(seconds=2.0, seed=3))
    opts = lambda t: D.DecodeOptions(timestamps=True, temperature=t, max_new_tokens=16)

    r1 = D.greedy_decode(asr.params, cfg, xa, opts(0.2), seed=1)
    n_sigs = D._greedy_loop._cache_size()
    r2 = D.greedy_decode(asr.params, cfg, xa, opts(0.4), seed=1)
    r3 = D.greedy_decode(asr.params, cfg, xa, opts(0.6), seed=1)
    assert D._greedy_loop._cache_size() == n_sigs, (
        "each temperature rung must reuse the sampled trace, not recompile"
    )
    # determinism at fixed (temperature, seed)
    r2b = D.greedy_decode(asr.params, cfg, xa, opts(0.4), seed=1)
    assert r2.tokens[0][: r2.lengths[0]].tolist() == r2b.tokens[0][: r2b.lengths[0]].tolist()
    # the traced VALUE must actually reach the sampler: a hot (t=4) and a
    # near-greedy (t=0.02) run should disagree for at least one seed
    differs = False
    for seed in (1, 2, 3):
        hot = D.greedy_decode(asr.params, cfg, xa, opts(4.0), seed=seed)
        cold = D.greedy_decode(asr.params, cfg, xa, opts(0.02), seed=seed)
        if (hot.tokens[0][: hot.lengths[0]].tolist()
                != cold.tokens[0][: cold.lengths[0]].tolist()):
            differs = True
            break
    assert differs, "temperature value had no effect on sampling"


def test_condition_on_previous_text_across_windows(asr):
    """The >30 s sequential-window path must carry each window's decoded text
    as the NEXT window's prompt (faster-whisper condition_on_previous_text,
    reference asr_components.py:286) — and pass None when disabled."""
    audio = _audio(seconds=40.0, seed=33)
    seen_prompts = []
    orig = asr._transcribe_window

    def spy(window, init_prompt, time_offset, prefix_ids=None, draft_ids=None,
            prompt_ids=None):
        # snapshot: the caller mutates the carry list between windows
        seen_prompts.append(None if prompt_ids is None else list(prompt_ids))
        return orig(window, init_prompt, time_offset, prefix_ids, draft_ids,
                    prompt_ids=prompt_ids)

    asr._transcribe_window = spy
    asr.max_tokens_per_second = 1.0  # keep random-weight decodes short
    try:
        res = asr.transcribe(audio)
        assert len(seen_prompts) >= 2, "expected at least two windows"
        # first window: empty carry; later windows: prior text tokens
        assert not seen_prompts[0]
        assert seen_prompts[1], "second window got no carried prompt"
        assert all(t < asr.cfg.eot for t in seen_prompts[1])
        assert isinstance(res.tokens, list)

        seen_prompts.clear()
        asr.condition_on_previous_text = False
        asr.transcribe(audio)
        assert all(p is None for p in seen_prompts)
    finally:
        asr._transcribe_window = orig
        asr.condition_on_previous_text = True
        asr.max_tokens_per_second = None


def test_windowing_carry_trims_without_overdeletion(asr, monkeypatch):
    """>30 s windowing carry: `del carry[: len-cap]` with a NEGATIVE index
    over-deleted whenever cap/2 < len(carry) < cap (kept cap-len tokens
    instead of all; at len=cap-1 a single token survived) — round-3 review.
    Locks: below the cap the carry grows monotonically; above it, exactly
    cap tokens survive, newest-last."""
    from realtime_whisper_asr_tpu.asr import Segment, TranscriptionResult

    cap = asr.cfg.n_text_ctx // 2 - 1  # 223 on the test config family
    per_window = 100
    prompts_seen = []
    counter = [0]

    def fake_window(audio, init_prompt, time_offset, prefix_ids=None,
                    draft_ids=None, prompt_ids=None):
        prompts_seen.append(list(prompt_ids or []))
        base = counter[0] * per_window
        counter[0] += 1
        # distinct, sub-eot token ids; a segment spanning the window keeps
        # the offset advancing
        toks = list(range(base, base + per_window))
        seg = Segment(time_offset, time_offset + 30.0, " x", [])
        return TranscriptionResult([seg], tokens=toks)

    monkeypatch.setattr(asr, "_transcribe_window", fake_window)
    import numpy as np

    asr.transcribe(np.zeros(16000 * 95, np.float32))  # 4 windows
    assert len(prompts_seen) >= 4
    assert prompts_seen[0] == []
    assert prompts_seen[1] == list(range(0, 100))
    # len(carry)=200 < cap: EVERYTHING must survive (the bug kept 23)
    assert prompts_seen[2] == list(range(0, 200))
    # len(carry)=300 > cap: exactly the newest cap tokens survive
    assert prompts_seen[3] == list(range(300 - cap, 300))


def test_idle_keepalive_pings_when_idle(asr, monkeypatch):
    """start_idle_keepalive pumps tiny h2d pings only across idle gaps, never
    inflates the tick-upload counters, and stops cleanly. The pump defeats the
    tunnel's TCP slow-start-after-idle (paced upload tax, BENCH r4
    headline_paced_phases: upload 16.9 ms paced vs 2.5 ms as-fast)."""
    import time as _t

    asr.counters.pop("keepalive_h2d", None)
    h2d_before = asr.counters["h2d_transfers"]
    monkeypatch.setenv("RWA_KEEPALIVE_MS", "30")
    assert asr.start_idle_keepalive()
    assert asr.start_idle_keepalive()  # idempotent while running
    deadline = _t.monotonic() + 5.0
    while asr.counters.get("keepalive_h2d", 0) < 3 and _t.monotonic() < deadline:
        _t.sleep(0.01)
    assert asr.counters.get("keepalive_h2d", 0) >= 3
    # a busy h2d path suppresses pings (no contention with tick uploads)
    asr._last_h2d_t = _t.monotonic() + 60.0
    n = asr.counters["keepalive_h2d"]
    _t.sleep(0.12)
    assert asr.counters["keepalive_h2d"] == n
    asr.stop_idle_keepalive()
    assert asr._keepalive_thread is None
    # pings never count as tick uploads
    assert asr.counters["h2d_transfers"] == h2d_before
    # disabled via env: no-op
    monkeypatch.setenv("RWA_KEEPALIVE_MS", "0")
    assert not asr.start_idle_keepalive()
    assert asr._keepalive_thread is None


def test_idle_keepalive_gated_on_tunneled_backend(asr, monkeypatch):
    """Without RWA_KEEPALIVE_MS the pump only starts on a tunneled transport
    (axon relay): on a direct-attached chip — or this CPU test backend — the
    pings are pure dispatch noise, so the default is off (VERDICT r4 #4).
    An explicit interval still forces it anywhere."""
    monkeypatch.delenv("RWA_KEEPALIVE_MS", raising=False)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert not asr.start_idle_keepalive()
    assert asr._keepalive_thread is None
    # the env-less gate keys on the relay's pool env + a non-cpu backend;
    # tests run forced-CPU so even a fake pool IP must not enable it
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert not asr.start_idle_keepalive()
    # explicit interval overrides the gate
    assert asr.start_idle_keepalive(interval_s=5.0)
    asr.stop_idle_keepalive()


def test_pipelined_online_matches_sync(asr):
    """OnlineASRProcessor(pipeline=True) — the software-pipelined tick loop
    (dispatch tick N, then finalize tick N-1 so the result download's tunnel
    round trip overlaps device compute) — must produce the EXACT transcript of
    the synchronous loop: tick N's request is a function of audio ≤ N and
    results ≤ N-1 in both modes, so the request stream is bit-identical and
    only the emission shifts one process_iter call later (the finish() drain
    recovers the last tick)."""
    from realtime_whisper_asr_tpu.streaming.online import OnlineASRProcessor

    audio = _audio(6.0, seed=3)
    chunk = 16000

    def run(pipeline):
        proc = OnlineASRProcessor(
            asr, buffer_trimming=("segment", 4.0), pipeline=pipeline
        )
        outs = []
        for i in range(0, len(audio), chunk):
            proc.insert_audio_chunk(audio[i : i + chunk])
            outs.append(proc.process_iter())
        outs.append(proc.finish())
        return proc, outs

    proc_s, sync = run(False)
    proc_p, piped = run(True)
    join = lambda outs: asr.sep.join(t for _, _, t in outs if t)
    assert join(piped) == join(sync)
    # committed words (with times) identical too, not just the joined text
    assert proc_p.commited == proc_s.commited
    # emission lag: every commit the sync loop made at tick i, the pipelined
    # loop must NOT have made before tick i (one-call lag, recovered at finish)
    assert piped[0] == (None, None, "")


def test_pipelined_online_survives_dispatch_error(asr):
    """A dispatch/finalize failure mid-stream resets state and the loop keeps
    accepting audio (reference error-reset contract,
    enhanced_asr_processor.py:369-381)."""
    from realtime_whisper_asr_tpu.streaming.online import OnlineASRProcessor

    proc = OnlineASRProcessor(asr, buffer_trimming=("segment", 4.0), pipeline=True)
    audio = _audio(3.0, seed=4)
    proc.insert_audio_chunk(audio[:16000])
    proc.process_iter()
    # poison the in-flight handle so finalize raises
    assert proc._inflight is not None
    st, t0, off0 = proc._inflight
    proc._inflight = (
        {"decode_handle": None, "beam": False, "xa": None, "opts": None,
         "prompt_ids": None, "prefix_ids": None, "audio_len": 0,
         "time_offset": 0.0, "t0": t0},
        t0, off0,
    )
    proc.insert_audio_chunk(audio[16000:32000])
    b, e, txt = proc.process_iter()  # finalize fails -> reset, no crash
    assert txt == ""
    # the loop recovers: new audio flows and finish() drains cleanly
    proc.insert_audio_chunk(audio[32000:])
    proc.process_iter()
    proc.finish()


def test_async_pipelined_online_deterministic(asr):
    """pipeline="async" (dispatch tick N from results ≤ N-2, then finalize
    N-1 — the overlap mode) is NOT bit-identical to the sync loop by design,
    but it must be structurally deterministic (the lag is fixed, not
    timing-dependent), produce time-monotonic commits even when a trim lands
    between a tick's dispatch and its apply, and transcribe."""
    from realtime_whisper_asr_tpu.streaming.online import OnlineASRProcessor

    audio = _audio(10.0, seed=5)

    def run():
        proc = OnlineASRProcessor(
            asr, buffer_trimming=("segment", 4.0), pipeline="async"
        )
        outs = []
        for i in range(0, len(audio), 16000):
            proc.insert_audio_chunk(audio[i : i + 16000])
            outs.append(proc.process_iter())
        outs.append(proc.finish())
        return proc, outs

    p1, o1 = run()
    p2, o2 = run()
    assert [o[2] for o in o1] == [o[2] for o in o2]
    assert p1.commited == p2.commited
    starts = [w[0] for w in p1.commited]
    assert starts == sorted(starts)
    assert any(t for _, _, t in o1), "async pipeline transcribed nothing"
    # the buffer was actually trimmed (so the stale-offset path was exercised)
    assert p1.buffer_time_offset > 0.0


def test_patch_aux_device_draft_slices_and_signs():
    """patch_aux_device_draft splices the previous tick's device-resident
    sampled tokens into the aux draft slots: offset slicing, EOT-bounded
    length, zeroed invalid tail, and the NEGATIVE length encoding of forced
    mode (minus the safety tail and the EOT itself)."""
    cfg = W.get_config("test-tiny")
    max_new, row_len = 12, 20
    row = np.zeros(row_len, np.float32)
    toks = [101, 102, 103, 104, 105, 106, 107, cfg.eot, 0, 0, 0, 0]
    row[:max_new] = toks
    prev = jnp.asarray(row)
    aux = jnp.zeros((1, D.AUX_LEN), jnp.float32)

    out = D.patch_aux_device_draft(aux, prev, 2, prev_max_new=max_new,
                                   prev_row_len=row_len, eot=cfg.eot)
    out = np.asarray(out)[0]
    # verify mode: draft = tokens[2:8] = 103..107,eot (6 incl. EOT), positive
    assert out[D.AUX_TOK + 5] == 6
    assert list(out[D.AUX_TOK + 6 : D.AUX_TOK + 6 + 6].astype(int)) == [103, 104, 105, 106, 107, cfg.eot]
    assert np.all(out[D.AUX_TOK + 12 : D.AUX_TOK + 6 + D.DRAFT_MAX] == 0)

    outf = D.patch_aux_device_draft(aux, prev, 2, prev_max_new=max_new,
                                    prev_row_len=row_len, eot=cfg.eot,
                                    force=True, safety=2)
    outf = np.asarray(outf)[0]
    # force mode: drop EOT and 2 safety tokens -> 3 forced, encoded negative
    assert outf[D.AUX_TOK + 5] == -3
    assert list(outf[D.AUX_TOK + 6 : D.AUX_TOK + 6 + 3].astype(int)) == [103, 104, 105]
    assert np.all(outf[D.AUX_TOK + 9 : D.AUX_TOK + 6 + D.DRAFT_MAX] == 0)

    # offset past the valid region -> empty draft either way
    oute = np.asarray(D.patch_aux_device_draft(aux, prev, 9, prev_max_new=max_new,
                                               prev_row_len=row_len, eot=cfg.eot))[0]
    assert oute[D.AUX_TOK + 5] == 0


def test_forced_device_draft_tokens_are_kept(asr):
    """With force=True the draft tokens from the previous device result must
    appear verbatim in the new transcript (prefix-continuation semantics of
    policy "last"), even where the model would argmax something else; the
    decode then continues with the model's own choices."""
    audio = _audio(4.0, seed=7)
    xa = asr._encode_window(audio)
    opts = D.DecodeOptions(timestamps=True, word_timestamps=False)
    h0 = D.greedy_decode_dispatch(asr.params, asr.cfg, xa, opts)
    r0 = D.greedy_decode_finalize(h0)
    n0 = int(r0.lengths[0])
    assert n0 > 6
    # second decode: force the first decode's tokens 1..k as a device draft
    init, sot_index, n_prefix = D.build_initial_tokens(asr.cfg, opts, None, None)
    aux_np = D.pack_aux(init, n_prefix, sot_index, -1)
    aux = jnp.asarray(aux_np).reshape(1, -1)
    row_len = int(h0["packed"].size)
    patched = D.patch_aux_device_draft(
        aux, h0["packed"], 1, prev_max_new=h0["max_new"], prev_row_len=row_len,
        eot=asr.cfg.eot, force=True, safety=2,
    )
    n_forced = int(abs(np.asarray(patched)[0, D.AUX_TOK + 5]))
    assert n_forced > 0
    h1 = D.greedy_decode_dispatch(asr.params, asr.cfg, xa, opts,
                                  aux_device=patched, force_draft_bucket=True)
    r1 = D.greedy_decode_finalize(h1)
    toks0 = r0.tokens[0][: n0].tolist()
    toks1 = r1.tokens[0][: int(r1.lengths[0])].tolist()
    assert toks1[:n_forced] == toks0[1 : 1 + n_forced], (toks0[:8], toks1[:8], n_forced)
