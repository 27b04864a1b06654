"""Architecture parity: our pure-JAX Whisper vs transformers' torch Whisper.

A small random-weight HF model is converted through load.params_from_hf_state_dict;
encoder outputs and teacher-forced decoder logits must match to f32 tolerance.
This validates conv padding, positional embeddings, attention scaling/masking,
layernorm placement, and the weight converter — with zero network access.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realtime_whisper_asr_tpu.models import whisper as W

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_and_jax():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=2,
        decoder_layers=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=1500,
        max_target_positions=448,
    )
    torch.manual_seed(0)
    hf_model = transformers.WhisperModel(hf_cfg).eval()
    cfg = W.config_from_hf(hf_cfg.to_dict(), name="parity")
    params = W.params_from_hf_state_dict(hf_model.state_dict(), cfg, dtype=jnp.float32)
    return hf_model, cfg, params


def _mel(batch=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, 3000, 80)).astype(np.float32) * 0.5


def test_encoder_parity(hf_and_jax):
    hf_model, cfg, params = hf_and_jax
    mel = _mel()
    with torch.no_grad():
        golden = hf_model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
    ours = np.asarray(W.encode(params, cfg, jnp.asarray(mel)))
    assert ours.shape == golden.shape == (1, 1500, 64)
    np.testing.assert_allclose(ours, golden, atol=3e-3, rtol=0)


def test_decoder_teacher_forced_parity(hf_and_jax):
    hf_model, cfg, params = hf_and_jax
    mel = _mel(seed=1)
    tokens = np.array([[cfg.sot, cfg.lang_token("en"), cfg.transcribe, 400, 500, 600]], np.int32)
    with torch.no_grad():
        enc = hf_model.encoder(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state
        dec = hf_model.decoder(
            input_ids=torch.from_numpy(tokens.astype(np.int64)), encoder_hidden_states=enc
        ).last_hidden_state
        golden_logits = (dec @ hf_model.decoder.embed_tokens.weight.T).numpy()
    xa = W.encode(params, cfg, jnp.asarray(mel))
    ours = np.asarray(W.decode_full(params, cfg, jnp.asarray(tokens), xa))
    assert ours.shape == golden_logits.shape
    np.testing.assert_allclose(ours, golden_logits, atol=1e-2, rtol=0)


def test_incremental_matches_teacher_forced(hf_and_jax):
    """KV-cached decode_step must reproduce decode_full logits position by position."""
    _, cfg, params = hf_and_jax
    mel = _mel(seed=2)
    xa = W.encode(params, cfg, jnp.asarray(mel))
    tokens = np.array([[cfg.sot, cfg.lang_token("en"), cfg.transcribe, 123, 4567, 89]], np.int32)
    full = np.asarray(W.decode_full(params, cfg, jnp.asarray(tokens), xa))

    cache = W.init_cache(params, cfg, xa)
    step = jax.jit(W.decode_step, static_argnames=("cfg",))
    for t in range(tokens.shape[1]):
        logits, cache, _ = step(params, cfg, jnp.asarray(tokens[:, t]), jnp.int32(t), cache)
        np.testing.assert_allclose(np.asarray(logits), full[:, t], atol=1e-2, rtol=0)


def test_fused_cross_kv_quantize_matches_unfused(hf_and_jax):
    """init_cache(kv_quant=True) quantizes cross-KV INSIDE the layer scan
    (model._precompute_cross_kv_q8) so the full bf16 stack never coexists
    with its int8 copy — the round-5 fix for the B=29 int8-kv serving group
    that failed XLA AOT compile (18.81G of 15.75G HBM). Numerics must be
    BIT-identical to quantizing the stacked output: same per-row math,
    different schedule. (Exact bit-identity is NOT the contract: fusing the
    K/V projection with its quantize changes the matmul's f32 accumulation
    order, so scales differ in ULPs — the locked invariant is the
    DEQUANTIZED cache, which must match the unfused path to quantization
    precision.)"""
    from realtime_whisper_asr_tpu.models.whisper import model as M

    _, cfg, params = hf_and_jax
    xa = W.encode(params, cfg, jnp.asarray(_mel(seed=7)))
    ck, cv = M.precompute_cross_kv(params, cfg, xa)
    cache = W.init_cache(params, cfg, xa, kv_quant=True)
    for raw, q8, sc in ((ck, cache.cross_k, cache.cross_ks),
                        (cv, cache.cross_v, cache.cross_vs)):
        deq = np.asarray(q8, np.float32) * np.asarray(sc)
        raw = np.asarray(raw, np.float32)
        # per-row quantization step = scale; fused dequant must sit within
        # one step of the raw rows (same bound the unfused path guarantees)
        err = np.abs(deq - raw)
        assert float(np.max(err - np.asarray(sc))) <= 1e-6


def test_xattn_capture_shape(hf_and_jax):
    _, cfg, params = hf_and_jax
    xa = W.encode(params, cfg, jnp.asarray(_mel(seed=3)))
    cache = W.init_cache(params, cfg, xa)
    amask = jnp.ones((cfg.n_text_layer, cfg.n_text_head), jnp.float32)
    logits, cache, xattn = W.decode_step(
        params, cfg, jnp.asarray([cfg.sot], jnp.int32), jnp.int32(0), cache, alignment_mask=amask
    )
    assert xattn.shape == (1, cfg.n_audio_ctx)
    # attention rows sum to 1 per head; mask sums over L*H heads
    assert abs(float(jnp.sum(xattn)) - cfg.n_text_layer * cfg.n_text_head) < 1e-3


def test_special_token_layout():
    cfg = W.get_config("tiny")
    assert (cfg.eot, cfg.sot, cfg.no_timestamps, cfg.timestamp_begin) == (50257, 50258, 50363, 50364)
    assert cfg.lang_token("en") == 50259 and cfg.lang_token("zh") == 50260
    assert cfg.transcribe == 50359 and cfg.translate == 50358
    v3 = W.get_config("large-v3")
    assert v3.num_languages == 100 and v3.timestamp_begin == 50365
    assert v3.lang_token("yue") == 50358
    en = W.get_config("tiny.en")
    assert en.eot == 50256 and not en.is_multilingual
    assert en.sot_sequence() == (50257, 50362)


def test_int8_decoder_quantization_parity(hf_and_jax):
    from realtime_whisper_asr_tpu.models.whisper.quant import quantize_decoder

    _, cfg, params = hf_and_jax
    mel = _mel(seed=9)
    xa = W.encode(params, cfg, jnp.asarray(mel))
    tokens = np.array([[cfg.sot, cfg.lang_token("en"), cfg.transcribe, 400, 500]], np.int32)
    dense = np.asarray(W.decode_full(params, cfg, jnp.asarray(tokens), xa))
    qparams = quantize_decoder(params)
    quant = np.asarray(W.decode_full(qparams, cfg, jnp.asarray(tokens), xa))
    # weight-only int8 with per-channel scales: logits track dense closely
    denom = np.maximum(np.abs(dense).max(), 1.0)
    rel = np.abs(quant - dense).max() / denom
    assert rel < 0.05, f"relative logits error {rel}"
    # argmax agreement on the strongest positions
    assert (dense.argmax(-1) == quant.argmax(-1)).mean() > 0.8


def test_int8_all_and_logits_head_parity(hf_and_jax):
    """int8-all (encoder + decoder + tied logits head): logits track dense
    within combined activation+weight quantization tolerance, and the head's
    own error stays small (per-vocab-row scales)."""
    from realtime_whisper_asr_tpu.models.whisper.quant import (
        quantize_all,
        quantize_logits_head,
    )

    _, cfg, params = hf_and_jax
    mel = _mel(seed=10)
    xa = W.encode(params, cfg, jnp.asarray(mel))
    tokens = np.array([[cfg.sot, cfg.lang_token("en"), cfg.transcribe, 400, 500]], np.int32)
    dense = np.asarray(W.decode_full(params, cfg, jnp.asarray(tokens), xa))
    denom = np.maximum(np.abs(dense).max(), 1.0)

    # logits head alone (dense blocks): tight bound
    lh = np.asarray(W.decode_full(quantize_logits_head(params), cfg, jnp.asarray(tokens), xa))
    assert np.abs(lh - dense).max() / denom < 0.03

    # full int8-all end to end through the quantized encoder as well
    qall = quantize_all(params)
    xa_q = W.encode(qall, cfg, jnp.asarray(mel))
    quant = np.asarray(W.decode_full(qall, cfg, jnp.asarray(tokens), xa_q))
    assert np.abs(quant - dense).max() / denom < 0.12
    assert (dense.argmax(-1) == quant.argmax(-1)).mean() > 0.6


def test_int4_decoder_quantization_parity(hf_and_jax):
    """int4-g128 decoder (quant.quantize_decoder_int4): logits track dense
    within 4-bit weight tolerance (RTN-g128 on random weights ≈ 3× the int8
    error), qkv-fusion stays EXACT on the grouped layout (scales concat on
    the output axis; groups partition the shared input axis), and requantizing
    an int8 artifact down to int4 behaves like quantizing dense directly."""
    from realtime_whisper_asr_tpu.models.whisper.quant import (
        fuse_qkv,
        quantize_decoder,
        quantize_decoder_int4,
    )

    _, cfg, params = hf_and_jax
    mel = _mel(seed=11)
    xa = W.encode(params, cfg, jnp.asarray(mel))
    tokens = np.array([[cfg.sot, cfg.lang_token("en"), cfg.transcribe, 400, 500]], np.int32)
    dense = np.asarray(W.decode_full(params, cfg, jnp.asarray(tokens), xa))
    denom = np.maximum(np.abs(dense).max(), 1.0)

    q4 = quantize_decoder_int4(params)
    l4 = np.asarray(W.decode_full(q4, cfg, jnp.asarray(tokens), xa))
    rel4 = np.abs(l4 - dense).max() / denom
    assert rel4 < 0.25, f"int4 relative logits error {rel4}"

    # grouped-scale fusion is a pure layout rewrite: bit-identical logits
    lf = np.asarray(W.decode_full(fuse_qkv(q4), cfg, jnp.asarray(tokens), xa))
    np.testing.assert_array_equal(lf, l4)

    # int8 -> int4 requantization (prequant-artifact downgrade path) lands in
    # the same error band as direct dense -> int4
    l84 = np.asarray(
        W.decode_full(quantize_decoder_int4(quantize_decoder(params)), cfg,
                      jnp.asarray(tokens), xa)
    )
    assert np.abs(l84 - dense).max() / denom < rel4 * 1.5 + 0.02


def test_int4_pack_roundtrip_and_no_s4_leaves():
    """The packed-int4 storage contract: (a) _pack_int4/_unpack_int4 are exact
    inverses over the full [-7,7] value range, and (b) quantize_*_int4 produce
    NO S4-dtype leaves anywhere — S4 arrays cannot cross host↔device or ride
    as jit args on the axon TPU backend (device_put relayout recursion,
    measured round 4), so S4 may only ever exist INSIDE a jitted program."""
    import jax
    from realtime_whisper_asr_tpu.models.whisper.quant import (
        _pack_int4,
        _unpack_int4,
        quantize_all_int4,
    )

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.integers(-7, 8, (6, 256, 64)).astype(np.int8))
    np.testing.assert_array_equal(np.asarray(_unpack_int4(_pack_int4(q))),
                                  np.asarray(q))

    cfg = W.get_config("test-tiny")
    params = W.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    leaves = jax.tree.leaves(quantize_all_int4(params))
    assert all(str(l.dtype) not in ("int4", "uint4") for l in leaves)


def test_int4_group_scales_beat_per_column():
    """The g128 grouping exists for accuracy: on a (256,128) weight with
    outlier rows, per-group-of-128 scales must reconstruct strictly better
    than one per-column scale over the full input dim (the flat int4
    alternative). Guards the INT4_GROUP=128 design choice."""
    from realtime_whisper_asr_tpu.models.whisper.quant import (
        INT4_GROUP,
        _dequant,
        _quantize_weight_int4,
    )

    assert INT4_GROUP == 128  # one MXU K-tile per scale group
    rng = np.random.default_rng(3)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    w[7] *= 40.0  # outlier input row poisons a full-column scale

    grouped = np.asarray(_dequant(_quantize_weight_int4(jnp.asarray(w))))
    flat_s = np.maximum(np.abs(w).max(0, keepdims=True) / 7.0, 1e-12)
    flat = np.clip(np.round(w / flat_s), -7, 7) * flat_s

    # the outlier poisons its OWN 128-row group either way; the win is that
    # grouped scales quarantine it — rows in the other group stay clean,
    # where a single full-input-dim scale drags them all down with it
    clean = slice(128, 256)
    assert (np.abs(grouped[clean] - w[clean]).max()
            < np.abs(flat[clean] - w[clean]).max() / 2)


def test_int4_pallas_kernel_matches_xla_path():
    """The Pallas packed-int4 matmul (ops/int4_matmul.py, interpret mode on
    CPU) must agree with model._linear's XLA grouped-int32 formulation to
    the kernel's bf16 scale-fold tolerance (one rounding of q*s, <=0.4%
    relative per weight; 2% bound here) across decode-shaped cases: M=1
    greedy, M=5 beam, multi-group K, and the fused-qkv N. Also locks the
    routing predicate: decode-sized aligned shapes take the kernel ON TPU
    ONLY, prefill M and misaligned test-tiny dims stay on XLA everywhere."""
    import jax

    from realtime_whisper_asr_tpu.models.whisper.quant import _quantize_weight_int4
    from realtime_whisper_asr_tpu.ops.int4_matmul import int4_matmul, use_pallas_int4

    rng = np.random.default_rng(7)
    for m, k, n in ((1, 256, 256), (5, 512, 768), (8, 1280, 512)):
        w = rng.standard_normal((k, n)).astype(np.float32)
        d = _quantize_weight_int4(jnp.asarray(w))
        xq = jnp.asarray(rng.integers(-127, 128, (m, k), dtype=np.int8))
        y_k = np.asarray(int4_matmul(xq, d["q"], d["s"], interpret=True))

        half, dout = d["q"].shape
        g = d["s"].shape[0]
        w4 = jax.lax.bitcast_convert_type(d["q"], jnp.int4)
        wg = w4.reshape(g, half // g, dout, 2)
        xg = xq.reshape(-1, g, half // g, 2)
        p = jax.lax.dot_general(
            xg, wg, (((2, 3), (1, 3)), ((1,), (0,))),
            preferred_element_type=jnp.int32,
        )
        y_x = np.asarray((p.astype(jnp.float32) * jnp.asarray(d["s"])[:, None, :]).sum(0))
        denom = max(np.abs(y_x).max(), 1.0)
        assert np.abs(y_k - y_x).max() / denom < 0.02, (m, k, n)

    # routing: CPU backend -> always XLA; the shape gates hold regardless
    assert not use_pallas_int4(1, 640, 1280, 10)  # would be True on TPU
    assert not use_pallas_int4(128, 640, 1280, 10)  # prefill M: XLA
    assert not use_pallas_int4(1, 32, 192, 1)  # test-tiny dims: XLA
