"""Int8 weight-only quantized decode: kernel parity, model quality, and the
medusa==vanilla invariant within the quantized model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.config import tiny_test_config
from whisper_medusa_tpu.models.api import WhisperMedusaModel
from whisper_medusa_tpu.ops import qmm


def test_quantize_array_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 96)).astype(np.float32) * 0.05
    wq, s = qmm.quantize_array(jnp.asarray(w), axis=-2)
    assert wq.dtype == jnp.int8 and s.shape == (96,)
    deq = np.asarray(wq, np.float32) * np.asarray(s)[None, :]
    err = np.abs(deq - w).max() / np.abs(w).max()
    assert err < 0.01  # <=0.5 LSB of 127 levels


def test_int8_self_kv_opt_out(monkeypatch):
    """WM_INT8_SELF_KV=0 keeps bf16 self slabs under the int8 cross cache,
    and the decode paths still run (the scan path takes self_s=None)."""
    from whisper_medusa_tpu.config import tiny_test_config as ttc
    from whisper_medusa_tpu.models import whisper
    from whisper_medusa_tpu.ops.qmm import quantize_decoder

    cfg = ttc(medusa_num_heads=2)
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), cfg.dims)
    wq, _ = quantize_decoder(wp)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, 32, cfg.dims.d_model),
                            jnp.float32)

    cache = whisper.init_cache(wq, cfg.dims, enc, 32)
    assert cache.self_k.dtype == jnp.int8 and cache.self_s is not None

    monkeypatch.setenv("WM_INT8_SELF_KV", "0")
    cache = whisper.init_cache(wq, cfg.dims, enc, 32)
    assert cache.self_k.dtype == enc.dtype and cache.self_s is None
    toks = jnp.asarray([[5, 9, 11]], jnp.int32)
    out, cache = whisper.decode_step(wq, cfg.dims, toks, cache,
                                     jnp.zeros((1,), jnp.int32))
    assert out.hidden.shape == (1, 3, cfg.dims.d_model)


def test_quantized_heads_apply_close():
    """apply_heads on int8 heads ≈ bf16 heads (per-channel dequant)."""
    from whisper_medusa_tpu.models import medusa as medusa_mod
    from whisper_medusa_tpu.models import whisper

    cfg = tiny_test_config(medusa_num_heads=3)
    r1, r2 = jax.random.split(jax.random.PRNGKey(1))
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    # Zero-init heads quantize exactly; give them real weight mass.
    mp = {"heads": {
        "w": (jax.random.normal(r1, mp["heads"]["w"].shape) * 0.05
              ).astype(mp["heads"]["w"].dtype),
        "b": mp["heads"]["b"],
    }}
    _, mp_q = qmm.quantize_decoder(wp, mp)
    assert mp_q["heads"]["w"]["q"].dtype == jnp.int8

    x = (jax.random.normal(r2, (2, 5, cfg.dims.d_model)) * 0.5
         ).astype(jnp.float32)
    ref = medusa_mod.apply_heads(mp, x)
    got = medusa_mod.apply_heads(mp_q, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("fn,ref", [(qmm.qmm, qmm.qmm_ref),
                                    (qmm.qmm_nt, qmm.qmm_nt_ref)])
def test_qmm_kernel_interpret_matches_ref(fn, ref):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 128)), jnp.bfloat16)
    if fn is qmm.qmm:
        w = rng.normal(size=(128, 640)).astype(np.float32) * 0.1
        wq, s = qmm.quantize_array(jnp.asarray(w), axis=-2)
    else:
        w = rng.normal(size=(640, 128)).astype(np.float32) * 0.1
        wq, s = qmm.quantize_array(jnp.asarray(w), axis=-1)
    got = np.asarray(fn(x, wq, s, block_n=256, interpret=True))
    want = np.asarray(ref(x, wq, s))
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)


def test_quantized_model_decodes_and_stays_close():
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3)
    model = WhisperMedusaModel.from_random(cfg, seed=0)
    qmodel = model.quantize()
    # Structure: decoder weights replaced by {"q", "s"} dicts.
    assert isinstance(qmodel.params["whisper"]["decoder"]["embed_tokens"], dict)
    assert isinstance(
        qmodel.params["whisper"]["decoder"]["layers"]["self"]["q_w"], dict)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, cfg.dims.num_mel_bins,
                             cfg.dims.num_frames)).astype(np.float32)
    out_q = qmodel.generate(feats, language="en", max_length=20)
    assert out_q.sequences.shape[0] == 2

    # medusa == vanilla parity WITHIN the quantized model.
    out_v = qmodel.generate(feats, language="en", max_length=20,
                            disable_medusa=True)
    # base_head variant: vanilla twin must also go through head0 — compare via
    # the engine instead for exactness; at API level just check both ran.
    assert out_v.sequences.shape == out_q.sequences.shape


def test_quantized_engine_parity():
    """Exact medusa==vanilla token parity within the quantized model."""
    from whisper_medusa_tpu.config import GenerationConfig
    from whisper_medusa_tpu.decoding.buffers import generate_medusa_buffers
    from whisper_medusa_tpu.decoding.processors import ProcessorConfig
    from whisper_medusa_tpu.decoding.speculative import speculative_generate
    from whisper_medusa_tpu.models import medusa as medusa_mod
    from whisper_medusa_tpu.models import whisper
    from whisper_medusa_tpu.ops.qmm import quantize_decoder

    cfg = tiny_test_config(medusa_num_heads=3)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    wp_q, mp_q = quantize_decoder(wp, mp)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, cfg.dims.num_mel_bins,
                                       cfg.dims.num_frames)), jnp.float32)
    enc = whisper.encode(wp_q, cfg.dims, mel)
    prompt = jnp.asarray(np.tile(rng.integers(6, 200, (1, 3)), (2, 1)), jnp.int32)
    pcfg = ProcessorConfig(vocab_size=cfg.dims.vocab_size, begin_index=3,
                           eos_token_id=5)
    gen = GenerationConfig(max_length=32, eos_token_id=5, pad_token_id=5,
                           suppress_tokens=None, begin_suppress_tokens=None)

    res_m = speculative_generate(
        wp_q, mp_q, cfg.dims, generate_medusa_buffers(cfg.medusa.medusa_choices),
        pcfg, gen, enc, prompt, variant="base_head")
    res_v = speculative_generate(
        wp_q, mp_q, cfg.dims, generate_medusa_buffers([1]),
        pcfg, gen, enc, prompt, variant="base_head")
    for i in range(2):
        n = int(min(res_m.lengths[i], res_v.lengths[i]))
        np.testing.assert_array_equal(
            np.asarray(res_m.tokens)[i, :n], np.asarray(res_v.tokens)[i, :n])


def test_quantized_streaming():
    """Quantized model + streaming decode compose."""
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=2)
    qmodel = WhisperMedusaModel.from_random(cfg, seed=4).quantize()
    rng = np.random.default_rng(4)
    f = rng.normal(size=(1, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(
        np.float32)
    chunks = list(qmodel.generate_stream(f, language="en", max_length=20,
                                         chunk_tokens=5))
    assert chunks[-1][2]  # finished


def test_quantized_beam_search_runs():
    """int8 serving mode composes with beam search — the beam loop reads the
    int8 cross cache (per-example scales, beam-folded queries)."""
    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3)
    model = WhisperMedusaModel.from_random(cfg, seed=0).quantize()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, cfg.dims.num_mel_bins,
                             cfg.dims.num_frames)).astype(np.float32)
    out = model.generate(feats, language="en", max_length=16, num_beams=2)
    assert out.sequences.shape[0] == 2
    assert (out.lengths > 4).all()


def test_quantized_longform_timestamps():
    """int8 serving mode composes with the longform seek loop + timestamps
    (each 30 s window builds a fresh int8 cross cache)."""
    from whisper_medusa_tpu.ops.mel import log_mel_spectrogram_np

    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3)
    model = WhisperMedusaModel.from_random(cfg, seed=2).quantize()
    rng = np.random.default_rng(5)
    # tiny config: num_frames windows << 30 s, so a few windows of audio
    n = cfg.dims.num_frames
    wav = (0.1 * rng.normal(size=(1, 160 * (3 * n + n // 2)))).astype(np.float32)
    feats = log_mel_spectrogram_np(wav, n_mels=cfg.dims.num_mel_bins)
    assert feats.shape[-1] > n
    out = model.generate(feats, language="en", max_length=16,
                         return_timestamps=True)
    assert out.segments is not None
    assert out.sequences.shape[0] == 1
