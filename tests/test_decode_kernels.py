"""Fused decode kernels (opt-in) and the head-major cross-cache layout.

The layout is default-on (models/whisper.py KVCache); the pallas kernels are
opt-in (see ops/decode_kernels.py header for the measured in-context story).
These tests pin kernel numerics in interpret mode and the layout's parity
through the public decode path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import whisper_medusa_tpu.ops.decode_kernels as DK


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(DK, "_INTERPRET", True)
    monkeypatch.setattr(DK, "_ENABLED", True)


@pytest.mark.parametrize("kv_len", [640, 600])
@pytest.mark.parametrize("t", [1, 11])
def test_cross_kernel_matches_xla(kv_len, t):
    rng = np.random.default_rng(kv_len + t)
    q = jnp.asarray(rng.normal(size=(2, 4, t, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 4, 64, 640)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 640, 4 * 64)), jnp.float32)  # head-flat
    out = DK._cross_pallas(q, k, v, kv_len)
    ref = DK._cross_xla(q, k, v, kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ffn_kernel_matches_xla(monkeypatch):
    monkeypatch.setattr(DK, "_FFN_BLOCK", 256)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(11, 128)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(128, 1024)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(1024,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(1024, 128)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    out = DK._ffn_pallas(x, w1, b1, w2, b2)
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False)
    ref = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32) + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_erf_approximation_accuracy():
    """A&S 7.1.26 |err| <= 1.5e-7 in exact arithmetic; float32 evaluation adds
    rounding — 1e-6 total is still ~4000x below bf16 resolution (kernel GELU)."""
    import scipy.special as sp

    z = np.linspace(-6, 6, 20001).astype(np.float32)
    ours = np.asarray(DK._erf_f32(jnp.asarray(z)))
    assert np.abs(ours - sp.erf(z.astype(np.float64))).max() < 1e-6


def test_decode_path_with_kernels_matches_without(monkeypatch):
    """Public decode through decode_step: kernels on (interpret) == kernels off."""
    from whisper_medusa_tpu.config import tiny_test_config
    from whisper_medusa_tpu.models import whisper as W

    cfg = tiny_test_config().dims
    params = W.init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    enc = W.encode(params, cfg, jnp.asarray(
        rng.normal(size=(2, cfg.num_mel_bins, cfg.num_frames)), jnp.float32))
    toks = jnp.asarray(rng.integers(6, 60, size=(2, 3)), jnp.int32)
    off = jnp.zeros((2,), jnp.int32)

    monkeypatch.setattr(DK, "_ENABLED", False)
    cache0 = W.init_cache(params, cfg, enc, 16)
    ref, _ = W.decode_step(params, cfg, toks, cache0, off)

    # Force kernels on at tiny sizes (interpret) incl. cross padding.
    monkeypatch.setattr(DK, "_ENABLED", True)
    monkeypatch.setattr(DK, "_MIN_KV", 8)
    monkeypatch.setattr(DK, "_FFN_BLOCK", 32)
    cache1 = W.init_cache(params, cfg, enc, 16)
    assert cache1.cross_k.shape[4] % 128 == 0 or \
        cache1.cross_k.shape[4] == enc.shape[1]
    out, _ = W.decode_step(params, cfg, toks, cache1, off)
    np.testing.assert_allclose(np.asarray(out.hidden), np.asarray(ref.hidden),
                               atol=1e-4, rtol=1e-4)


def test_cross_attention_int8_scales_close_to_dequant():
    """Scaled int8 cross attention == attention over the dequantized tensors."""
    import jax
    from whisper_medusa_tpu.models.whisper import quantize_kv_rows
    from whisper_medusa_tpu.ops import decode_kernels as dk

    from whisper_medusa_tpu.models.whisper import quantize_v_flat

    b, h, t, d, s = 1, 2, 3, 16, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(k1, (b, h, t, d)) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(k2, (b, h, d, s))).astype(jnp.bfloat16)
    v = (jax.random.normal(k3, (b, s, h * d))).astype(jnp.bfloat16)  # head-flat
    kq, ks = quantize_kv_rows(k, axis=2)
    vq, vs = quantize_v_flat(v, h)            # vq (B,S,D) int8, vs (B,H,S)

    out = dk.cross_attention_decode(q, kq, vq, 100, ks, vs)
    kd = (kq.astype(jnp.float32) * ks[:, :, None, :]).astype(jnp.bfloat16)
    # Dequant the flat V: each head's 64-lane chunk gets its (B, H, S) scale.
    vs_flat = jnp.repeat(jnp.transpose(vs, (0, 2, 1)), d, axis=-1)  # (B,S,D)
    vd = (vq.astype(jnp.float32) * vs_flat).astype(jnp.bfloat16)
    ref = dk.cross_attention_decode(q, kd, vd, 100)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)
