"""ops/decode_ops.py — the scan decode path's cross-attention / FFN math.

(The per-op Pallas kernel experiment these XLA forms were validated against
lives at tools/decode_kernels_experiment.py with its own selftest.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.ops import decode_ops


def test_cross_attention_int8_scales_close_to_dequant():
    """Scaled int8 cross attention == attention over the dequantized tensors."""
    from whisper_medusa_tpu.models.whisper import (quantize_kv_rows,
                                                   quantize_v_flat)

    b, h, t, d, s = 1, 2, 3, 16, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(k1, (b, h, t, d)) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(k2, (b, h, d, s))).astype(jnp.bfloat16)
    v = (jax.random.normal(k3, (b, s, h * d))).astype(jnp.bfloat16)  # head-flat
    kq, ks = quantize_kv_rows(k, axis=2)
    vq, vs = quantize_v_flat(v, h)            # vq (B,S,D) int8, vs (B,H,S)

    out = decode_ops.cross_attention_decode(q, kq, vq, 100, ks, vs)
    kd = (kq.astype(jnp.float32) * ks[:, :, None, :]).astype(jnp.bfloat16)
    # Dequant the flat V: each head's 64-lane chunk gets its (B, H, S) scale.
    vs_flat = jnp.repeat(jnp.transpose(vs, (0, 2, 1)), d, axis=-1)  # (B,S,D)
    vd = (vq.astype(jnp.float32) * vs_flat).astype(jnp.bfloat16)
    ref = decode_ops.cross_attention_decode(q, kd, vd, 100)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_cross_attention_kv_len_masks_padding():
    """Keys at/after kv_len never contribute, whatever garbage they hold."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 3, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 8, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 16, 16)), jnp.float32)
    out = decode_ops.cross_attention_decode(q, k, v, 10)
    k2 = k.at[:, :, :, 10:].set(1e9)
    v2 = v.at[:, 10:].set(-1e9)
    out2 = decode_ops.cross_attention_decode(q, k2, v2, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               atol=1e-6, rtol=1e-6)


def test_ffn_decode_matches_unfused():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 64)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(64, 256)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(256, 64)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    out = decode_ops.ffn_decode(x, w1, b1, w2, b2)
    ref = jnp.dot(jax.nn.gelu(jnp.dot(x, w1) + b1, approximate=False),
                  w2) + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_erf_approximation_accuracy():
    """Megastep's A&S 7.1.26 erf: |err| <= 1.5e-7 exact; float32 evaluation
    adds rounding — 1e-6 total is still ~4000x below bf16 resolution."""
    import scipy.special as sp

    from whisper_medusa_tpu.ops import megastep

    z = np.linspace(-6, 6, 20001).astype(np.float32)
    ours = np.asarray(megastep._erf_f32(jnp.asarray(z)))
    assert np.abs(ours - sp.erf(z.astype(np.float64))).max() < 1e-6
