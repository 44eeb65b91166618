"""Polynomial exact-GELU (ops/gelu.py) accuracy vs jax.nn.gelu's erf."""

import numpy as np

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.ops import gelu as gelu_mod


def test_erf_poly_accuracy():
    z = jnp.asarray(np.linspace(-12.0, 12.0, 200001), jnp.float32)
    ref = jax.lax.erf(z)
    got = gelu_mod.erf(z)
    assert float(jnp.max(jnp.abs(ref - got))) < 2e-6


def test_gelu_poly_matches_exact_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1 << 18,)) * 4.0, jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    got = gelu_mod.gelu(x)
    assert float(jnp.max(jnp.abs(ref - got))) < 5e-6


def test_gelu_poly_bf16_roundtrip():
    """At bf16 activation precision the polynomial is indistinguishable."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1 << 16,)) * 3.0, jnp.bfloat16)
    ref = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
    got = gelu_mod.gelu(x).astype(jnp.float32)
    # one bf16 ulp of slack around the f32 reference
    assert float(jnp.max(jnp.abs(ref - got))) < 0.02
    # The polynomial (f32 internal) is at least as close to the f32 truth as
    # jax.nn.gelu evaluated in bf16 arithmetic.
    native = jax.nn.gelu(x, approximate=False).astype(jnp.float32)
    err_poly = float(jnp.mean(jnp.abs(ref - got)))
    err_native = float(jnp.mean(jnp.abs(ref - native)))
    assert err_poly <= err_native + 1e-6


def test_gelu_tails_and_zero():
    x = jnp.asarray([-50.0, -6.0, 0.0, 6.0, 50.0], jnp.float32)
    got = np.asarray(gelu_mod.gelu(x))
    np.testing.assert_allclose(got, [0.0, 0.0, 0.0, 6.0, 50.0], atol=1e-5)
