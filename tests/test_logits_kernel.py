"""Parity tests for the streaming vocab-projection kernel (ops/logits.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_medusa_tpu.ops import logits as logits_mod


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(logits_mod, "_INTERPRET", True)
    monkeypatch.setattr(logits_mod, "_ENABLED", True)


@pytest.mark.parametrize("m", [1, 11, 121])
@pytest.mark.parametrize("v", [8192, 8192 + 665])  # aligned + ragged vocab edge
def test_stream_matches_dot(m, v):
    d = 256
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (m, d), jnp.float32).astype(jnp.bfloat16)
    w = (jax.random.normal(k2, (v, d), jnp.float32) * 0.02).astype(jnp.bfloat16)

    ref = jnp.dot(x, w.T, preferred_element_type=jnp.float32)
    got = logits_mod.project_logits_stream(x, w)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_batched_shape_roundtrip():
    d, v = 256, 8192
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 7, d)).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (v, d)).astype(jnp.bfloat16)
    got = logits_mod.project_logits_stream(x, w)
    assert got.shape == (3, 2, 7, v)
    ref = jnp.dot(x.reshape(-1, d), w.T, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, v), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gating():
    assert not logits_mod.kernel_available(512, 51865, 1280)   # M too large
    assert not logits_mod.kernel_available(1, 4096, 1280)      # vocab too small
    assert not logits_mod.kernel_available(1, 51865, 1283)     # unaligned D
