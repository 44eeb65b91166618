"""Custom Pallas attention kernel: parity vs the XLA formulation (interpret
mode on CPU), gradient path, and encoder padding equivalence.

The kernel is the default encoder attention on TPU (VERDICT r1 #2); these tests
pin its numerics so the TPU fast path can't drift from the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import whisper_medusa_tpu.ops.attention as A


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(A, "_INTERPRET", True)
    monkeypatch.setattr(A, "_ENABLED", True)
    # Pin a sub-sequence block so the multi-q-block grid paths stay covered
    # (the production default is whole-sequence 1536).
    monkeypatch.setattr(A, "_BLOCK_Q", 512)


def _qkv(shape, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.normal(size=shape), dtype) for _ in range(3))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("kv_len", [1024, 1000, 513])
def test_kernel_matches_xla(causal, kv_len):
    q, k, v = _qkv((2, 3, 1024, 64), seed=kv_len)
    out_k = A._attention_pallas(q, k, v, kv_len, causal)
    out_x = A._attention_xla(q, k, v, kv_len, causal)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_kernel_grad_matches_xla():
    q, k, v = _qkv((1, 2, 512, 64), seed=7)

    def loss_kernel(q, k, v):
        return jnp.sum(A._attention_custom(500, False, q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A._attention_xla(q, k, v, 500, False) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("kv_len", [1024, 999])
def test_pallas_backward_multiblock(causal, kv_len):
    """The purpose-built backward kernel (dK/dV accumulated across q-block
    grid steps) against the XLA vjp, at a sequence spanning 2 q-blocks."""
    q, k, v = _qkv((2, 2, 1024, 64), seed=11)
    g = jnp.asarray(
        np.random.default_rng(5).normal(size=q.shape), q.dtype)
    dq, dk, dv = A._attention_bwd_pallas(q, k, v, g, kv_len, causal)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: A._attention_xla(q_, k_, v_, kv_len, causal),
        q, k, v)
    dq_x, dk_x, dv_x = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_x),
                               atol=1e-4, rtol=1e-4)


def test_backward_dispatch_prefers_pallas(monkeypatch):
    """_attention_bwd routes to the purpose-built kernel by default and to
    XLA when WM_ATTENTION_BWD=xla."""
    q, k, v = _qkv((1, 1, 512, 64), seed=2)
    g = jnp.ones_like(q)
    out_pallas = A._attention_bwd(500, False, (q, k, v), g)
    monkeypatch.setenv("WM_ATTENTION_BWD", "xla")
    out_xla = A._attention_bwd(500, False, (q, k, v), g)
    for a, b in zip(out_pallas, out_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_full_attention_bhsd_dispatch():
    """Below _MIN_SEQ or on CPU without interpret -> XLA path, same results."""
    q, k, v = _qkv((1, 2, 256, 32), seed=3)
    out = A.full_attention_bhsd(q, k, v, kv_len=200, causal=True)
    ref = A._attention_xla(q, k, v, 200, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_encoder_padding_equivalence(monkeypatch):
    """Padded-and-masked encoder == unpadded encoder on the real rows.

    The TPU path pads 1500->1536 once at the stem and masks keys per layer;
    this pins that the padding never leaks into real positions."""
    from whisper_medusa_tpu.config import tiny_test_config
    from whisper_medusa_tpu.models import whisper

    cfg = tiny_test_config(max_source_positions=24).dims  # S=24, odd size
    params = whisper.init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, cfg.num_mel_bins, cfg.num_frames)),
                      jnp.float32)

    ref = whisper.encode(params, cfg, mel)

    # Force the padded branch: make the kernel "available" at tiny sizes with
    # a small block so pad_to_block(24) = 32 != 24.
    monkeypatch.setattr(A, "_MIN_SEQ", 8)
    monkeypatch.setattr(A, "_BLOCK_Q", 16)
    padded = whisper.encode(params, cfg, mel)
    assert padded.shape == ref.shape
    np.testing.assert_allclose(np.asarray(padded), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


# -------------------------- rectangular q (VERDICT r4 #2: train cross-attn)

@pytest.mark.parametrize("q_len,kv_len", [(256, 1024), (256, 1000), (512, 1536)])
def test_rect_kernel_matches_xla(q_len, kv_len):
    rng = np.random.default_rng(q_len + kv_len)
    s_pad = 1024 if kv_len <= 1024 else 1536
    q = jnp.asarray(rng.normal(size=(2, 2, q_len, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, s_pad, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, s_pad, 64)), jnp.float32)
    out_k = A._attention_pallas(q, k, v, kv_len, False)
    out_x = A._attention_xla(q, k, v, kv_len, False)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_rect_grad_matches_xla():
    """Rectangular fwd+bwd through the custom vjp (the decode_train cross
    attention shape class: T queries vs S_pad keys, pad keys masked)."""
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 1024, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 1024, 64)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(A._attention_custom(1000, False, q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A._attention_xla(q, k, v, 1000, False) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_rect_entry_pads_and_slices():
    """full_attention_bhsd pads unaligned q (224 -> 256) and slices back;
    value AND gradient match the XLA formulation, incl. dK/dV zero-fill from
    the pad rows."""
    rng = np.random.default_rng(23)
    q = jnp.asarray(rng.normal(size=(1, 2, 224, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 1024, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 1024, 64)), jnp.float32)

    def loss_entry(q, k, v):
        return jnp.sum(A.full_attention_bhsd(q, k, v, kv_len=1000) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(A._attention_xla(q, k, v, 1000, False) ** 2)

    np.testing.assert_allclose(
        np.asarray(A.full_attention_bhsd(q, k, v, kv_len=1000)),
        np.asarray(A._attention_xla(q, k, v, 1000, False)),
        atol=1e-5, rtol=1e-5)
    gk = jax.grad(loss_entry, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
