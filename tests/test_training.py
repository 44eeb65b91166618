"""Training-stack tests: loss golden-parity vs the reference torch losses,
freeze-policy semantics, and loss-decreases integration."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.config import MedusaConfig, tiny_test_config
from whisper_medusa_tpu.models import medusa as medusa_mod
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.training import losses as losses_mod
from whisper_medusa_tpu.training import train as train_mod


def _load_reference_losses():
    """Execute the reference loss module (torch-only) for golden comparison."""
    torch = pytest.importorskip("torch")
    src = open("/root/reference/whisper_medusa/utils/losses.py").read()
    ns = {}
    exec(src, ns)
    return ns["MedusaCrossEntropyLoss"], ns["MedusaKLDivLoss"], torch


@pytest.mark.parametrize("loss_on_original", [False, True])
def test_ce_matches_reference(loss_on_original):
    RefCE, _, torch = _load_reference_losses()
    rng = np.random.default_rng(0)
    h, b, t, v = 4, 2, 12, 32
    logits = rng.normal(size=(h, b, t, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, t))
    labels[:, -2:] = -100  # padding tail

    ref = RefCE(loss_on_original=loss_on_original)(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).numpy()

    ours, valid = losses_mod.medusa_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), loss_on_original)
    ours = np.asarray(ours)[np.asarray(valid)]
    np.testing.assert_allclose(ours[: len(ref)], ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("loss_on_original", [False, True])
def test_kl_matches_reference(loss_on_original):
    _, RefKL, torch = _load_reference_losses()
    rng = np.random.default_rng(1)
    h, b, t, v = 3, 2, 10, 16
    logits = rng.normal(size=(h, b, t, v)).astype(np.float32)
    teacher = rng.normal(size=(b, t, v)).astype(np.float32)

    ref = RefKL(lamda=0.7, loss_on_original=loss_on_original)(
        torch.from_numpy(logits), torch.from_numpy(teacher)
    ).numpy()
    ours = np.asarray(losses_mod.medusa_kl(
        jnp.asarray(logits), jnp.asarray(teacher), 0.7, loss_on_original))
    np.testing.assert_allclose(ours[: len(ref)], ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("loss_on_original", [False, True])
@pytest.mark.parametrize("chunk", [4, 64])
def test_streaming_losses_match_dense(loss_on_original, chunk):
    """medusa_losses_streaming (the training path since r4 — no (H',B,T,V)
    stack) == dense medusa_cross_entropy + medusa_kl, values AND gradients.
    chunk=4 forces multiple scan iterations incl. a ragged tail (t=10)."""
    rng = np.random.default_rng(3)
    h, b, t, d, v = 4, 2, 10, 8, 32
    head_stack = jnp.asarray(rng.normal(size=(h, b, t, d)), jnp.float32)
    teacher_h = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(v, d)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, t)))
    labels = labels.at[:, -2:].set(-100)

    def dense(w):
        stack = jnp.einsum("hbtd,vd->hbtv", head_stack, w)
        ce, valid = losses_mod.medusa_cross_entropy(stack, labels,
                                                    loss_on_original)
        tl = jax.lax.stop_gradient(jnp.einsum("btd,vd->btv", teacher_h, w))
        kl = losses_mod.medusa_kl(stack, tl, 0.7, loss_on_original)
        return ce, valid, kl

    def streaming(w):
        return losses_mod.medusa_losses_streaming(
            lambda x: jnp.einsum("...d,vd->...v", x, w),
            head_stack, labels, loss_on_original,
            teacher_hidden=teacher_h, kl_lamda=0.7, chunk=chunk)

    ce_d, valid_d, kl_d = dense(w)
    ce_s, valid_s, kl_s = streaming(w)
    np.testing.assert_array_equal(np.asarray(valid_d), np.asarray(valid_s))
    np.testing.assert_allclose(np.asarray(ce_s), np.asarray(ce_d),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kl_s), np.asarray(kl_d),
                               atol=1e-4, rtol=1e-4)

    def tot_d(w):
        ce, valid, kl = dense(w)
        return (jnp.sum(jnp.where(valid, ce, 0.0))
                / jnp.maximum(jnp.sum(valid), 1) + jnp.mean(kl))

    def tot_s(w):
        ce, valid, kl = streaming(w)
        return (jnp.sum(jnp.where(valid, ce, 0.0))
                / jnp.maximum(jnp.sum(valid), 1) + jnp.mean(kl))

    g_d = jax.grad(tot_d)(w)
    g_s = jax.grad(tot_s)(w)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               atol=1e-5, rtol=1e-4)


def test_streaming_ce_matches_torch_reference():
    """The same golden as test_ce_matches_reference, through the streaming
    path (identity projection on a pre-built logits stack)."""
    RefCE, _, torch = _load_reference_losses()
    rng = np.random.default_rng(0)
    h, b, t, v = 4, 2, 12, 32
    logits = rng.normal(size=(h, b, t, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, t))
    labels[:, -2:] = -100
    ref = RefCE(loss_on_original=True)(
        torch.from_numpy(logits), torch.from_numpy(labels)).numpy()
    ours, valid, _ = losses_mod.medusa_losses_streaming(
        lambda x: x, jnp.asarray(logits), jnp.asarray(labels), True, chunk=5)
    ours = np.asarray(ours)[np.asarray(valid)]
    np.testing.assert_allclose(ours[: len(ref)], ref, atol=1e-5, rtol=1e-5)


def test_short_sequence_head_masking():
    """Heads whose shift exceeds seq length are masked, not NaN
    (reference NaN-break, losses.py:60-63)."""
    rng = np.random.default_rng(2)
    h, b, t, v = 6, 1, 4, 8
    logits = jnp.asarray(rng.normal(size=(h, b, t, v)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, t)))
    ce, valid = losses_mod.medusa_cross_entropy(logits, labels, False)
    assert not np.any(np.isnan(np.asarray(ce)))
    assert np.asarray(valid)[:3].all() and not np.asarray(valid)[3:].any()


def _tiny_batch(cfg, b=2, t=10, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(
        size=(b, cfg.dims.num_mel_bins, cfg.dims.num_frames)).astype(np.float32)
    labels = rng.integers(6, cfg.dims.vocab_size, size=(b, t))
    labels[0, -2:] = -100
    return jnp.asarray(feats), jnp.asarray(labels)


@pytest.mark.parametrize("variant,policy", [
    ("base_head", "all_but_last"),      # the Medusa-Linear recipe
    ("medusa_block", "whisper"),        # the Medusa-Block recipe
])
def test_train_step_decreases_loss_and_respects_freeze(variant, policy):
    cfg = tiny_test_config(medusa_num_heads=3, medusa_heads_type=variant)
    rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    params = {"whisper": wp, "medusa": mp}

    opt = train_mod.make_optimizer("adamw", lr=3e-3, warmup_steps=0,
                                   total_steps=100, schedule="constant")
    step = jax.jit(train_mod.make_train_step(cfg, opt, policy))
    state = train_mod.init_train_state(params, opt)

    feats, labels = _tiny_batch(cfg)
    first = None
    for i in range(8):
        state, metrics = step(state, feats, labels)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first, (first, last)

    # Frozen leaves unchanged; trainable leaves changed.
    def max_delta(a, b):
        return max(float(jnp.max(jnp.abs(x - y)))
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    p0, p1 = params, state.params
    assert max_delta(p0["whisper"]["encoder"], p1["whisper"]["encoder"]) == 0
    assert max_delta(p0["medusa"]["heads"], p1["medusa"]["heads"]) > 0
    dec0 = p0["whisper"]["decoder"]["layers"]
    dec1 = p1["whisper"]["decoder"]["layers"]
    if policy == "all_but_last":
        deltas_first = max(float(jnp.max(jnp.abs(x[:-1] - y[:-1])))
                           for x, y in zip(jax.tree.leaves(dec0), jax.tree.leaves(dec1)))
        deltas_last = max(float(jnp.max(jnp.abs(x[-1] - y[-1])))
                          for x, y in zip(jax.tree.leaves(dec0), jax.tree.leaves(dec1)))
        assert deltas_first == 0
        assert deltas_last > 0
    else:
        assert max_delta(dec0, dec1) == 0


def test_kl_with_frozen_teacher_runs():
    """output_whisper_original path (reference model.py:2018-2076)."""
    base = tiny_test_config(medusa_num_heads=2)
    med = MedusaConfig(
        medusa_num_heads=2, medusa_hidden_size=base.dims.d_model,
        medusa_choices=(1, 1, 1), medusa_kl_loss=True, medusa_kl_weight=0.5,
        medusa_loss_on_original=True, output_whisper_original=True)
    cfg = base.replace(medusa=med)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    feats, labels = _tiny_batch(cfg)
    out = train_mod.medusa_train_forward(
        {"whisper": wp, "medusa": mp}, cfg, feats, labels)
    assert np.isfinite(float(out.loss))
    assert out.per_head_kl is not None


def test_shift_tokens_right():
    labels = jnp.asarray([[5, 6, 7, -100]])
    out = train_mod.shift_tokens_right(labels, pad_token_id=0,
                                       decoder_start_token_id=9)
    np.testing.assert_array_equal(np.asarray(out), [[9, 5, 6, 7]])


@pytest.mark.parametrize("variant,kl", [
    ("base_head", False), ("medusa_block", True)])
@pytest.mark.parametrize("policy", ["whisper", "all_but_last"])
def test_structural_freeze_grads_match_masked_full_backward(variant, kl, policy):
    """freeze_policy prunes the backward structurally (stop_gradient at the
    backbone boundary / grad_last_only decoder split) — the masked gradients
    must be bit-identical to the full-backward-then-mask formulation."""
    import dataclasses as _dc
    base = tiny_test_config(medusa_num_heads=2, medusa_heads_type=variant)
    cfg = base
    if kl:
        cfg = base.replace(medusa=_dc.replace(
            base.medusa, medusa_kl_loss=True, medusa_kl_weight=0.5,
            output_whisper_original=True))
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    # Nudge heads off identity-init so head grads are non-trivial.
    mp = jax.tree.map(lambda a: a + 0.01, mp)
    params = {"whisper": wp, "medusa": mp}
    feats, labels = _tiny_batch(cfg)

    def loss_full(p):
        return train_mod.medusa_train_forward(p, cfg, feats, labels).loss

    def loss_pruned(p):
        return train_mod.medusa_train_forward(
            p, cfg, feats, labels, freeze_policy=policy).loss

    l0, g0 = jax.jit(jax.value_and_grad(loss_full))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss_pruned))(params)
    assert float(l0) == pytest.approx(float(l1), abs=1e-6)
    mask = train_mod.trainable_mask(params, policy)
    g0m = jax.tree.leaves(train_mod.apply_mask(g0, mask))
    g1m = jax.tree.leaves(train_mod.apply_mask(g1, mask))
    for a, b in zip(g0m, g1m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # The pruned backward must also produce exact zeros for frozen leaves
    # (not just masked-to-zero): whisper grads are structurally absent.
    if policy == "whisper":
        assert all(float(jnp.max(jnp.abs(g))) == 0.0
                   for g in jax.tree.leaves(g1["whisper"]))


def test_dots_remat_policy_grad_parity():
    """remat='dots' (selective checkpoint) must not change gradients."""
    cfg = tiny_test_config(medusa_num_heads=2)
    r1, r2 = jax.random.split(jax.random.PRNGKey(0))
    wp = whisper.init_whisper_params(r1, cfg.dims)
    mp = medusa_mod.init_medusa_params(r2, cfg.dims, cfg.medusa, wp)
    mp = jax.tree.map(lambda a: a + 0.01, mp)
    params = {"whisper": wp, "medusa": mp}
    feats, labels = _tiny_batch(cfg)

    def loss(p, remat):
        return train_mod.medusa_train_forward(p, cfg, feats, labels,
                                              remat=remat).loss

    g_full = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_dots = jax.jit(jax.grad(lambda p: loss(p, "dots")))(params)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
