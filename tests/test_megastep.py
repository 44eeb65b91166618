"""Parity tests: fused whole-stack decode kernel vs the XLA scan path.

Runs the Pallas kernel in interpreter mode on the CPU mesh and checks the
fused ``decode_step`` branch (ops/megastep.py) reproduces the scan branch —
hidden states and cache writes — for prefill, vanilla, chain and tree chunks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_medusa_tpu.config import WhisperDims
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.ops import megastep


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(megastep, "_INTERPRET", True)
    monkeypatch.setattr(megastep, "_ENABLED", True)


def dims_for(ffn=512):
    return WhisperDims(
        vocab_size=256, num_mel_bins=16, d_model=128,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=ffn,
        max_source_positions=32, max_target_positions=64,
    )


def _randomize_small_params(tree, key):
    """Give every bias/layernorm leaf a distinct nonzero value.

    At init, biases are zero and layernorm rows identical across layers — a
    kernel that reads the wrong layer's small-params block would still pass
    parity.  (Exactly that bug hid in the sp BlockSpec prefetch advance until
    the int8 scale rows, which DO differ per layer, exposed it.)"""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if leaf.ndim >= 3 or leaf.dtype != jnp.bfloat16:
            out.append(leaf)         # matrices / caches stay as initialized
        else:
            out.append(leaf + 0.05 * jax.random.normal(
                k, leaf.shape).astype(leaf.dtype))
    return jax.tree.unflatten(treedef, out)


def setup(ffn=512, max_len=48):
    dims = dims_for(ffn)
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), dims, jnp.bfloat16)
    wp["decoder"]["layers"] = _randomize_small_params(
        wp["decoder"]["layers"], jax.random.PRNGKey(42))
    enc = (jax.random.normal(jax.random.PRNGKey(1), (1, 32, dims.d_model))
           .astype(jnp.bfloat16))
    cache = whisper.init_cache(wp, dims, enc, max_len)
    return dims, wp, cache


def both_paths(dims, wp, cache, tokens, offsets, **kw):
    """Run decode_step with the fused branch on and off."""
    assert megastep.available(
        wp["decoder"]["layers"], dims.d_model, dims.decoder_attention_heads,
        tokens.shape[0], tokens.shape[1], False, 1)
    out_f, cache_f = whisper.decode_step(wp, dims, tokens, cache, offsets, **kw)
    old = megastep._ENABLED
    megastep._ENABLED = False
    try:
        out_x, cache_x = whisper.decode_step(wp, dims, tokens, cache, offsets, **kw)
    finally:
        megastep._ENABLED = old
    return (out_f, cache_f), (out_x, cache_x)


def assert_close(a, b, tol=3e-2):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol)


def _dequant_slabs(slab, scales, num_heads):
    """(L, B, S, D) int8 x (L, B, S, H) scales -> f32 head-flat rows."""
    l, b, s, d = slab.shape
    dh = d // num_heads
    x = np.asarray(slab, np.float32).reshape(l, b, s, num_heads, dh)
    return (x * np.asarray(scales, np.float32)[..., None]
            ).reshape(l, b, s, d)


@pytest.mark.parametrize("t,off", [(1, 7), (4, 0), (5, 4)])
def test_chain_parity(t, off):
    dims, wp, cache = setup()
    # Pre-populate the committed slab region so history attention is exercised.
    if off:
        pre = jax.random.randint(jax.random.PRNGKey(2), (1, off), 0, 255)
        _, cache = whisper.decode_step(wp, dims, pre, cache,
                                       jnp.zeros((1,), jnp.int32))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, t), 0, 255)
    offsets = jnp.full((1,), off, jnp.int32)
    (of, cf), (ox, cx) = both_paths(dims, wp, cache, tokens, offsets)
    assert_close(of.hidden, ox.hidden)
    assert_close(of.pre_norm, ox.pre_norm)
    # Cache rows written this step must agree; untouched rows are identical.
    assert_close(cf.self_k[:, :, off:off + t], cx.self_k[:, :, off:off + t])
    assert_close(cf.self_v[:, :, off:off + t], cx.self_v[:, :, off:off + t])
    assert_close(cf.self_k[:, :, :off], cx.self_k[:, :, :off])


def test_tree_parity():
    dims, wp, cache = setup()
    pre = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, 255)
    _, cache = whisper.decode_step(wp, dims, pre, cache,
                                   jnp.zeros((1,), jnp.int32))
    # Small branching tree: root + two children + one grandchild.
    t = 4
    chunk_mask = jnp.asarray([
        [1, 0, 0, 0],
        [1, 1, 0, 0],
        [1, 0, 1, 0],
        [1, 1, 0, 1],
    ], jnp.bool_)
    rel = jnp.asarray([0, 1, 1, 2], jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, t), 0, 255)
    offsets = jnp.full((1,), 6, jnp.int32)
    (of, cf), (ox, cx) = both_paths(dims, wp, cache, tokens, offsets,
                                    rel_positions=rel, chunk_mask=chunk_mask)
    assert_close(of.hidden, ox.hidden)
    assert_close(cf.self_k[:, :, 6:6 + t], cx.self_k[:, :, 6:6 + t])


def test_ffn_chunked_parity():
    # decoder_ffn_dim=2048 -> the kernel splits the FFN into 2 streamed chunks.
    dims, wp, cache = setup(ffn=2048)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 3), 0, 255)
    offsets = jnp.zeros((1,), jnp.int32)
    (of, _), (ox, _) = both_paths(dims, wp, cache, tokens, offsets)
    assert_close(of.hidden, ox.hidden)


def test_gating():
    dims, wp, cache = setup()
    lp = wp["decoder"]["layers"]
    ok = lambda **kw: megastep.available(
        lp, kw.get("d", 128), 2, kw.get("b", 1), kw.get("t", 4),
        kw.get("block", False), kw.get("cb", 1))
    assert ok()
    assert ok(b=2)                # small-batch latency serving
    assert ok(block=True)         # medusa-block extra layer is fused too
    assert ok(b=8)                # batched serving (phase-split windows)
    assert not ok(b=9)            # capped (see available()) -> XLA scan path
    assert not ok(t=17)           # chunk too long
    assert not ok(cb=2)           # beam-folded cross attention
    assert not ok(d=130)          # unaligned model dim


def test_sequential_decode_matches_teacher_forced():
    """Fused incremental decode over several steps == teacher-forced pass."""
    dims, wp, cache = setup()
    enc = (jax.random.normal(jax.random.PRNGKey(1), (1, 32, dims.d_model))
           .astype(jnp.bfloat16))
    toks = jax.random.randint(jax.random.PRNGKey(5), (1, 9), 0, 255)
    full = whisper.decode_train(wp, dims, toks, enc)
    cache = whisper.init_cache(wp, dims, enc, 48)
    hs = []
    off = 0
    for t0, t1 in ((0, 4), (4, 6), (6, 9)):
        out, cache = whisper.decode_step(
            wp, dims, toks[:, t0:t1], cache, jnp.full((1,), off, jnp.int32))
        hs.append(out.hidden)
        off = t1
    inc = jnp.concatenate(hs, axis=1)
    assert_close(inc, full.hidden)


@pytest.mark.parametrize("ffn", [512, 2048])
@pytest.mark.parametrize("w8a8", ["0", "1"])
def test_int8_parity(ffn, w8a8, monkeypatch):
    """int8 megastep == XLA qmm/scaled-attention path.

    W8A8=0 (W8A16): bit-comparable — weights dequantize to bf16 before the
    MXU, same numerics as the XLA path (strict tolerance).  W8A8=1 (default
    serving mode): activations are ALSO quantized per row so int8 feeds the
    MXU directly; vs the W8A16 reference that adds ~0.4% activation
    quantization noise per matmul (looser tolerance)."""
    monkeypatch.setenv("WM_MEGASTEP_W8A8", w8a8)
    tol = 3e-2 if w8a8 == "0" else 8e-2
    from whisper_medusa_tpu.ops.qmm import quantize_decoder

    dims, wp, _ = setup(ffn=ffn)
    wq, _ = quantize_decoder(wp)
    enc = (jax.random.normal(jax.random.PRNGKey(1), (1, 32, dims.d_model))
           .astype(jnp.bfloat16))
    cache = whisper.init_cache(wq, dims, enc, 48)
    assert cache.cross_k.dtype == jnp.int8          # int8 serving cross cache
    assert cache.cross_k_s is not None
    pre = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, 255)
    _, cache = whisper.decode_step(wq, dims, pre, cache,
                                   jnp.zeros((1,), jnp.int32))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0, 255)
    offsets = jnp.full((1,), 5, jnp.int32)
    (of, cf), (ox, cx) = both_paths(dims, wq, cache, tokens, offsets)
    assert_close(of.hidden, ox.hidden, tol=tol)
    # int8 self-KV slabs: both paths quantize their own (bf16-rounded) K/V
    # rows, so a row near a rounding boundary may differ by 1 LSB — compare
    # the DEQUANTIZED rows, which is what attention consumes.
    assert cf.self_k.dtype == jnp.int8 and cf.self_s is not None
    for f_c, x_c, sl in ((cf, cx, slice(0, dims.decoder_attention_heads)),):
        fd = _dequant_slabs(f_c.self_k, f_c.self_s[..., sl],
                            dims.decoder_attention_heads)
        xd = _dequant_slabs(x_c.self_k, x_c.self_s[..., sl],
                            dims.decoder_attention_heads)
        assert_close(fd[:, :, 5:9], xd[:, :, 5:9], tol=tol)
        vsl = slice(dims.decoder_attention_heads,
                    2 * dims.decoder_attention_heads)
        fdv = _dequant_slabs(f_c.self_v, f_c.self_s[..., vsl],
                             dims.decoder_attention_heads)
        xdv = _dequant_slabs(x_c.self_v, x_c.self_s[..., vsl],
                             dims.decoder_attention_heads)
        assert_close(fdv[:, :, 5:9], xdv[:, :, 5:9], tol=tol)


def test_int8_gating():
    from whisper_medusa_tpu.ops.qmm import quantize_decoder

    dims, wp, _ = setup()
    wq, _ = quantize_decoder(wp)
    assert megastep.available(wq["decoder"]["layers"], 128, 2, 1, 4, False, 1)
    # Partially-quantized tree (fc1 left bf16) must fall back to the qmm path.
    mixed = jax.tree.map(lambda x: x, wq)
    mixed["decoder"]["layers"]["fc1_w"] = wp["decoder"]["layers"]["fc1_w"]
    assert not megastep.available(
        mixed["decoder"]["layers"], 128, 2, 1, 4, False, 1)


def test_batched_parity_ragged_offsets():
    """B=2 fused decode with different per-example offsets == XLA scan."""
    dims, wp, _ = setup()
    enc = (jax.random.normal(jax.random.PRNGKey(1), (2, 32, dims.d_model))
           .astype(jnp.bfloat16))
    cache = whisper.init_cache(wp, dims, enc, 48)
    # Ragged history: example 0 has 6 committed rows, example 1 has 3.
    megastep._ENABLED = False
    try:
        pre = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 0, 255)
        _, cache = whisper.decode_step(wp, dims, pre, cache,
                                       jnp.zeros((2,), jnp.int32))
    finally:
        megastep._ENABLED = True
    offsets = jnp.asarray([6, 3], jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 4), 0, 255)
    (of, cf), (ox, cx) = both_paths(dims, wp, cache, tokens, offsets)
    assert_close(of.hidden, ox.hidden)
    for i, off in enumerate([6, 3]):
        assert_close(cf.self_k[:, i, off:off + 4], cx.self_k[:, i, off:off + 4])
        assert_close(cf.self_v[:, i, off:off + 4], cx.self_v[:, i, off:off + 4])


@pytest.mark.parametrize("b", [3, 6])
def test_batched_int8_parity(b, monkeypatch):
    """Batched int8 fused decode (int8 weights + cross + self caches) == XLA
    path.  b=3 exercises the per-head transpose self-KV dequant, b=6 the
    expansion-matmul dequant (batch >= 5); both need the WM_MEGASTEP_MAX_B
    interpreter override."""
    from whisper_medusa_tpu.ops.qmm import quantize_decoder

    monkeypatch.setenv("WM_MEGASTEP_MAX_B", "8")
    dims, wp, _ = setup()
    wq, _ = quantize_decoder(wp)
    enc = (jax.random.normal(jax.random.PRNGKey(1), (b, 32, dims.d_model))
           .astype(jnp.bfloat16))
    cache = whisper.init_cache(wq, dims, enc, 48)
    # Commit real history first so the scale-slab READ path is exercised.
    pre = jax.random.randint(jax.random.PRNGKey(2), (b, 5), 0, 255)
    _, cache = whisper.decode_step(wq, dims, pre, cache,
                                   jnp.zeros((b,), jnp.int32))
    offsets = jnp.full((b,), 5, jnp.int32)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (b, 5), 0, 255)
    (of, cf), (ox, cx) = both_paths(dims, wq, cache, tokens, offsets)
    assert_close(of.hidden, ox.hidden)
    nh = dims.decoder_attention_heads
    fd = _dequant_slabs(cf.self_k, cf.self_s[..., :nh], nh)
    xd = _dequant_slabs(cx.self_k, cx.self_s[..., :nh], nh)
    assert_close(fd[:, :, 5:10], xd[:, :, 5:10])


def _block_setup(quantize=False, max_len=48):
    """Model + medusa block layer + (nl+1)-slot cache (block serving path)."""
    from whisper_medusa_tpu.config import MedusaConfig
    from whisper_medusa_tpu.models import medusa as medusa_mod

    dims = dims_for()
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), dims, jnp.bfloat16)
    wp["decoder"]["layers"] = _randomize_small_params(
        wp["decoder"]["layers"], jax.random.PRNGKey(42))
    mc = MedusaConfig(medusa_num_heads=2, medusa_hidden_size=dims.d_model,
                      medusa_heads_type="medusa_block",
                      medusa_choices=(1, 1, 1))
    mp = medusa_mod.init_medusa_params(jax.random.PRNGKey(7), dims, mc, wp,
                                       jnp.bfloat16)
    block = _randomize_small_params(mp["block"], jax.random.PRNGKey(43))
    if quantize:
        from whisper_medusa_tpu.ops.qmm import quantize_decoder

        wp, mp2 = quantize_decoder(wp, {"block": block})
        block = mp2["block"]
    enc = (jax.random.normal(jax.random.PRNGKey(1), (1, 32, dims.d_model))
           .astype(jnp.bfloat16))
    cache = whisper.init_cache(wp, dims, enc, max_len, extra_layers=1)
    cache = whisper.set_block_cross_kv(cache, block, enc,
                                       dims.decoder_attention_heads)
    return dims, wp, block, cache


@pytest.mark.parametrize("mode", ["bf16", "w8a16", "w8a8"])
def test_block_variant_parity(mode, monkeypatch):
    """medusa_block fused decode (extra grid layer + ln_post transition + last
    cache slot) == scan path: hidden, block_hidden, and both cache slabs.
    w8a8 adds per-matmul activation-quantization noise vs the W8A16 scan
    reference (see test_int8_parity) — looser tolerance."""
    quantize = mode != "bf16"
    monkeypatch.setenv("WM_MEGASTEP_W8A8", "1" if mode == "w8a8" else "0")
    tol = 8e-2 if mode == "w8a8" else 3e-2
    dims, wp, block, cache = _block_setup(quantize)
    ext = whisper.extend_layers_with_block(wp["decoder"]["layers"], block)
    assert megastep.available(ext, dims.d_model,
                              dims.decoder_attention_heads, 1, 4, True, 1)
    pre = jax.random.randint(jax.random.PRNGKey(2), (1, 5), 0, 255)
    kw = dict(block_params=block, fused_block_layers=ext)
    _, cache = whisper.decode_step(wp, dims, pre, cache,
                                   jnp.zeros((1,), jnp.int32), **kw)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0, 255)
    offsets = jnp.full((1,), 5, jnp.int32)
    of, cf = whisper.decode_step(wp, dims, tokens, cache, offsets, **kw)
    old = megastep._ENABLED
    megastep._ENABLED = False
    try:
        ox, cx = whisper.decode_step(wp, dims, tokens, cache, offsets, **kw)
    finally:
        megastep._ENABLED = old
    assert of.block_hidden is not None and ox.block_hidden is not None
    assert_close(of.hidden, ox.hidden, tol=tol)
    assert_close(of.block_hidden, ox.block_hidden, tol=tol)
    # Every slab slot — including the block layer's (last) — must agree.
    # int8 self-KV mode compares dequantized rows (see test_int8_parity).
    if cf.self_k.dtype == jnp.int8:
        nh = dims.decoder_attention_heads
        ks, vs = slice(0, nh), slice(nh, 2 * nh)
        fk = _dequant_slabs(cf.self_k, cf.self_s[..., ks], nh)
        xk = _dequant_slabs(cx.self_k, cx.self_s[..., ks], nh)
        fv = _dequant_slabs(cf.self_v, cf.self_s[..., vs], nh)
        xv = _dequant_slabs(cx.self_v, cx.self_s[..., vs], nh)
    else:
        fk, xk, fv, xv = cf.self_k, cx.self_k, cf.self_v, cx.self_v
    assert_close(fk[:, :, 5:9], xk[:, :, 5:9], tol=tol)
    assert_close(fv[:, :, 5:9], xv[:, :, 5:9], tol=tol)
    assert_close(fk[-1, :, :5], xk[-1, :, :5], tol=tol)


def test_block_variant_generate_parity():
    """End-to-end speculative decode tokens agree fused vs scan for the
    medusa_block variant (the engine path the reference serves by default)."""
    from whisper_medusa_tpu.config import tiny_test_config
    from whisper_medusa_tpu.models.api import WhisperMedusaModel

    cfg = tiny_test_config(vocab_size=51865, medusa_num_heads=3,
                           medusa_heads_type="medusa_block")
    model = WhisperMedusaModel.from_random(cfg, seed=3)
    rng = np.random.default_rng(5)
    f = rng.normal(size=(1, cfg.dims.num_mel_bins,
                         cfg.dims.num_frames)).astype(np.float32)
    a = model.generate(f, language="en", max_length=20)
    megastep._ENABLED = False
    try:
        model._jit_cache.clear()
        b = model.generate(f, language="en", max_length=20)
    finally:
        megastep._ENABLED = True
    np.testing.assert_array_equal(a.sequences, b.sequences)


def dims_4h(ffn=1024):
    """4-head / d_model=256 tiny model: head groups of 2 keep the group
    column width at 128 lanes, so the cross head-group phase split
    (_pick_phases nc=2) is exercisable at test scale."""
    return WhisperDims(
        vocab_size=256, num_mel_bins=16, d_model=256,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=ffn,
        max_source_positions=32, max_target_positions=64,
    )


@pytest.mark.parametrize("phases,int8", [("2,1", False), ("2,2", False),
                                         ("2,1", True), ("4,1", False)])
def test_cross_group_split_parity(phases, int8, monkeypatch):
    """Batch-3 fused decode with the cross phase split into head groups
    (WM_MEGASTEP_FORCE_PHASES pins the split the VMEM estimator would pick
    at real batched-serving shapes) == XLA scan path."""
    monkeypatch.setenv("WM_MEGASTEP_FORCE_PHASES", phases)
    dims = dims_4h()
    wp = whisper.init_whisper_params(jax.random.PRNGKey(0), dims, jnp.bfloat16)
    wp["decoder"]["layers"] = _randomize_small_params(
        wp["decoder"]["layers"], jax.random.PRNGKey(42))
    if int8:
        from whisper_medusa_tpu.ops.qmm import quantize_decoder

        wp, _ = quantize_decoder(wp)
    enc = (jax.random.normal(jax.random.PRNGKey(1), (3, 32, dims.d_model))
           .astype(jnp.bfloat16))
    cache = whisper.init_cache(wp, dims, enc, 48)
    # Ragged committed history per example.
    pre = jax.random.randint(jax.random.PRNGKey(2), (3, 6), 0, 255)
    _, cache = whisper.decode_step(wp, dims, pre, cache,
                                   jnp.zeros((3,), jnp.int32))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (3, 4), 0, 255)
    offsets = jnp.asarray([6, 3, 5], jnp.int32)
    (of, cf), (ox, cx) = both_paths(dims, wp, cache, tokens, offsets)
    assert_close(of.hidden, ox.hidden)
    nh = dims.decoder_attention_heads
    if cf.self_k.dtype == jnp.int8:   # compare dequantized (see test_int8_parity)
        fk = _dequant_slabs(cf.self_k, cf.self_s[..., :nh], nh)
        xk = _dequant_slabs(cx.self_k, cx.self_s[..., :nh], nh)
        fv = _dequant_slabs(cf.self_v, cf.self_s[..., nh:2 * nh], nh)
        xv = _dequant_slabs(cx.self_v, cx.self_s[..., nh:2 * nh], nh)
    else:
        fk, xk, fv, xv = cf.self_k, cx.self_k, cf.self_v, cx.self_v
    for i, off in enumerate([6, 3, 5]):
        assert_close(fk[:, i, off:off + 4], xk[:, i, off:off + 4])
        assert_close(fv[:, i, off:off + 4], xv[:, i, off:off + 4])
