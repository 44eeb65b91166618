"""Parity tests: JAX Whisper backbone vs a randomly-initialized HF torch Whisper.

The reference leans on HF ``WhisperForConditionalGeneration`` for all backbone compute
(reference: whisper_medusa/models/model.py:46-131); these tests pin our re-implementation
to the same numerics without any network access by instantiating a small random HF
model locally and converting its weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_medusa_tpu.config import WhisperDims
from whisper_medusa_tpu.models import convert, whisper


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    dims = WhisperDims(
        vocab_size=120,
        num_mel_bins=16,
        d_model=48,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=96,
        decoder_ffn_dim=96,
        max_source_positions=24,
        max_target_positions=32,
    )
    hf_cfg = WhisperConfig(
        vocab_size=dims.vocab_size,
        num_mel_bins=dims.num_mel_bins,
        d_model=dims.d_model,
        encoder_layers=dims.encoder_layers,
        decoder_layers=dims.decoder_layers,
        encoder_attention_heads=dims.encoder_attention_heads,
        decoder_attention_heads=dims.decoder_attention_heads,
        encoder_ffn_dim=dims.encoder_ffn_dim,
        decoder_ffn_dim=dims.decoder_ffn_dim,
        max_source_positions=dims.max_source_positions,
        max_target_positions=dims.max_target_positions,
        attn_implementation="eager",
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params = convert.from_hf_whisper(hf.state_dict(), dims)
    return hf, params, dims


def test_encoder_parity(hf_pair):
    import torch

    hf, params, dims = hf_pair
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, dims.num_mel_bins, 2 * dims.max_source_positions)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    out = np.asarray(whisper.encode(params, dims, jnp.asarray(mel)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-2)


def test_decoder_teacher_forced_parity(hf_pair):
    import torch

    hf, params, dims = hf_pair
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(2, dims.num_mel_bins, 2 * dims.max_source_positions)).astype(
        np.float32
    )
    tokens = rng.integers(0, dims.vocab_size, size=(2, 7)).astype(np.int32)
    with torch.no_grad():
        ref = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    enc = whisper.encode(params, dims, jnp.asarray(mel))
    dec = whisper.decode_train(params, dims, jnp.asarray(tokens), enc)
    logits = np.asarray(whisper.project_logits(params, dec.hidden))
    assert logits.shape == ref.shape
    np.testing.assert_allclose(logits, ref, atol=3e-3, rtol=2e-2)


def test_incremental_decode_matches_teacher_forced(hf_pair):
    """decode_step over chunks with the KV cache == full teacher-forced pass."""
    _, params, dims = hf_pair
    rng = np.random.default_rng(2)
    b, t = 2, 12
    mel = rng.normal(size=(b, dims.num_mel_bins, 2 * dims.max_source_positions)).astype(
        np.float32
    )
    tokens = jnp.asarray(rng.integers(0, dims.vocab_size, size=(b, t)), jnp.int32)
    enc = whisper.encode(params, dims, jnp.asarray(mel))

    full = whisper.decode_train(params, dims, tokens, enc).hidden

    cache = whisper.init_cache(params, dims, enc, max_len=dims.max_target_positions)
    # Process in uneven chunks: 5, 3, 4.
    hiddens = []
    offsets = jnp.zeros((b,), jnp.int32)
    for lo, hi in [(0, 5), (5, 8), (8, 12)]:
        out, cache = whisper.decode_step(
            params, dims, tokens[:, lo:hi], cache, offsets
        )
        hiddens.append(out.hidden)
        offsets = offsets + (hi - lo)
    inc = jnp.concatenate(hiddens, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=2e-4, rtol=2e-3)


def test_incremental_decode_per_example_offsets(hf_pair):
    """Batch entries at different lengths decode correctly (no batch-1 limit)."""
    _, params, dims = hf_pair
    rng = np.random.default_rng(3)
    b, t = 3, 10
    mel = rng.normal(size=(b, dims.num_mel_bins, 2 * dims.max_source_positions)).astype(
        np.float32
    )
    tokens = jnp.asarray(rng.integers(0, dims.vocab_size, size=(b, t)), jnp.int32)
    enc = whisper.encode(params, dims, jnp.asarray(mel))
    full = whisper.decode_train(params, dims, tokens, enc).hidden

    # Example i has prefix length 4+i already in cache; then decode 3 more tokens.
    prefix_lens = jnp.asarray([4, 5, 6], jnp.int32)
    cache = whisper.init_cache(params, dims, enc, max_len=dims.max_target_positions)
    # Prefill with max prefix then rewind: process per-example prefix by masking —
    # simplest correct approach: prefill each prefix chunk-by-chunk with equal offsets
    # is impossible with ragged lengths, so prefill length-padded and rely on causal
    # masking: feed 6 tokens for everyone, then only trust each example's own region.
    out, cache = whisper.decode_step(
        params, dims, tokens[:, :6], cache, jnp.zeros((b,), jnp.int32)
    )
    # Now decode tokens[prefix_len : prefix_len+3] per example at its own offset.
    gather_idx = prefix_lens[:, None] + jnp.arange(3)[None, :]
    chunk = jnp.take_along_axis(tokens, gather_idx, axis=1)
    out, cache = whisper.decode_step(params, dims, chunk, cache, prefix_lens)

    for i in range(b):
        pl = int(prefix_lens[i])
        got = np.asarray(out.hidden[i])
        want = np.asarray(full[i, pl : pl + 3])
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_conv1d_stem_matches_lax_conv():
    """The im2col matmul stem (round 5: replaces XLA's 1-6%-MFU conv
    lowering) computes exactly lax.conv_general_dilated's taps for both
    stride-1 and stride-2, odd and even lengths."""
    import numpy as np
    from jax import lax

    from whisper_medusa_tpu.models import whisper as W
    from whisper_medusa_tpu.ops import gelu as gelu_mod

    rng = np.random.default_rng(0)
    for t, stride in ((3000, 1), (3000, 2), (17, 1), (17, 2), (8, 2)):
        cin, cout = 16, 24
        x = jnp.asarray(rng.normal(size=(2, t, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, cin, cout)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
        got = W.conv1d_stem(x, w, b, stride=stride)
        ref = lax.conv_general_dilated(
            x, w, (stride,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        ref = gelu_mod.gelu(ref + b)
        assert got.shape == ref.shape, (t, stride, got.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
