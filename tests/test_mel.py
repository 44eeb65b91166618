"""Log-mel frontend parity vs HF WhisperFeatureExtractor (pure-code dependency,
no network).  Reference invokes the HF extractor at dataset.py:77-79 and
eval_whisper_medusa.py:46-50."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_medusa_tpu.ops import mel


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import WhisperFeatureExtractor

    return WhisperFeatureExtractor()


def test_mel_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ours = mel.mel_filter_bank()
    theirs = hf_fb(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    ).T  # HF returns (n_freqs, n_mels)
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_log_mel_matches_hf(hf_extractor):
    rng = np.random.default_rng(0)
    # 11 s of noise-with-structure; pad_or_trim to 30 s like the HF extractor does.
    wav = (0.1 * rng.normal(size=16000 * 11)).astype(np.float32)
    wav += 0.5 * np.sin(2 * np.pi * 440 * np.arange(wav.size) / 16000).astype(np.float32)

    ref = hf_extractor(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = np.asarray(mel.log_mel_spectrogram(jnp.asarray(mel.pad_or_trim(wav))))[0]
    assert ours.shape == ref.shape == (80, 3000)
    # HF computes the STFT in float64; float32 DFT cancellation at near-silent bins
    # shows up amplified in log space (and varies with reduction order across runs).
    # Bound the bulk tightly and the worst cancellation bins loosely — ~0.3 dB on the
    # (x+4)/4 scale, acoustically irrelevant.
    diff = np.abs(ours - ref)
    assert diff.max() < 0.2, diff.max()
    assert np.quantile(diff, 0.99) < 3e-3


def test_log_mel_batched(hf_extractor):
    rng = np.random.default_rng(1)
    wavs = [rng.normal(size=16000 * d).astype(np.float32) * 0.2 for d in (3, 30)]
    batch = np.stack([mel.pad_or_trim(w)[0] for w in wavs])
    ours = np.asarray(mel.log_mel_spectrogram(jnp.asarray(batch)))
    for i, w in enumerate(wavs):
        ref = hf_extractor(w, sampling_rate=16000, return_tensors="np").input_features[0]
        assert np.abs(ours[i] - ref).max() < 0.2


def test_pallas_kernel_interpret_matches_jnp():
    """Fused Pallas mel kernel (interpret mode on CPU; compiled path is exercised
    on real TPU by bench.py) vs the jnp reference implementation."""
    from whisper_medusa_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

    rng = np.random.default_rng(2)
    wav = (0.1 * rng.normal(size=(2, mel.N_SAMPLES))).astype(np.float32)
    ref = np.asarray(mel.log_mel_spectrogram(jnp.asarray(wav)))
    got = np.asarray(log_mel_spectrogram_pallas(jnp.asarray(wav), interpret=True))
    assert np.abs(ref - got).max() < 1e-3
