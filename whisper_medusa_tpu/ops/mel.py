"""Whisper log-mel frontend — TPU-native (matmul-DFT, MXU-friendly).

Replaces the reference's host-side HF ``WhisperFeatureExtractor`` (numpy/torch STFT;
invoked at reference: whisper_medusa/dataset/dataset.py:77-79 and
eval_whisper_medusa.py:46-50) with an on-device implementation:

  * framing (400-sample Hann window, hop 160, reflect-padded center STFT),
  * DFT as two dense matmuls against cos/sin bases (n_fft=400 -> 201 bins) — this is
    MXU-shaped work, unlike an FFT butterfly,
  * mel projection (80 Slaney-scale filters) folded into a single matmul,
  * log10 + dynamic-range clamp + Whisper normalization.

Everything is static-shape: 30 s of 16 kHz audio -> (80, 3000).
A fused Pallas kernel version lives in :mod:`whisper_medusa_tpu.ops.mel_pallas`.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH       # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH           # 3000


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney area normalization, == HF/librosa)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = freq / f_sp
    above = freq >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    hz = mel * f_sp
    above = mel >= min_log_mel
    hz = np.where(above, min_log_hz * np.exp(logstep * (mel - min_log_mel)), hz)
    return hz


@lru_cache(maxsize=4)
def mel_filter_bank(
    n_freqs: int = N_FFT // 2 + 1,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    sample_rate: int = SAMPLE_RATE,
) -> np.ndarray:
    """(n_mels, n_freqs) triangular Slaney-normalized filterbank."""
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up)).T           # (n_mels, n_freqs)
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb = fb * enorm[:, None]
    return fb.astype(np.float32)


@lru_cache(maxsize=2)
def dft_mel_basis(n_mels: int = 80) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Windowed cos/sin DFT bases and the mel projection.

    Returns (cos_basis, sin_basis, mel_fb):
      cos/sin: (N_FFT, n_freqs) with the Hann window folded in,
      mel_fb:  (n_freqs, n_mels).
    """
    n_freqs = N_FFT // 2 + 1
    # Periodic Hann (matches torch.hann_window / HF window_function("hann"))
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    k = np.arange(n_freqs)[None, :]
    n = np.arange(N_FFT)[:, None]
    ang = 2.0 * np.pi * n * k / N_FFT
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b, mel_filter_bank(n_freqs, n_mels).T.astype(np.float32)


# ---------------------------------------------------------------------------
# Log-mel spectrogram (jnp)
# ---------------------------------------------------------------------------

def frame_audio(audio: jnp.ndarray) -> jnp.ndarray:
    """(B, N_SAMPLES) -> (B, N_FRAMES, N_FFT) reflect-padded centered frames."""
    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    idx = (jnp.arange(N_FRAMES) * HOP_LENGTH)[:, None] + jnp.arange(N_FFT)[None, :]
    return x[:, idx]


def log_mel_spectrogram(
    audio: jnp.ndarray, n_mels: int = 80, dtype=jnp.float32
) -> jnp.ndarray:
    """Whisper log-mel features: (B, N_SAMPLES) float32 -> (B, n_mels, N_FRAMES).

    Matches HF ``WhisperFeatureExtractor`` output (log10, clamp to max-8,
    (x+4)/4 scaling; the trailing STFT frame is dropped).
    """
    cos_b, sin_b, mel_fb = (jnp.asarray(a) for a in dft_mel_basis(n_mels))
    frames = frame_audio(audio.astype(jnp.float32))        # (B, F, N_FFT)
    re = jnp.einsum("bfn,nk->bfk", frames, cos_b, preferred_element_type=jnp.float32)
    im = jnp.einsum("bfn,nk->bfk", frames, sin_b, preferred_element_type=jnp.float32)
    power = re * re + im * im                              # (B, F, n_freqs)
    mel = jnp.einsum("bfk,km->bfm", power, mel_fb, preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, 1, 2).astype(dtype)      # (B, n_mels, F)


def log_mel_spectrogram_np(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Arbitrary-length host-side log-mel (numpy) for longform audio.

    Same math as :func:`log_mel_spectrogram` without the static 30 s shape
    constraint; used by the longform seek loop to featurize the full waveform in
    one pass (per-window recomputation would distort the global max-normalization
    at window boundaries)."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    cos_b, sin_b, mel_fb = dft_mel_basis(n_mels)
    pad = N_FFT // 2
    x = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = audio.shape[-1] // HOP_LENGTH
    idx = (np.arange(n_frames) * HOP_LENGTH)[:, None] + np.arange(N_FFT)[None, :]
    frames = x[:, idx]                                     # (B, F, N_FFT)
    re = frames @ cos_b
    im = frames @ sin_b
    mel = (re * re + im * im) @ mel_fb
    log_spec = np.log10(np.maximum(mel, 1e-10))
    max_val = log_spec.max(axis=(1, 2), keepdims=True)
    log_spec = np.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return np.swapaxes(log_spec, 1, 2).astype(np.float32)  # (B, n_mels, F)


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Host-side pad/trim to exactly 30 s (static shapes for the device path)."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    if audio.shape[-1] >= length:
        return audio[..., :length]
    out = np.zeros(audio.shape[:-1] + (length,), np.float32)
    out[..., : audio.shape[-1]] = audio
    return out
