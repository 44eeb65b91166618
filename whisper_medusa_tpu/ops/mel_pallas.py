"""Fused Pallas TPU kernel for the Whisper log-mel frontend.

One kernel fuses: overlapped framing -> windowed DFT as MXU matmuls -> power
spectrum -> mel projection -> log10.  The global dynamic-range clamp + normalization
(which needs a per-utterance max) runs as cheap XLA elementwise ops on the output.

Replaces the host-side numpy STFT of HF ``WhisperFeatureExtractor`` that the
reference calls per utterance (reference: whisper_medusa/dataset/dataset.py:77-79,
eval_whisper_medusa.py:46-50) with on-device compute: the DFT-as-matmul shape
(frames x window) @ (window x 201) is exactly MXU-shaped work.

Framing without gathers/reshapes (both unsupported or slow in Mosaic for these
shapes): the waveform is pre-chunked by XLA into rows of ``hop=160`` samples, padded
to 256 lanes for DMA tiling.  The 400-sample window spans 2.5 hops, so

    frame[j] = concat(rows[j][:160], rows[j+1][:160], rows[j+2][:80])

Instead of materializing that concat, the DFT matmul is split into three partials
against zero-padded basis blocks; the zero rows of each basis block mask out the
padded/unused lanes of the row buffers automatically:

    frames @ B  ==  rows_j @ B0 + rows_{j+1} @ B1 + rows_{j+2} @ B2
      B0[0:160]=B[0:160], B1[0:160]=B[160:320], B2[0:80]=B[320:400], rest zero.

Row-shift alignment uses ``pltpu.roll`` (Mosaic rejects mixed-sublane-offset
operands).
"""

from __future__ import annotations

import functools
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_medusa_tpu.ops.mel import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    dft_mel_basis,
)

FRAME_BLOCK = 200                      # frames per grid step (3000 = 15 * 200)
_ROWS_PER_BLOCK = FRAME_BLOCK + 8      # overlapping rows, 8-aligned for DMA tiling
_ROW_LANES = 256                       # hop=160 padded up to the 128-lane tiling


@lru_cache(maxsize=2)
def _padded_bases(n_mels: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    cos_b, sin_b, mel_fb = dft_mel_basis(n_mels)

    def pad3(basis):  # (400, n_freqs) -> (3, 256, n_freqs)
        out = np.zeros((3, _ROW_LANES, basis.shape[1]), np.float32)
        out[0, :160] = basis[0:160]
        out[1, :160] = basis[160:320]
        out[2, :80] = basis[320:400]
        return out

    return pad3(cos_b), pad3(sin_b), mel_fb


def _mel_kernel(rows_ref, cos_ref, sin_ref, fb_ref, out_ref, scratch, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        rows_ref.at[b, pl.ds(i * FRAME_BLOCK, _ROWS_PER_BLOCK)],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    f = FRAME_BLOCK
    rows0 = scratch[:]
    rows1 = pltpu.roll(rows0, _ROWS_PER_BLOCK - 1, 0)   # == roll by -1
    rows2 = pltpu.roll(rows0, _ROWS_PER_BLOCK - 2, 0)   # == roll by -2
    segs = (rows0[0:f], rows1[0:f], rows2[0:f])

    def dft(basis_ref):
        acc = jnp.dot(segs[0], basis_ref[0], preferred_element_type=jnp.float32)
        acc += jnp.dot(segs[1], basis_ref[1], preferred_element_type=jnp.float32)
        acc += jnp.dot(segs[2], basis_ref[2], preferred_element_type=jnp.float32)
        return acc

    re = dft(cos_ref)
    im = dft(sin_ref)
    power = re * re + im * im                                # (F, 201)
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    log10 = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(1.0 / np.log(10.0))
    out_ref[:] = log10[None]


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray, n_mels: int = 80, interpret: bool = False
) -> jnp.ndarray:
    """(B, N_SAMPLES) float32 -> (B, n_mels, N_FRAMES), Whisper-normalized."""
    assert audio.shape[-1] == N_SAMPLES, audio.shape
    b = audio.shape[0]
    pad = N_FFT // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    # Chunk into hop-sized rows; pad rows so the last 8-aligned DMA stays in range,
    # and pad lanes 160->256 for DMA tiling.
    n_blocks = N_FRAMES // FRAME_BLOCK
    n_rows = (n_blocks - 1) * FRAME_BLOCK + _ROWS_PER_BLOCK
    x = jnp.pad(x, ((0, 0), (0, n_rows * HOP_LENGTH - x.shape[1])))
    rows = x.reshape(b, n_rows, HOP_LENGTH)
    rows = jnp.pad(rows, ((0, 0), (0, 0), (0, _ROW_LANES - HOP_LENGTH)))

    cos3, sin3, mel_fb = (jnp.asarray(a) for a in _padded_bases(n_mels))

    log_spec = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((b, N_FRAMES, n_mels), jnp.float32),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # rows stay off-VMEM; DMA'd
            pl.BlockSpec(cos3.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin3.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_fb.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, n_mels), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_ROWS_PER_BLOCK, _ROW_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(rows, cos3, sin3, mel_fb)

    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, 1, 2)
