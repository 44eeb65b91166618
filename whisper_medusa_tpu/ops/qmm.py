"""Weight-only int8 quantized matmul (Pallas TPU kernel) for decode serving.

Memory-bound autoregressive decoding streams every decoder weight each step
(~1.7 GB bf16 for whisper-large-v2); storing weights as int8 with per-output-channel
scales halves that traffic.  The kernel dequantizes tiles in VMEM on the way into
the MXU — the bf16 weights never exist in HBM.

Quantization scheme: symmetric per-output-channel,
``w_q = round(w / s), s = max|w_col| / 127`` — the standard weight-only recipe
(activations stay bf16; matmul accumulates f32).

This is an opt-in serving mode (``WhisperMedusaModel.quantize()``): outputs differ
slightly from bf16 weights, but the medusa==vanilla token-parity invariant holds
*within* the mode because both paths share the same quantized weights.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_array(w: jnp.ndarray, axis: int = -2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize along the contraction axis ⇒ per-output-channel scales.

    For a (K, N) weight, scales have shape (N,): ``w ≈ w_q * scale[None, :]``.
    Leading (stacked-layer) dims are preserved.  Runs on device — whisper-large
    is ~1.6 GB of weights; host numpy took ~40 s where this takes ~10 ms.
    """
    w32 = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    wq = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return wq, jnp.squeeze(scale, axis=axis)


def _qmm_kernel(x_ref, wq_ref, scale_ref, out_ref):
    x = x_ref[:]                                   # (M, K) bf16
    w = wq_ref[:].astype(jnp.bfloat16)             # (K, BN) dequant in VMEM
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    out_ref[:] = acc * scale_ref[0].astype(jnp.float32)[None, :]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def qmm(
    x: jnp.ndarray,        # (M, K) bf16/f32
    wq: jnp.ndarray,       # (K, N) int8
    scale: jnp.ndarray,    # (N,) f32
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ dequant(wq) with f32 accumulation.  Returns (M, N) f32."""
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2 and scale.shape == (n,)
    n_pad = -(-n // block_n) * block_n
    if n_pad != n:
        wq = jnp.pad(wq, ((0, 0), (0, n_pad - n)))
        scale = jnp.pad(scale, (0, n_pad - n))
    grid = (n_pad // block_n,)
    out = pl.pallas_call(
        _qmm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wq, scale[None, :])
    return out[:, :n]


def qmm_ref(x, wq, scale):
    """XLA reference implementation (also the fallback off-TPU)."""
    w = wq.astype(jnp.bfloat16)
    acc = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    return acc * scale.astype(jnp.float32)[None, :]


def _qmm_nt_kernel(x_ref, wq_ref, scale_ref, out_ref):
    x = x_ref[:]                                   # (M, K)
    w = wq_ref[:].astype(jnp.bfloat16)             # (BN, K)
    acc = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = acc * scale_ref[0].astype(jnp.float32)[None, :]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def qmm_nt(
    x: jnp.ndarray,        # (M, K)
    wq: jnp.ndarray,       # (N, K) int8  (e.g. the (vocab, d_model) embedding)
    scale: jnp.ndarray,    # (N,)
    block_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """x @ dequant(wq).T — used for the tied-embedding vocab projection."""
    m, k = x.shape
    n, k2 = wq.shape
    assert k == k2 and scale.shape == (n,)
    n_pad = -(-n // block_n) * block_n
    if n_pad != n:
        wq = jnp.pad(wq, ((0, n_pad - n), (0, 0)))
        scale = jnp.pad(scale, (0, n_pad - n))
    out = pl.pallas_call(
        _qmm_nt_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n_pad), jnp.float32),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wq, scale[None, :])
    return out[:, :n]


def qmm_nt_ref(x, wq, scale):
    acc = jax.lax.dot_general(
        x.astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc * scale.astype(jnp.float32)[None, :]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def use_pallas_qmm() -> bool:
    """Implementation switch for the quantized matmul.

    Measured on v5e at decode sizes (M<=128): XLA's fused int8->bf16
    dequant-matmul beats the standalone Pallas kernel (per-call overhead
    dominates ~200 small calls per decode step), so the XLA path is the default;
    WM_QMM_IMPL=pallas forces the kernel."""
    import os

    impl = os.environ.get("WM_QMM_IMPL", "xla")
    return impl == "pallas" and on_tpu()


# ---------------------------------------------------------------------------
# Whisper-params quantization transform
# ---------------------------------------------------------------------------

_LAYER_WEIGHTS = ("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w")


def _quantize_weight_tree(tree):
    """Quantize every *_w leaf in a (possibly stacked) decoder-layer dict."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _quantize_weight_tree(v)
        elif k in _LAYER_WEIGHTS:
            wq, s = quantize_array(v, axis=-2)
            out[k] = {"q": wq, "s": s}
        else:
            out[k] = v
    return out


def quantize_decoder(params, medusa_params=None):
    """Int8-quantize the decode-path weights: decoder layers, the tied
    embedding, and — when medusa params are passed — the medusa res-block
    heads and the block-variant extra layer.  Encoder, layernorms, biases
    and positional embeddings stay bf16.

    Head weights quantize per output channel like every other weight
    ((H, L, D, D) contracted over -2 ⇒ scales (H, L, D)); they are the last
    per-iteration weight stream of the speculative loop (~36 MB bf16 at the
    10-head large-v2 config), so halving them matters at decode bandwidth.

    Inference-only transform; training uses the full-precision pytree.
    """
    params = dict(params)
    dec = dict(params["decoder"])
    dec["layers"] = _quantize_weight_tree(dec["layers"])
    emb_q, emb_s = quantize_array(dec["embed_tokens"], axis=-1)  # (V, D) rows
    dec["embed_tokens"] = {"q": emb_q, "s": emb_s}
    params["decoder"] = dec
    if medusa_params is not None:
        medusa_params = dict(medusa_params)
        if "heads" in medusa_params:
            heads = dict(medusa_params["heads"])
            hq, hs = quantize_array(heads["w"], axis=-2)
            heads["w"] = {"q": hq, "s": hs}
            medusa_params["heads"] = heads
        if "block" in medusa_params:
            medusa_params["block"] = _quantize_weight_tree(
                medusa_params["block"])
    return params, medusa_params
