"""Pallas TPU kernels for the HBM-bound decode step (opt-in).

One decode step at batch 1 must stream ~1.9 GB of weights + caches through
matvecs; XLA runs it at ~57% of the HBM roofline because every per-op shape is
tiny (M=1..11).  Decomposition on v5e (r2): self-qkvo 0.84 ms (0.51 modeled),
ffn 1.36 (1.02), cross-attention 1.55 (0.56), logits 0.33 (0.16).

What actually helped, and ships default-on elsewhere:
  * **Head-major cross cache layout** (K as (B, H, Dh, S)) — each head's matrix
    is contiguous so the matvec streams instead of striding across heads;
    cross-attention 1.55 -> 1.21 ms, whole step 4.40 -> 4.06 ms
    (models/whisper.py KVCache).

This module's fused kernels (cross QK^T->softmax->PV per head; fc1->GELU->fc2
with streamed weights) each *win in isolation* but **lose ~0.3 ms in context**:
a pallas_call inside the layer scan is opaque to XLA's latency-hiding
scheduler, breaking the cross-layer weight-prefetch pipelining that the pure-
XLA scan gets for free (measured: all-XLA 4.06 ms/step, either kernel enabled
4.38-4.66; cost_estimate does not recover it).  They are therefore OPT-IN via
WM_DECODE_KERNELS=1 — kept because they are the building blocks for a future
whole-layer mega-kernel (grid over layers, double-buffered weight streams)
where pallas would own the pipelining itself.

Inference-only (the decode step is never differentiated; training uses the
teacher-forced full-sequence path); parity-tested against the XLA formulation
in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_ENABLED = os.environ.get("WM_DECODE_KERNELS", "0") == "1"
_INTERPRET = os.environ.get("WM_ATTENTION_INTERPRET", "0") == "1"

_MIN_KV = 512            # kernels pay off at encoder-scale cross lengths
_FFN_BLOCK = 512

NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def kernels_enabled(kv_or_ffn: int) -> bool:
    return _ENABLED and kv_or_ffn >= _MIN_KV and (_on_tpu() or _INTERPRET)


# ------------------------------------------------------------ cross attention

def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, num_heads: int):
    q = q_ref[0]                                      # (H, T, Dh)
    dh = q.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[1], k_ref.shape[3]), 1)
    for h in range(num_heads):
        s = jnp.dot(q[h], k_ref[0, h],                # (T, S_pad)
                    preferred_element_type=jnp.float32)
        if kv_len < k_ref.shape[3]:
            s = jnp.where(col < kv_len, s, NEG_BIG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # Head h's values are the static 64-lane slice of the head-flat
        # (S_pad, D) block (unpadded stream; see models/whisper.py::KVCache).
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, :, h * dh:(h + 1) * dh],
                    preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _cross_pallas(q, k, v, kv_len: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    s_pad = k.shape[3]
    d_full = v.shape[2]
    kern = functools.partial(_cross_kernel, kv_len=kv_len, num_heads=h)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, t, d), lambda b_: (b_, 0, 0, 0)),
            pl.BlockSpec((1, h, d, s_pad), lambda b_: (b_, 0, 0, 0)),
            pl.BlockSpec((1, s_pad, d_full), lambda b_: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, t, d), lambda b_: (b_, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_INTERPRET,
    )(q, k, v)


def _cross_xla(q, k, v, kv_len: int, k_s=None, v_s=None):
    b, h, t, dh = q.shape
    s = jnp.einsum("bhtd,bhds->bhts", q, k.astype(q.dtype),
                   preferred_element_type=jnp.float32)
    if k_s is not None:
        s = s * k_s[:, :, None, :]                      # (B, H, 1, S)
    if kv_len < k.shape[3]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(col < kv_len, s, NEG_BIG)
    p = jax.nn.softmax(s, axis=-1)
    if v_s is not None:
        # Dequant V by scaling the probabilities instead — (T, S) elements
        # instead of (S, Dh); the int8 V tensor feeds the MXU directly.
        p = p * v_s[:, :, None, :]
    # v is head-flat (B, S_pad, D): heads are split by a free minor-dim
    # reshape; the contraction runs over s with h as a batch dim.
    vh = v.reshape(b, v.shape[1], h, dh)
    o = jnp.einsum("bhts,bshd->bhtd", p.astype(q.dtype), vh.astype(q.dtype),
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


def cross_attention_decode(
    q: jnp.ndarray,       # (B, H, T, Dh), pre-scaled
    k: jnp.ndarray,       # (B, H, Dh, S_pad) head-major cross keys (bf16|int8)
    v: jnp.ndarray,       # (B, S_pad, D) head-flat cross values (bf16|int8)
    kv_len: int,          # real key count (<= S_pad)
    k_s=None,             # (B, H, S_pad) f32 int8-mode key scales
    v_s=None,
) -> jnp.ndarray:
    s_pad = k.shape[3]
    if k_s is None and kernels_enabled(s_pad) and s_pad % 128 == 0:
        return _cross_pallas(q, k, v, kv_len)
    return _cross_xla(q, k, v, kv_len, k_s, v_s)


# --------------------------------------------------------------------- ffn

def _erf_f32(z):
    """Abramowitz & Stegun 7.1.26 erf approximation (|err| <= 1.5e-7) —
    Pallas TPU has no erf/erfc lowering; 1.5e-7 is far below bf16 resolution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-za * za)
    return jnp.sign(z) * y


def _gelu_exact_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * 0.7071067811865476))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref):
    import jax.experimental.pallas as pl

    j = pl.program_id(0)
    x = x_ref[:]                                    # (T, D)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)           # biases passed 2-D (1, .)
    h = _gelu_exact_f32(h).astype(x.dtype)
    part = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = b2_ref[0].astype(jnp.float32)[None, :] + part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _ffn_pallas(x2, w1, b1, w2, b2):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, d = x2.shape
    f = w1.shape[1]
    blk = _FFN_BLOCK
    assert f % blk == 0, (f, blk)
    grid = (f // blk,)
    return pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, d), lambda j: (0, 0)),
            pl.BlockSpec((d, blk), lambda j: (0, j)),
            pl.BlockSpec((1, blk), lambda j: (0, j)),
            pl.BlockSpec((blk, d), lambda j: (j, 0)),
            pl.BlockSpec((1, d), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, d), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, d), x2.dtype),
        scratch_shapes=[pltpu.VMEM((t, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def ffn_decode(x: jnp.ndarray, w1, b1, w2, b2) -> jnp.ndarray:
    """Fused fc1 -> GELU -> fc2 for small decode chunks.  x: (B, T, D)."""
    f = w1.shape[1]
    b, t, d = x.shape
    if kernels_enabled(f) and f % _FFN_BLOCK == 0 and b * t <= 64:
        y = _ffn_pallas(x.reshape(b * t, d), w1, b1, w2, b2)
        return y.reshape(b, t, d)
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1.astype(jnp.float32), approximate=False)
    y = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32)
    return (y + b2.astype(jnp.float32)).astype(x.dtype)
