"""XLA decode-step ops for the lax.scan decoder path (cross-attention + FFN).

These are the scan path's cross-attention and FFN formulations — the fallback
when the whole-stack fused megastep kernel (ops/megastep.py) gates itself off
(batch > cap, CPU, tree chunks wider than 16).  Per-op pallas kernels for
these sites were tried and measured SLOWER in context (a pallas_call inside
the layer scan is opaque to XLA's latency-hiding scheduler and breaks its
cross-layer weight prefetching: all-XLA 4.06 ms/step vs 4.38-4.66 with either
kernel enabled, v5e r2); the experiment is preserved at
tools/decode_kernels_experiment.py and the winning answer — pallas owning the
WHOLE pipeline — is the megastep kernel.

What did ship from that investigation is the head-major cross-K layout
(K as (B, H, Dh, S): each head's matrix contiguous so the decode matvec
streams instead of striding across heads — cross-attention 1.55 -> 1.21 ms)
and the head-flat cross-V layout; both live in models/whisper.py::KVCache and
are consumed here.

Replaces the reference's HF ``WhisperDecoderLayer`` per-step attention/FFN
math (reference: whisper_medusa/models/model.py:639-712 via HF
modeling_whisper) with cache-slab-aware, quantization-aware forms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)


def cross_attention_decode(
    q: jnp.ndarray,       # (B, H, T, Dh), pre-scaled
    k: jnp.ndarray,       # (B, H, Dh, S_pad) head-major cross keys (bf16|int8)
    v: jnp.ndarray,       # (B, S_pad, D) head-flat cross values (bf16|int8)
    kv_len: int,          # real key count (<= S_pad)
    k_s=None,             # (B, H, S_pad) f32 int8-mode key scales
    v_s=None,
) -> jnp.ndarray:
    """Decode-chunk cross attention over the precomputed encoder K/V slabs."""
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


def ffn_decode(x: jnp.ndarray, w1, b1, w2, b2) -> jnp.ndarray:
    """fc1 -> exact GELU -> fc2 for decode chunks.  x: (B, T, D)."""
    from whisper_medusa_tpu.ops import gelu as gelu_mod

    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = gelu_mod.gelu(h + b1.astype(jnp.float32))
    y = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32)
    return (y + b2.astype(jnp.float32)).astype(x.dtype)
