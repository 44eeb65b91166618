"""EXPERIMENT (kept for the record): per-op Pallas kernels for the decode step.

One decode step at batch 1 must stream ~1.9 GB of weights + caches through
matvecs; XLA runs it at ~57% of the HBM roofline because every per-op shape is
tiny (M=1..11).  Decomposition on v5e (r2): self-qkvo 0.84 ms (0.51 modeled),
ffn 1.36 (1.02), cross-attention 1.55 (0.56), logits 0.33 (0.16).

This module's fused kernels (cross QK^T->softmax->PV per head; fc1->GELU->fc2
with streamed weights) each *win in isolation* but **lose ~0.3 ms in context**:
a pallas_call inside the layer scan is opaque to XLA's latency-hiding
scheduler, breaking the cross-layer weight-prefetch pipelining that the pure-
XLA scan gets for free (measured: all-XLA 4.06 ms/step, either kernel enabled
4.38-4.66 ms; pallas cost_estimate does not recover it).  The conclusions that
DID ship:

  * pallas must own the WHOLE pipeline — that is ops/megastep.py, the
    whole-decoder-stack fused kernel (grid over layers, double-buffered
    weight streams), which replaced this experiment;
  * the head-major cross-K / head-flat cross-V cache layouts
    (models/whisper.py::KVCache) and the XLA decode formulations consuming
    them (ops/decode_ops.py).

Run ``python tools/decode_kernels_experiment.py`` for an interpret-mode parity
selftest of the experimental kernels against ops/decode_ops.py.
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_medusa_tpu.ops.decode_ops import NEG_BIG, cross_attention_decode as _cross_xla_entry  # noqa: E501,F401

_INTERPRET = os.environ.get("WM_ATTENTION_INTERPRET", "0") == "1"

_MIN_KV = 512            # kernels pay off at encoder-scale cross lengths
_FFN_BLOCK = 512


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


def selftest():
    """Interpret-mode parity of the experimental kernels vs ops/decode_ops."""
    global _INTERPRET, _FFN_BLOCK
    _INTERPRET = True
    import numpy as np

    from whisper_medusa_tpu.ops import decode_ops

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 4, 11, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 4, 64, 640)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 640, 4 * 64)), jnp.float32)
    out = _cross_pallas(q, k, v, 600)
    ref = decode_ops.cross_attention_decode(q, k, v, 600)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    _FFN_BLOCK = 256
    x = jnp.asarray(rng.normal(size=(11, 128)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(128, 1024)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(1024,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(1024, 128)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    out = _ffn_pallas(x, w1, b1, w2, b2)
    ref = decode_ops.ffn_decode(x[None], w1, b1, w2, b2)[0]
    # The kernel's A&S-7.1.26 GELU differs from exact erf by ~1.5e-7 per
    # element — up to ~3e-4 after the 1024-wide fc2 reduction.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)
    print("decode_kernels_experiment selftest OK")


if __name__ == "__main__":
    selftest()
