"""Exact-GELU via a Chebyshev/Clenshaw erf — the VPU-cheap transcendental.

Whisper uses exact (erf) GELU everywhere (HF ``ACT2FN["gelu"]``; reference
model stack inherits it from ``transformers`` modeling_whisper).  XLA's erf
lowering is expensive on the TPU VPU: measured in a 32-layer encoder-shaped
FFN chain at B=8 (v5e, bf16), ``jax.nn.gelu(approximate=False)`` drags the
chain from 63% of matmul-only peak down to 46% (~0.9 ms/layer of exposed
elementwise time), while a division-free polynomial erf costs ~0.15 ms/layer.

This module evaluates erf(z) as z * p(z^2) with p a degree-14 Chebyshev fit
of erf(z)/z over |z| <= 3.9199 (erf(3.9199) = 1 - 3e-8, so clamping outside
costs less than the fit error).  Clenshaw recurrence in float32 — the power
basis loses ~4e-3 to cancellation at this degree; Clenshaw keeps 8.2e-7.
End-to-end max |gelu_poly - gelu_exact| measured 2.4e-6 over N(0,3) inputs:
invisible at bf16 activation precision (unit ~4e-3 relative) and far below
the 1e-4..1e-3 tolerances of the HF-numerics parity tests.

Coefficients were fit least-squares on 4e5 Chebyshev-spaced nodes (see
docs/KERNELS.md for the derivation snippet).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Chebyshev coefficients of f(u) = erf(sqrt(u))/sqrt(u) over u in [0, ZMAX^2].
_CHEB = (
    0.49250020778309234, -0.34622413530621243, 0.1600444122537243,
    -0.07440163654147687, 0.0330756299297749, -0.01382017800910148,
    0.005391941859910532, -0.001960467152585863, 0.0006645494420974257,
    -0.00021032101313401156, 6.229681386561531e-05, -1.728728836443121e-05,
    4.518848103661057e-06, -1.0847269682728197e-06, 2.533756876797267e-07,
)
_ZMAX = 3.9199
_INV_SQRT2 = 0.7071067811865476


def erf(z: jnp.ndarray) -> jnp.ndarray:
    """Polynomial erf for float32 inputs; max abs error 8.2e-7 (f32 Clenshaw)."""
    u = z * z
    t = u * jnp.float32(2.0 / (_ZMAX * _ZMAX)) - 1.0
    t2 = 2.0 * t
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for c in _CHEB[:0:-1]:
        b1, b2 = jnp.float32(c) + t2 * b1 - b2, b1
    p = jnp.float32(_CHEB[0]) + t * b1 - b2
    return jnp.where(jnp.abs(z) >= _ZMAX, jnp.sign(z), z * p)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, computed in f32, returned in x.dtype."""
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + erf(xf * jnp.float32(_INV_SQRT2)))
    return out.astype(x.dtype)
