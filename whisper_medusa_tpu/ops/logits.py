"""Streaming Pallas kernel for the decode-time vocab projection.

``logits = hidden @ embed.T`` at decode time is a tall-weight matvec: the tied
embedding (vocab 51865 x d_model 1280, bf16 = 133 MB) is streamed from HBM for
a handful of query rows (M = 1 for vanilla greedy, M = (heads+1) * nodes for a
speculative iteration).  This kernel streams the embedding in row tiles with
the query rows resident in VMEM, so the whole op runs at DMA speed; each grid
step's tile fetch overlaps the previous step's (trivial) MXU work.

Measured on v5e (marginal cost inside an on-device loop, large-v2 vocab):
M=1: 0.168 ms (790 GB/s) vs XLA 0.181 (732); M=11: 0.154 (861) vs 0.196 (679);
M=121: 0.137 (968) vs 0.162 (818) — a 7-18% win across decode shapes.

Decode-only (M <= _MAX_M): the training/scoring paths project full (B, T)
sequences where XLA's own tiling is already efficient, and those paths need
autodiff, which a pallas_call does not provide.

Replaces the per-head HF ``proj_out`` calls of the reference
(reference: whisper_medusa/models/model.py:1277) on the TPU decode path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_ENABLED = os.environ.get("WM_LOGITS_KERNEL", "1") == "1"
_INTERPRET = os.environ.get("WM_ATTENTION_INTERPRET", "0") == "1"

_ROWS = 2048          # vocab rows per grid step (2048 x 1280 bf16 = 5.2 MB)
_MAX_M = 192          # decode-time query-row cap; larger M -> XLA path
_MIN_V = 8192         # kernel pays off only for a real vocab-sized stream


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def kernel_available(m: int, v: int, d: int) -> bool:
    return (
        _ENABLED
        and m <= _MAX_M
        and v >= _MIN_V
        and d % 128 == 0
        and (_on_tpu() or _INTERPRET)
    )


def _logits_kernel(x_ref, w_ref, o_ref):
    # x: (M, D) resident; w: (ROWS, D) tile of the embedding; out: (M, ROWS).
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def _project(x2: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = x2.shape
    v = embed.shape[0]
    rows = _ROWS
    grid = (pl.cdiv(v, rows),)
    return pl.pallas_call(
        _logits_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, d), lambda i: (0, 0)),
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((m, rows), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, v), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(x2, embed)


def project_logits_stream(hidden: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """``hidden @ embed.T`` with float32 accumulation, streaming the embedding.

    hidden: (..., D); embed: (V, D).  Returns (..., V) float32.
    Caller is responsible for gating via :func:`kernel_available`.
    """
    d = hidden.shape[-1]
    x2 = hidden.reshape(-1, d)
    y = _project(x2, embed)
    return y.reshape(*hidden.shape[:-1], embed.shape[0])
