"""Fused verification kernel: vocab projection + processors + row statistics.

One speculative iteration must score (heads+1) x nodes hidden rows against the
tied embedding and then run the verification pipeline on the (R, V) logits:
suppress / begin-suppress / exponential-decay processors, per-node argmax (the
greedy acceptance signal and the next drafts), log-softmax normalizers and the
draft-token log-probs.  As separate XLA ops that is ~30 vocab-wide kernels per
iteration — all latency, since the tensors are only a couple of MB — plus a
25 MB round-trip for the materialized logits.  Measured on v5e it is ~1.4 ms
of the 4.5 ms speculative iteration (the reference pays the same shape of cost
through HF's processor stack, whisper_medusa/models/model.py:653-694).

This kernel streams the embedding in row tiles ONCE (the logits matrix never
exists in HBM) and carries per-row online statistics across tiles:

  * running max + argmax of the *processed* logits  -> greedy tokens & drafts
  * running logsumexp                               -> token log-probs
  * the processed logit at one requested column     -> accepted-draft log-probs

Processors are applied tile-locally from two streamed (V,) masks and per-row
position vectors, reproducing decoding/processors.py::apply_processors exactly
(suppress, begin-suppress at ``begin_index``, exponential EOS decay).

Scope: the chain + greedy decode path (the reference's default configuration).
Branching trees need top-k per level and sampling needs full distributions —
those keep the unfused path.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED = os.environ.get("WM_VERIFY_KERNEL", "1") == "1"
_INTERPRET = os.environ.get("WM_VERIFY_INTERPRET", "0") == "1"

_ROWS_TILE = 2048      # vocab rows per grid step
# Row cap: (heads+1) x nodes x batch.  At the headline config (10 heads, 11
# chain nodes) this admits batch 8 (968 rows); the per-tile f32 logits block
# (R x 2048) stays ~8 MB, well inside the 64 MB VMEM limit.
_MAX_R = 1024
NEG = -float(np.finfo(np.float32).max) / 2


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def available(r: int, v: int, d: int) -> bool:
    return (
        _ENABLED
        and r <= _MAX_R
        and v >= 8192
        and d % 128 == 0
        and (_on_tpu() or _INTERPRET)
    )


def _kernel(x_ref, pos_ref, gcol_ref, w_ref, ws_ref, sup_ref, o_max, o_lse,
            o_arg, o_gth, m_s, s_s, a_s, g_s, *, v: int, rows: int,
            begin_index: int, eos_id: int, decay, t_begin: int, quant: bool):
    """One vocab tile: project, process, fold into the running row stats.

    sup_ref: (2, TILE) i8 — row 0 suppress mask, row 1 begin-suppress mask.
    ws_ref: (1, TILE) f32 — per-row dequant scales (int8 embedding mode).
    decay: None or (start, factor) — exponential EOS decay constants.
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    tile = w_ref.shape[0]
    col0 = i * tile

    @pl.when(i == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG)
        s_s[:] = jnp.zeros_like(s_s)
        a_s[:] = jnp.zeros_like(a_s)
        g_s[:] = jnp.full_like(g_s, NEG)

    x = jax.lax.dot_general(
        x_ref[:], w_ref[:].astype(x_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (R, TILE)
    if quant:
        x = x * ws_ref[:]                                # per-column scales
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + col0
    pos = pos_ref[:, :1]                                 # (R, 1)

    # --- processors (mirrors decoding/processors.py::apply_processors) ---
    x = jnp.where((sup_ref[0:1] != 0) | (cols >= v), NEG, x)
    x = jnp.where((sup_ref[1:2] != 0) & (pos == begin_index), NEG, x)
    if decay is not None:
        start, factor = decay
        idx = jnp.maximum(pos - start, 0).astype(jnp.float32)
        pen = jnp.abs(x) * (jnp.exp(idx * float(np.log(factor))) - 1.0)
        x = jnp.where((cols == eos_id) & (pos > start), x + pen, x)

    # --- online row statistics ---
    mt = jnp.max(x, axis=1, keepdims=True)               # (R, 1)
    at = jnp.argmax(x, axis=1).astype(jnp.int32)[:, None] + col0
    upd = mt > m_s[:, :1]
    a_s[:] = jnp.where(upd, at, a_s[:, :1]) + jnp.zeros_like(a_s)
    m_new = jnp.maximum(m_s[:, :1], mt)
    s_s[:] = (s_s[:, :1] * jnp.exp(m_s[:, :1] - m_new)
              + jnp.sum(jnp.exp(x - m_new), axis=1, keepdims=True)
              ) + jnp.zeros_like(s_s)
    m_s[:] = m_new + jnp.zeros_like(m_s)
    gmatch = jnp.max(jnp.where(cols == gcol_ref[:, :1], x, NEG),
                     axis=1, keepdims=True)
    g_s[:] = jnp.maximum(g_s[:, :1], gmatch) + jnp.zeros_like(g_s)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_max[:] = m_s[:]
        o_lse[:] = jnp.log(s_s[:]) + m_s[:]
        o_arg[:] = a_s[:]
        o_gth[:] = g_s[:]


def verify_rows(
    hs: jnp.ndarray,       # (R, D) bf16 hidden rows to score
    embed,                 # (V, D) bf16 tied embedding, or the int8 dict
                           # {"q": (V, D) i8, "s": (V,) f32} (ops/qmm.py)
    pos: jnp.ndarray,      # (R,) i32 absolute predicted position per row
    gcol: jnp.ndarray,     # (R,) i32 column whose processed logit to return
    sup_masks: jnp.ndarray,  # (2, V) i8 [suppress; begin-suppress]
    *,
    begin_index: int,
    eos_id: int,
    decay,                 # None | (start, factor)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (argmax (R,) i32, max (R,), lse (R,), gathered (R,)) of the
    processed logits rows — without materializing them."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    quant = isinstance(embed, dict)
    if quant:
        embed, escale = embed["q"], embed["s"].astype(jnp.float32)
    else:
        escale = jnp.ones((embed.shape[0],), jnp.float32)
    r, d = hs.shape
    v = embed.shape[0]
    r_pad = max(8, -(-r // 8) * 8)
    if r_pad != r:
        hs = jnp.pad(hs, ((0, r_pad - r), (0, 0)))
        pos = jnp.pad(pos, (0, r_pad - r))
        gcol = jnp.pad(gcol, (0, r_pad - r))
    pos2 = jnp.broadcast_to(pos[:, None], (r_pad, 128)).astype(jnp.int32)
    gcol2 = jnp.broadcast_to(gcol[:, None], (r_pad, 128)).astype(jnp.int32)

    tile = _ROWS_TILE
    grid = (pl.cdiv(v, tile),)
    kern = functools.partial(
        _kernel, v=v, rows=r_pad, begin_index=begin_index, eos_id=eos_id,
        decay=decay, t_begin=0, quant=quant)
    stat = lambda dt: jax.ShapeDtypeStruct((r_pad, 128), dt)
    mx, lse, am, gth = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_pad, d), lambda i: (0, 0)),
            pl.BlockSpec((r_pad, 128), lambda i: (0, 0)),
            pl.BlockSpec((r_pad, 128), lambda i: (0, 0)),
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((2, tile), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((r_pad, 128), lambda i: (0, 0))] * 4,
        out_shape=[stat(jnp.float32), stat(jnp.float32),
                   stat(jnp.int32), stat(jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((r_pad, 128), jnp.float32),
            pltpu.VMEM((r_pad, 128), jnp.float32),
            pltpu.VMEM((r_pad, 128), jnp.int32),
            pltpu.VMEM((r_pad, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(hs, pos2, gcol2, embed, escale[None, :], sup_masks)
    return (am[:r, 0], mx[:r, 0], lse[:r, 0], gth[:r, 0])


def _kernel_hidden(
    hver_ref,     # (BN, D) bf16 — row-block-0 source (post-LN hidden)
    hsrc_ref,     # (BN, D) bf16 — draft-row source (same array for base_head)
    hw_ref,       # (H, D, D) bf16|int8 stacked single-res-block head weights
    hws_ref,      # (H, D) f32 per-output-channel head dequant scales (ones
                  # when the heads are bf16)
    hb_ref,       # (H, D) f32 head biases
    pos_ref, gcol_ref, w_ref, ws_ref, sup_ref,
    o_max, o_lse, o_arg, o_gth,
    rows_s,       # (R_pad, D) bf16 scratch — constructed rows live here
    m_s, s_s, a_s, g_s,
    *, v: int, rows: int, kp1: int, bn: int, identity0: bool,
    begin_index: int, eos_id: int, decay, quant: bool, hquant: bool,
):
    """Grid step 0 builds the verification/draft rows from the hidden states
    (``rows[k] = src + SiLU(src @ W_k + b_k)``, the MedusaResBlock); steps
    1.. stream the vocab tiles exactly like :func:`_kernel`.  The (R, D)
    row matrix never exists in HBM and the head einsum + concat + reshape
    glue ops disappear from the XLA graph."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    tile = w_ref.shape[0]
    n_heads = hw_ref.shape[0]
    d = hver_ref.shape[1]
    r_pad = rows_s.shape[0]

    @pl.when(i == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG)
        s_s[:] = jnp.zeros_like(s_s)
        a_s[:] = jnp.zeros_like(a_s)
        g_s[:] = jnp.full_like(g_s, NEG)
        src = hsrc_ref[:]                                # (BN, D) bf16
        blocks = [hver_ref[:]] if identity0 else []
        for k in range(n_heads):
            hw = hw_ref[k]
            if hquant:
                hw = hw.astype(src.dtype)
            pre = jax.lax.dot_general(
                src, hw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (BN, D)
            if hquant:
                pre = pre * hws_ref[k:k + 1]
            pre = pre + hb_ref[k:k + 1]
            blocks.append(src + (pre * jax.nn.sigmoid(pre)).astype(src.dtype))
        flat = jnp.concatenate(blocks, axis=0)           # (KP1*BN, D)
        if r_pad > kp1 * bn:
            flat = jnp.concatenate(
                [flat, jnp.zeros((r_pad - kp1 * bn, d), flat.dtype)], axis=0)
        rows_s[:] = flat

    @pl.when(i > 0)
    def _():
        col0 = (i - 1) * tile
        x = jax.lax.dot_general(
            rows_s[:], w_ref[:].astype(rows_s.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R_pad, TILE)
        if quant:
            x = x * ws_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + col0
        pos = pos_ref[:, :1]

        x = jnp.where((sup_ref[0:1] != 0) | (cols >= v), NEG, x)
        x = jnp.where((sup_ref[1:2] != 0) & (pos == begin_index), NEG, x)
        if decay is not None:
            start, factor = decay
            idx = jnp.maximum(pos - start, 0).astype(jnp.float32)
            pen = jnp.abs(x) * (jnp.exp(idx * float(np.log(factor))) - 1.0)
            x = jnp.where((cols == eos_id) & (pos > start), x + pen, x)

        mt = jnp.max(x, axis=1, keepdims=True)
        at = jnp.argmax(x, axis=1).astype(jnp.int32)[:, None] + col0
        upd = mt > m_s[:, :1]
        a_s[:] = jnp.where(upd, at, a_s[:, :1]) + jnp.zeros_like(a_s)
        m_new = jnp.maximum(m_s[:, :1], mt)
        s_s[:] = (s_s[:, :1] * jnp.exp(m_s[:, :1] - m_new)
                  + jnp.sum(jnp.exp(x - m_new), axis=1, keepdims=True)
                  ) + jnp.zeros_like(s_s)
        m_s[:] = m_new + jnp.zeros_like(m_s)
        gmatch = jnp.max(jnp.where(cols == gcol_ref[:, :1], x, NEG),
                         axis=1, keepdims=True)
        g_s[:] = jnp.maximum(g_s[:, :1], gmatch) + jnp.zeros_like(g_s)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_max[:] = m_s[:]
        o_lse[:] = jnp.log(s_s[:]) + m_s[:]
        o_arg[:] = a_s[:]
        o_gth[:] = g_s[:]


def hidden_available(b: int, n: int, n_heads: int, identity0: bool,
                     v: int, d: int) -> bool:
    """Gate for :func:`verify_hidden` — same scope as :func:`available` plus
    the in-kernel head construction limits (single-res-block-layer heads whose
    stacked weight block fits VMEM alongside the vocab pipeline)."""
    kp1 = n_heads + (1 if identity0 else 0)
    r = kp1 * b * n
    heads_bytes = n_heads * d * d * 2
    return (
        available(r, v, d)
        and n_heads >= 1
        and heads_bytes <= 40 * 1024 * 1024
    )


def verify_hidden(
    hver: jnp.ndarray,     # (B, N, D) bf16 row-block-0 source
    hsrc: jnp.ndarray,     # (B, N, D) bf16 draft-row source (hver for base_head)
    heads_w,               # (H, D, D) bf16 single-layer stacked head weights,
                           # or the int8 dict {"q": (H,D,D) i8, "s": (H,D) f32}
    heads_b: jnp.ndarray,  # (H, D) head biases
    embed,                 # (V, D) bf16 tied embedding, or int8 {"q","s"} dict
    pos: jnp.ndarray,      # (R,) i32 absolute predicted position per row
    gcol: jnp.ndarray,     # (R,) i32 column whose processed logit to return
    sup_masks: jnp.ndarray,  # (2, V) i8
    *,
    identity0: bool,       # True: row block 0 is hver itself (medusa_block);
                           # False: row block 0 is head 0 applied to hver
    begin_index: int,
    eos_id: int,
    decay,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`verify_rows` with the row construction fused into the kernel.

    Rows are ordered (k, e, n) — head-major over flattened (batch, node) —
    matching ``stack_rows(...).reshape(KP1*B*N, D)`` in
    decoding/speculative.py.  Returns the same flat (R,) statistics."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    quant = isinstance(embed, dict)
    if quant:
        embed, escale = embed["q"], embed["s"].astype(jnp.float32)
    else:
        escale = jnp.ones((embed.shape[0],), jnp.float32)
    hquant = isinstance(heads_w, dict)
    if hquant:
        heads_w, hscale = heads_w["q"], heads_w["s"].astype(jnp.float32)
    else:
        hscale = jnp.ones(heads_w.shape[:1] + heads_w.shape[2:], jnp.float32)
    b, n, d = hver.shape
    bn = b * n
    n_heads = heads_w.shape[0]
    kp1 = n_heads + (1 if identity0 else 0)
    r = kp1 * bn
    v = embed.shape[0]
    r_pad = max(8, -(-r // 8) * 8)
    if pos.shape[0] != r or gcol.shape[0] != r:
        raise ValueError(f"pos/gcol must have {r} rows")
    pos = jnp.pad(pos, (0, r_pad - r))
    gcol = jnp.pad(gcol, (0, r_pad - r))
    pos2 = jnp.broadcast_to(pos[:, None], (r_pad, 128)).astype(jnp.int32)
    gcol2 = jnp.broadcast_to(gcol[:, None], (r_pad, 128)).astype(jnp.int32)

    tile = _ROWS_TILE
    grid = (1 + pl.cdiv(v, tile),)
    kern = functools.partial(
        _kernel_hidden, v=v, rows=r_pad, kp1=kp1, bn=bn, identity0=identity0,
        begin_index=begin_index, eos_id=eos_id, decay=decay, quant=quant,
        hquant=hquant)
    stat = lambda dt: jax.ShapeDtypeStruct((r_pad, 128), dt)
    vtile = lambda i: (jnp.maximum(i - 1, 0), 0)
    vcol = lambda i: (0, jnp.maximum(i - 1, 0))
    mx, lse, am, gth = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (0, 0)),
            pl.BlockSpec((bn, d), lambda i: (0, 0)),
            pl.BlockSpec((n_heads, d, d), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_heads, d), lambda i: (0, 0)),
            pl.BlockSpec((n_heads, d), lambda i: (0, 0)),
            pl.BlockSpec((r_pad, 128), lambda i: (0, 0)),
            pl.BlockSpec((r_pad, 128), lambda i: (0, 0)),
            pl.BlockSpec((tile, d), vtile),
            pl.BlockSpec((1, tile), vcol),
            pl.BlockSpec((2, tile), vcol),
        ],
        out_specs=[pl.BlockSpec((r_pad, 128), lambda i: (0, 0))] * 4,
        out_shape=[stat(jnp.float32), stat(jnp.float32),
                   stat(jnp.int32), stat(jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((r_pad, d), hver.dtype),
            pltpu.VMEM((r_pad, 128), jnp.float32),
            pltpu.VMEM((r_pad, 128), jnp.float32),
            pltpu.VMEM((r_pad, 128), jnp.int32),
            pltpu.VMEM((r_pad, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(hver.reshape(bn, d), hsrc.reshape(bn, d),
      heads_w if hquant else heads_w.astype(hver.dtype), hscale,
      heads_b.astype(jnp.float32),
      pos2, gcol2, embed, escale[None, :], sup_masks)
    return (am[:r, 0], mx[:r, 0], lse[:r, 0], gth[:r, 0])


def masks_for(pcfg) -> jnp.ndarray:
    """Build the (2, V) i8 [suppress; begin-suppress] mask pair for a
    ProcessorConfig (static; hoisted out of decode loops by jit)."""
    v = pcfg.vocab_size
    sup = pcfg.suppress_mask()
    bsup = pcfg.begin_suppress_mask()
    m = np.zeros((2, v), np.int8)
    if sup is not None:
        m[0, sup] = 1
    if bsup is not None:
        m[1, bsup] = 1
    return jnp.asarray(m)
