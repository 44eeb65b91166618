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

Whisper TIMESTAMP rules (processors.py::apply_timestamp_rules) fuse too: the
pairing/monotonicity/initial-cap masks are tile-local given each row's
(last, penult, max-timestamp) history — which the speculative loop already
precomputes per node — and the global sum-probability rule ("force a
timestamp when the timestamp mass beats the best text token") folds into the
same online-stats pass: the kernel additionally carries the timestamp-region
logsumexp/argmax and the text-region max, and the final tile resolves
``force = lse_ts > max_text`` (the full-row normalizer cancels from both
sides), swapping in the timestamp-region statistics for forced rows.  Only
verification rows (< ``n_verif``) take the rules — draft rows mirror the
unfused path, which applies base processors only.

Scope: the chain + greedy decode path (the reference's default configuration),
now INCLUDING ``return_timestamps=True``.  Branching trees need top-k per
level and sampling needs full distributions — those keep the unfused path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

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


class _Stats:
    """Per-row online statistics scratch bundle (all (R_pad, 128))."""

    def __init__(self, scratches, ts: bool):
        (self.m, self.s, self.a, self.g) = scratches[:4]
        self.ts = ts
        if ts:
            (self.m_ts, self.s_ts, self.a_ts, self.m_tx) = scratches[4:8]

    def reset(self):
        self.m[:] = jnp.full_like(self.m, NEG)
        self.s[:] = jnp.zeros_like(self.s)
        self.a[:] = jnp.zeros_like(self.a)
        self.g[:] = jnp.full_like(self.g, NEG)
        if self.ts:
            self.m_ts[:] = jnp.full_like(self.m_ts, NEG)
            self.s_ts[:] = jnp.zeros_like(self.s_ts)
            self.a_ts[:] = jnp.zeros_like(self.a_ts)
            self.m_tx[:] = jnp.full_like(self.m_tx, NEG)


def _process_tile(x, cols, pos, sup_ref, *, v, begin_index, eos_id, decay,
                  ts_cfg, last, penult, maxts, is_verif):
    """Apply the base processors (+ optional timestamp rules 1-4) to one
    (R, TILE) block of logits.  Mirrors decoding/processors.py."""
    x = jnp.where((sup_ref[0:1] != 0) | (cols >= v), NEG, x)
    x = jnp.where((sup_ref[1:2] != 0) & (pos == begin_index), NEG, x)
    if decay is not None:
        start, factor = decay
        idx = jnp.maximum(pos - start, 0).astype(jnp.float32)
        pen = jnp.abs(x) * (jnp.exp(idx * float(np.log(factor))) - 1.0)
        x = jnp.where((cols == eos_id) & (pos > start), x + pen, x)
    if ts_cfg is not None:
        ts_begin, no_ts_id, cap = ts_cfg
        is_ts = cols >= ts_begin
        gen_len = pos - begin_index
        last_is_ts = (last >= ts_begin) & (gen_len >= 1)
        penult_is_ts = (gen_len < 2) | (penult >= ts_begin)
        sup_ts = last_is_ts & penult_is_ts
        sup_text = last_is_ts & ~penult_is_ts
        floor = jnp.where(sup_text, maxts, maxts + 1)
        floor = jnp.where(maxts > 0, floor, ts_begin)
        rule = (cols == no_ts_id)
        rule |= sup_ts & is_ts
        rule |= sup_text & (cols < eos_id)
        rule |= is_ts & (cols < floor)
        if cap is not None:
            rule |= (pos == begin_index) & (cols > ts_begin + cap)
        x = jnp.where(is_verif & rule, NEG, x)
    return x


def _fold_tile(st: _Stats, x, cols, col0, gcol, ts_cfg):
    """Fold one processed (R, TILE) block into the running row statistics."""
    mt = jnp.max(x, axis=1, keepdims=True)               # (R, 1)
    at = jnp.argmax(x, axis=1).astype(jnp.int32)[:, None] + col0
    upd = mt > st.m[:, :1]
    st.a[:] = jnp.where(upd, at, st.a[:, :1]) + jnp.zeros_like(st.a)
    m_new = jnp.maximum(st.m[:, :1], mt)
    st.s[:] = (st.s[:, :1] * jnp.exp(st.m[:, :1] - m_new)
               + jnp.sum(jnp.exp(x - m_new), axis=1, keepdims=True)
               ) + jnp.zeros_like(st.s)
    st.m[:] = m_new + jnp.zeros_like(st.m)
    gmatch = jnp.max(jnp.where(cols == gcol, x, NEG), axis=1, keepdims=True)
    st.g[:] = jnp.maximum(st.g[:, :1], gmatch) + jnp.zeros_like(st.g)
    if ts_cfg is not None:
        ts_begin = ts_cfg[0]
        is_ts = cols >= ts_begin
        x_ts = jnp.where(is_ts, x, NEG)
        mt_ts = jnp.max(x_ts, axis=1, keepdims=True)
        at_ts = jnp.argmax(x_ts, axis=1).astype(jnp.int32)[:, None] + col0
        upd_ts = mt_ts > st.m_ts[:, :1]
        st.a_ts[:] = (jnp.where(upd_ts, at_ts, st.a_ts[:, :1])
                      + jnp.zeros_like(st.a_ts))
        mts_new = jnp.maximum(st.m_ts[:, :1], mt_ts)
        st.s_ts[:] = (st.s_ts[:, :1] * jnp.exp(st.m_ts[:, :1] - mts_new)
                      + jnp.sum(jnp.exp(x_ts - mts_new), axis=1,
                                keepdims=True)) + jnp.zeros_like(st.s_ts)
        st.m_ts[:] = mts_new + jnp.zeros_like(st.m_ts)
        mt_tx = jnp.max(jnp.where(is_ts, NEG, x), axis=1, keepdims=True)
        st.m_tx[:] = (jnp.maximum(st.m_tx[:, :1], mt_tx)
                      + jnp.zeros_like(st.m_tx))


def _emit(st: _Stats, o_max, o_lse, o_arg, o_gth, gcol, is_verif, ts_cfg):
    """Resolve the final statistics (incl. the timestamp force rule)."""
    if ts_cfg is None:
        o_max[:] = st.m[:]
        o_lse[:] = jnp.log(st.s[:]) + st.m[:]
        o_arg[:] = st.a[:]
        o_gth[:] = st.g[:]
        return
    ts_begin = ts_cfg[0]
    # force_ts <=> lse(ts logprobs) > max(text logprobs); the full-row
    # normalizer cancels, leaving raw processed-logit statistics.
    lse_ts = jnp.log(st.s_ts[:, :1]) + st.m_ts[:, :1]
    force = is_verif[:, :1] & (lse_ts > st.m_tx[:, :1])
    o_max[:] = jnp.where(force, st.m_ts[:], st.m[:])
    o_lse[:] = jnp.where(force, lse_ts, jnp.log(st.s[:, :1]) + st.m[:, :1]) \
        + jnp.zeros_like(o_lse)
    o_arg[:] = jnp.where(force, st.a_ts[:], st.a[:])
    o_gth[:] = jnp.where(force & (gcol < ts_begin), NEG, st.g[:])


def _kernel(x_ref, pos_ref, gcol_ref, last_ref, pen_ref, mts_ref,
            w_ref, ws_ref, sup_ref, o_max, o_lse, o_arg, o_gth, *scratches,
            v: int, n_verif: int, begin_index: int, eos_id: int, decay,
            ts_cfg, quant: bool):
    """One vocab tile: project, process, fold into the running row stats.

    sup_ref: (2, TILE) i8 — row 0 suppress mask, row 1 begin-suppress mask.
    ws_ref: (1, TILE) f32 — per-row dequant scales (int8 embedding mode).
    decay: None or (start, factor) — exponential EOS decay constants.
    ts_cfg: None or (timestamp_begin, no_timestamps_id, max_initial_cap).
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    tile = w_ref.shape[0]
    col0 = i * tile
    st = _Stats(scratches, ts_cfg is not None)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (x_ref.shape[0], 1), 0)
    is_verif = rowi < n_verif

    @pl.when(i == 0)
    def _():
        st.reset()

    x = jax.lax.dot_general(
        x_ref[:], w_ref[:].astype(x_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (R, TILE)
    if quant:
        x = x * ws_ref[:]                                # per-column scales
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + col0
    pos = pos_ref[:, :1]                                 # (R, 1)
    x = _process_tile(x, cols, pos, sup_ref, v=v, begin_index=begin_index,
                      eos_id=eos_id, decay=decay, ts_cfg=ts_cfg,
                      last=last_ref[:, :1], penult=pen_ref[:, :1],
                      maxts=mts_ref[:, :1], is_verif=is_verif)
    _fold_tile(st, x, cols, col0, gcol_ref[:, :1], ts_cfg)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        _emit(st, o_max, o_lse, o_arg, o_gth, gcol_ref[:, :1], is_verif,
              ts_cfg)


def _row_meta(r, r_pad, pos, gcol, last, penult, maxts):
    def prep(a):
        if a is None:
            a = jnp.zeros((r,), jnp.int32)
        a = jnp.pad(a, (0, r_pad - r))
        return jnp.broadcast_to(a[:, None], (r_pad, 128)).astype(jnp.int32)

    return prep(pos), prep(gcol), prep(last), prep(penult), prep(maxts)


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
    ts_cfg=None,           # None | (ts_begin, no_ts_id, max_initial_cap)
    n_verif: int = 0,      # rows < n_verif take the timestamp rules
    last: Optional[jnp.ndarray] = None,    # (R,) i32 per-row last token
    penult: Optional[jnp.ndarray] = None,  # (R,) i32 token two back
    maxts: Optional[jnp.ndarray] = None,   # (R,) i32 running max timestamp
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
    pos2, gcol2, last2, pen2, mts2 = _row_meta(r, r_pad, pos, gcol, last,
                                               penult, maxts)

    tile = _ROWS_TILE
    grid = (pl.cdiv(v, tile),)
    kern = functools.partial(
        _kernel, v=v, n_verif=n_verif, begin_index=begin_index,
        eos_id=eos_id, decay=decay, ts_cfg=ts_cfg, quant=quant)
    stat = lambda dt: jax.ShapeDtypeStruct((r_pad, 128), dt)
    n_scr = 8 if ts_cfg is not None else 4
    scr = [pltpu.VMEM((r_pad, 128), jnp.float32),
           pltpu.VMEM((r_pad, 128), jnp.float32),
           pltpu.VMEM((r_pad, 128), jnp.int32),
           pltpu.VMEM((r_pad, 128), jnp.float32)]
    if ts_cfg is not None:
        scr += [pltpu.VMEM((r_pad, 128), jnp.float32),
                pltpu.VMEM((r_pad, 128), jnp.float32),
                pltpu.VMEM((r_pad, 128), jnp.int32),
                pltpu.VMEM((r_pad, 128), jnp.float32)]
    mx, lse, am, gth = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_pad, d), lambda i: (0, 0)),
        ] + [pl.BlockSpec((r_pad, 128), lambda i: (0, 0))] * 5 + [
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((2, tile), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((r_pad, 128), lambda i: (0, 0))] * 4,
        out_shape=[stat(jnp.float32), stat(jnp.float32),
                   stat(jnp.int32), stat(jnp.float32)],
        scratch_shapes=scr,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(hs, pos2, gcol2, last2, pen2, mts2, embed, escale[None, :], sup_masks)
    return (am[:r, 0], mx[:r, 0], lse[:r, 0], gth[:r, 0])


def _kernel_hidden(
    hver_ref,     # (BN, D) bf16 — row-block-0 source (post-LN hidden)
    hsrc_ref,     # (BN, D) bf16 — draft-row source (same array for base_head)
    hw_ref,       # (H, D, D) bf16|int8 stacked single-res-block head weights
    hws_ref,      # (H, D) f32 per-output-channel head dequant scales (ones
                  # when the heads are bf16)
    hb_ref,       # (H, D) f32 head biases
    pos_ref, gcol_ref, last_ref, pen_ref, mts_ref, w_ref, ws_ref, sup_ref,
    o_max, o_lse, o_arg, o_gth,
    rows_s,       # (R_pad, D) bf16 scratch — constructed rows live here
    *scratches,
    v: int, n_verif: int, kp1: int, bn: int, identity0: bool,
    begin_index: int, eos_id: int, decay, ts_cfg, quant: bool, hquant: bool,
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
    st = _Stats(scratches, ts_cfg is not None)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (r_pad, 1), 0)
    is_verif = rowi < n_verif

    @pl.when(i == 0)
    def _():
        st.reset()
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
        x = _process_tile(x, cols, pos, sup_ref, v=v, begin_index=begin_index,
                          eos_id=eos_id, decay=decay, ts_cfg=ts_cfg,
                          last=last_ref[:, :1], penult=pen_ref[:, :1],
                          maxts=mts_ref[:, :1], is_verif=is_verif)
        _fold_tile(st, x, cols, col0, gcol_ref[:, :1], ts_cfg)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        _emit(st, o_max, o_lse, o_arg, o_gth, gcol_ref[:, :1], is_verif,
              ts_cfg)


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
    ts_cfg=None,           # None | (ts_begin, no_ts_id, max_initial_cap)
    n_verif: int = 0,
    last: Optional[jnp.ndarray] = None,
    penult: Optional[jnp.ndarray] = None,
    maxts: Optional[jnp.ndarray] = None,
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
    pos2, gcol2, last2, pen2, mts2 = _row_meta(r, r_pad, pos, gcol, last,
                                               penult, maxts)

    tile = _ROWS_TILE
    grid = (1 + pl.cdiv(v, tile),)
    kern = functools.partial(
        _kernel_hidden, v=v, n_verif=n_verif, kp1=kp1, bn=bn,
        identity0=identity0, begin_index=begin_index, eos_id=eos_id,
        decay=decay, ts_cfg=ts_cfg, quant=quant, hquant=hquant)
    stat = lambda dt: jax.ShapeDtypeStruct((r_pad, 128), dt)
    vtile = lambda i: (jnp.maximum(i - 1, 0), 0)
    vcol = lambda i: (0, jnp.maximum(i - 1, 0))
    scr = [pltpu.VMEM((r_pad, d), hver.dtype),
           pltpu.VMEM((r_pad, 128), jnp.float32),
           pltpu.VMEM((r_pad, 128), jnp.float32),
           pltpu.VMEM((r_pad, 128), jnp.int32),
           pltpu.VMEM((r_pad, 128), jnp.float32)]
    if ts_cfg is not None:
        scr += [pltpu.VMEM((r_pad, 128), jnp.float32),
                pltpu.VMEM((r_pad, 128), jnp.float32),
                pltpu.VMEM((r_pad, 128), jnp.int32),
                pltpu.VMEM((r_pad, 128), jnp.float32)]
    mx, lse, am, gth = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (0, 0)),
            pl.BlockSpec((bn, d), lambda i: (0, 0)),
            pl.BlockSpec((n_heads, d, d), lambda i: (0, 0, 0)),
            pl.BlockSpec((n_heads, d), lambda i: (0, 0)),
            pl.BlockSpec((n_heads, d), lambda i: (0, 0)),
        ] + [pl.BlockSpec((r_pad, 128), lambda i: (0, 0))] * 5 + [
            pl.BlockSpec((tile, d), vtile),
            pl.BlockSpec((1, tile), vcol),
            pl.BlockSpec((2, tile), vcol),
        ],
        out_specs=[pl.BlockSpec((r_pad, 128), lambda i: (0, 0))] * 4,
        out_shape=[stat(jnp.float32), stat(jnp.float32),
                   stat(jnp.int32), stat(jnp.float32)],
        scratch_shapes=scr,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(hver.reshape(bn, d), hsrc.reshape(bn, d),
      heads_w if hquant else heads_w.astype(hver.dtype), hscale,
      heads_b.astype(jnp.float32),
      pos2, gcol2, last2, pen2, mts2, embed, escale[None, :], sup_masks)
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


def ts_cfg_for(pcfg):
    """(timestamp_begin, no_timestamps_id, max_initial_cap) static triple for
    the kernel's fused timestamp rules (None members where the config lacks
    them)."""
    return (pcfg.timestamp_begin, pcfg.no_timestamps_id,
            pcfg.max_initial_timestamp_index)
