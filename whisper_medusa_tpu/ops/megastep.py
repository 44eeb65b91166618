"""Fused whole-decoder-stack Pallas kernel for the incremental decode step.

One decode step must stream every decoder weight plus the KV caches through
matvec-sized compute (T = 1..16 query rows).  The XLA ``lax.scan`` formulation
runs this at ~460 GB/s on v5e: each layer is a serial chain of ~15 small ops
(layernorms, matvecs, softmaxes) and the weight reads only overlap compute
within one scan iteration, so DMA-latency bubbles pile up at every op
boundary.  Replacing per-op kernels made it *worse* (tools/decode_kernels_experiment.py):
a pallas_call inside the scan is opaque to XLA's latency-hiding scheduler.

This kernel replaces the **entire layer scan** with one ``pallas_call`` over a
``grid = (layers, phases)``: the hidden state lives in a VMEM scratch carried
across grid steps, while Mosaic's pipeline emitter streams each phase's
weights for step s+1 during step s.  DMAs are issued back-to-back and the
(tiny) compute hides in their shadow, so the step runs at DMA speed, and the
chunk's K/V cache rows are committed by an in-kernel DMA into the aliased
slab buffers (an outside ``dynamic_update_slice`` costs ~0.23 ms/step in
whole-slab copies).  Measured on v5e at large-v2 shapes: T=1 decode step
3.81 -> 2.84 ms, T=11 speculative chunk 4.06 -> 2.89 ms (~620 GB/s, vs ~460
for the scan; phase-stub profiling shows the kernel fully DMA-bound).

Phases per layer (fc chunking keeps double-buffered VMEM under the 128 MB
v5e budget while giving the pipeline uniform-sized DMAs):

  p0: self-attention   (q/k/v/o weights + both self-cache slabs, ~16 MB)
  p1: cross-attention  (cross q/o weights + precomputed cross K/V, ~14 MB)
  p2..: FFN chunk c    (fc1/fc2 column/row chunk c, ~13 MB each)

Numerics mirror ``models/whisper.py::decoder_layer_step`` op-for-op (f32
layernorm/softmax/accumulation, bf16 operands, f32 GELU via the same erf
approximation as ops/decode_ops.py lineage) so the fused and scan paths agree to
bf16 rounding.  Inference-only; autodiff uses the teacher-forced path.

Scope (callers gate via :func:`available`): B <= 8 (batch >= 3 splits the
cross phase into head-group sub-phases and the FFN into more chunks so the
VMEM windows fit — see _pick_phases),
T <= 16 new tokens, bf16 weights or the int8 serving mode
(ops/qmm.py::quantize_decoder — int8 tiles dequantize in VMEM and
per-output-channel scales ride the packed small-params block, halving the
dominant weight stream; the int8 cross cache dequantizes through the
attention scores/probabilities), no beam folding.  The medusa-block variant
IS fused: the extra layer rides the grid as layer L (its weights stacked on
by models/whisper.py::extend_layers_with_block; at the transition the kernel
saves the main stack's pre-norm output and applies ln_post before the block
layer's own phases — reference architecture: model.py:1349-1417).  Small
batches share one weight stream — per-row matmuls stack, only attention and
the cache-commit DMAs loop per example.  Large batches amortize the weight
stream across rows, where the XLA scan is the better schedule.

Replaces the per-step HF decoder forward of the reference
(reference: whisper_medusa/models/model.py:639-648 -> HF modeling_whisper).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_ENABLED = os.environ.get("WM_MEGASTEP", "1") == "1"
# Interpret mode needs its own opt-in (not the shared WM_ATTENTION_INTERPRET):
# several test modules set the shared flag process-wide, and routing every
# CPU decode test through a 32-grid-step interpreted kernel would both slow
# the suite and hide the XLA scan path from coverage.
_INTERPRET = os.environ.get("WM_MEGASTEP_INTERPRET", "0") == "1"
# Debug: comma-list of phases ("self", "cross", "ffn") whose compute is
# stubbed out (weight DMAs still run) — isolates compute vs stream cost.
# "commit" stubs only the in-kernel cache-commit DMAs (attention still runs)
# — the isolation knob for the B>=3 fault hunt.
_SKIP = frozenset(
    s for s in os.environ.get("WM_MEGASTEP_SKIP", "").split(",") if s)


def _w8a8() -> bool:
    """Experimental: feed the int8 weight tiles STRAIGHT to the MXU (W8A8).

    Quantizes activations per row (amax/127) and runs native s8 x s8 MXU
    matmuls with row x column scales folded into the f32 output, eliminating
    the per-tile dequant casts of the default W8A16 path.  Measured on v5e it
    is perf-NEUTRAL — phase-stub profiling showed the int8 kernel is DMA-
    bound, not cast-bound (the real round-3 win was the head-flat cache
    layout + single-phase FFN stream) — while the activation quantization
    adds ~0.4%/matmul noise that can shift draft-acceptance behavior.
    Default OFF; WM_MEGASTEP_W8A8=1 enables it (parity-tested both ways)."""
    return os.environ.get("WM_MEGASTEP_W8A8", "0") == "1"

def _blkdiag() -> bool:
    """Block-diagonal self-attention form (see the kernel's blkdiag branch):
    all heads of a group computed as one S-major score matmul per example.
    WM_MEGASTEP_BLKDIAG=0 restores the per-head loop."""
    return os.environ.get("WM_MEGASTEP_BLKDIAG", "1") == "1"


def _prefetch() -> bool:
    """Deep-lookahead self-slab prefetch (WM_MEGASTEP_PREFETCH=1).

    The phase pipeline's lookahead is one window deep, so a phase whose
    compute exceeds the NEXT window's DMA exposes the excess (DESIGN.md §10:
    1.65 ms/step exposed at int8 b=8).  With prefetch on, the self K/V (and
    int8 scale) slabs leave the BlockSpec pipeline: layer l+1's slab copies
    are issued manually at layer l's FIRST phase into a 2-slot VMEM ring, so
    they ride the DMA engine under the whole layer's compute (~9 phases of
    slack vs ~7 us of transfer) and the self phase never waits on them.
    blkdiag-path only; default off until measured per (dtype, batch)."""
    return os.environ.get("WM_MEGASTEP_PREFETCH", "0") == "1"


def _prefetch_cross() -> bool:
    """Deep-lookahead cross-K/V prefetch (WM_MEGASTEP_PREFETCH_CROSS=1).

    The cross K/V stream is the kernel's largest (50% of all bytes at int8
    b=8) and its phases are DMA-bound, while the self phases expose compute
    the one-window BlockSpec lookahead cannot use.  With this flag the cross
    K/V group windows become a manually-copied ring with
    WM_MEGASTEP_PFS (default 3) slots: unit u = layer*nc + group is issued
    ``slots - 1`` units ahead of its consuming phase, so the copies queue up
    under the self/earlier-cross compute shadows instead of being waited on
    one window at a time.  The per-group scale rows (int8 mode) stay in the
    BlockSpec pipeline — they are tiny and their head-dim slices are not
    sublane-aligned.  The lookahead group index (g + slots - 1) % nc is
    python-static per phase, so every slice offset stays static except the
    untiled layer index."""
    return os.environ.get("WM_MEGASTEP_PREFETCH_CROSS", "0") == "1"


def _pf_slots() -> int:
    return max(2, int(os.environ.get("WM_MEGASTEP_PFS", "3")))


_MAX_T = 16
NEG_SELF = -1e30   # matches models/whisper.py::attention
NEG_CROSS = -0.7 * float(jnp.finfo(jnp.float32).max)  # matches decode_ops.NEG_BIG

Params = Dict[str, Any]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _streamed_weights(dec_layers: Params):
    return ([dec_layers["self"][k] for k in ("q_w", "k_w", "v_w", "o_w")]
            + [dec_layers["cross"][k] for k in ("q_w", "o_w")]
            + [dec_layers["fc1_w"], dec_layers["fc2_w"]])


def available(dec_layers: Params, d_model: int, num_heads: int, b: int, t: int,
              block: bool, cross_beam: int) -> bool:
    """Gate: can the fused kernel handle this decode_step call?

    Batch: B <= 8 by default (WM_MEGASTEP_MAX_B overrides).  Batch >= 3
    forces the phase pipeline to split its cross/FFN streams into smaller
    windows (see _pick_phases) — the round-2 "B=3-4 v5e fault" was the
    whole-window VMEM overflow this now avoids; beyond 8 the XLA scan's
    weight-stream amortization catches up and the per-example attention
    loops in the kernel stop paying for themselves.

    The medusa_block extra layer is fused too: callers stack it onto the
    decoder layers (models/whisper.py::extend_layers_with_block) and the
    kernel runs it as one more grid layer — after snapshotting the main
    stack's pre-norm output and applying ln_post (reference architecture:
    model.py:1349-1417).
    """
    if not (_ENABLED and (_on_tpu() or _INTERPRET)):
        return False
    max_b = int(os.environ.get("WM_MEGASTEP_MAX_B", "8"))
    if not (1 <= b <= max_b) or t > _MAX_T or cross_beam != 1:
        return False
    if d_model % 128 != 0 or d_model % num_heads != 0:
        return False
    # fc1_b is packed into the small-params block as F/D rows of D.
    if dec_layers["fc1_b"].shape[-1] % d_model != 0:
        return False
    ws = _streamed_weights(dec_layers)
    if isinstance(dec_layers["self"]["q_w"], dict):
        # int8 serving mode (ops/qmm.py::quantize_decoder): every streamed
        # weight must be quantized — the kernel dequantizes tiles in VMEM and
        # applies per-output-channel scales from the packed small-params block.
        return all(isinstance(w, dict) and w["q"].dtype == jnp.int8
                   for w in ws)
    return all((not isinstance(w, dict)) and w.dtype == jnp.bfloat16
               for w in ws)


def _estimate_vmem(b: int, t16: int, d: int, h: int, dh: int, s_len: int,
                   sp_len: int, f: int, sp_rows: int, ns: int, nc: int,
                   nch: int, wbytes: int, kvbytes: int, kv_quant: bool,
                   skv_quant: bool = False) -> int:
    """Sum of the kernel's VMEM window allocations for an (ns, nc, nch) phase
    split — every pipelined input is double-buffered, so the estimate is
    2 x block bytes per streamed input plus single-buffered constants,
    outputs, and scratch.  Mirrors fused_decoder_layers' BlockSpecs."""
    sgd = (h // ns) * dh
    gd = (h // nc) * dh
    f2 = f // nch
    tot = b * t16 * d * 2                       # x (single-buffered)
    tot += t16 * 128 * 4                        # chunk bias
    tot += sp_rows * d * 4 * 2                  # packed small params
    tot += 4 * d * sgd * wbytes * 2             # self q/k/v/o group slices
    tot += 2 * d * gd * wbytes * 2              # cross q/o group columns/rows
    skv_b = 1 if skv_quant else 2
    if _prefetch() and _blkdiag():
        # Prefetch rings hold BOTH slots of the full-width slabs (see
        # _prefetch) instead of double-buffered group windows.
        tot += 2 * ns * b * s_len * sgd * skv_b * 2
        if skv_quant:
            tot += 2 * b * s_len * 128 * 2      # scale-slab ring (bf16)
    else:
        tot += 2 * b * s_len * sgd * skv_b * 2  # self-cache slab group slices
        if skv_quant:
            tot += b * s_len * 128 * 2 * 2      # scale slab (SHp<=128 lanes)
    if skv_quant and not _blkdiag():
        tot += 128 * 2 * sgd * 2 * 2            # per-group expansion matrix
    if _prefetch_cross():
        # Ring slots replace the double-buffered cross K/V windows.
        tot += _pf_slots() * b * (h // nc) * dh * sp_len * kvbytes
        tot += _pf_slots() * b * sp_len * gd * kvbytes
    else:
        tot += b * (h // nc) * dh * sp_len * kvbytes * 2   # cross K group
        tot += b * sp_len * gd * kvbytes * 2    # cross V group (head-flat)
    if kv_quant:
        tot += 2 * b * (h // nc) * sp_len * 4 * 2      # k/v scales
    tot += (d * f2 + f2 * d) * wbytes * 2       # fc1/fc2 chunk
    tot += 2 * b * t16 * d * 2                  # y, y2 outputs
    tot += b * t16 * d * (2 + 4 + 2)            # xs, acc, lnb scratch
    tot += 2 * b * (t16 + 8) * d * 2            # cache-commit staging
    return tot


def _self_groups(h: int, dh: int) -> Tuple[int, ...]:
    return tuple(n for n in range(1, h + 1)
                 if h % n == 0 and ((h // n) * dh) % 128 == 0)


def _pick_phases(b: int, t16: int, d: int, h: int, dh: int, s_len: int,
                 sp_len: int, f: int, sp_rows: int, wbytes: int,
                 kvbytes: int, kv_quant: bool,
                 skv_quant: bool = False) -> Tuple[int, int, int]:
    """Choose (self head-groups, cross head-groups, FFN chunks).

    The pipeline's lookahead is one phase deep: during phase s's compute only
    phase s+1's DMA is in flight, so a phase whose compute exceeds the whole
    layer's remaining DMA stalls the stream.  The self-attention per-head loop
    is exactly that phase at batch >= 3 (v5e phase-stub decomposition at
    large-v2, int8 b=8 t=11: self compute 1.57 ms/step exposed vs a 3.0 ms
    DMA floor), so it is split into ``ns`` head-group sub-phases — spreading
    both its compute and its slab/weight DMAs — with the o-projection
    accumulated as group partials like the cross phase.  Cross/FFN splits
    remain VMEM-driven: fewest phases whose double-buffered windows fit.
    WM_MEGASTEP_FORCE_PHASES="ns,nc,nch" pins the split for tests."""
    force = os.environ.get("WM_MEGASTEP_FORCE_PHASES")
    if force:
        parts = [int(v) for v in force.split(",")]
        if len(parts) == 2:         # legacy "nc,nch"
            return 1, parts[0], parts[1]
        return parts[0], parts[1], parts[2]
    budget = (int(os.environ.get("WM_MEGASTEP_VMEM_MB", "128")) - 20) * 2**20
    nss = _self_groups(h, dh)
    nchs = [n for n in (1, 2, 4, 8) if f % n == 0 and (f // n) % d == 0]

    def fits(ns_, nc_, nch_):
        return (ns_ in nss and nc_ in nss and nch_ in nchs
                and _estimate_vmem(b, t16, d, h, dh, s_len, sp_len, f,
                                   sp_rows, ns_, nc_, nch_, wbytes, kvbytes,
                                   kv_quant, skv_quant) <= budget)

    # Measured-best splits per (dtype, batch) from the round-5 forced sweeps
    # (tools/megastep_sweep.py, v5e large-v2 t=11, blkdiag attention; every
    # (ns, nc, nch) in {1,2,5} x {1,2,5,10} x {1,2,4} timed per batch).  The
    # table is per-DTYPE because int8 and bf16 prefer different splits at the
    # same batch; each preference is estimator-verified before use and the
    # round-3/4 floor search remains the fallback for foreign dims.
    # int8 measured: b=2 (2,1,1) 1.93 ms (vs (1,1,1) 1.96); b=4 (2,1,2) 2.83
    # (vs r4 pick (2,2,1) 2.96); b=8 (2,5,2) 4.95 — best of 30 splits, incl.
    # ns/nc=10 and nch=4.  (BENCH_r04's int8 b=2 = 2.43 did not reproduce
    # under identical config this round: clean re-runs give 1.96-2.02.)
    quant8 = wbytes == 1
    if b <= 1:
        prefs = [(1, 1, 1)]
    elif b == 2:
        prefs = [(2, 1, 1), (1, 1, 1)] if quant8 else [(1, 1, 1), (1, 1, 2)]
    elif b <= 4:
        prefs = [(2, 1, 2), (2, 1, 4), (2, 2, 1)] if quant8 \
            else [(2, 1, 2), (2, 2, 1)]
    else:
        prefs = [(2, 5, 2), (2, 5, 4), (5, 5, 1)]
    for p in prefs:
        if fits(*p):
            return p

    # Fallback for dims/batches outside the measured table: the round-3/4
    # VMEM-floor search.
    if b <= 2:
        ns, nc_floor, nch_floor = 1, 1, 1
    elif b <= 4:
        ns = min((n for n in nss if n >= 2), default=max(nss))
        nc_floor, nch_floor = ns, 1
    else:
        ns = min((n for n in nss if n >= 2), default=max(nss))
        nc_floor = min((n for n in nss if n >= 5), default=max(nss))
        nch_floor = min((n for n in nchs if n >= 2), default=max(nchs))
    cands = sorted(((nc, nch) for nc in nss if nc >= nc_floor
                    for nch in nchs if nch >= nch_floor),
                   key=lambda t: (t[0] + t[1], t[0]))
    for nc, nch in cands:
        if _estimate_vmem(b, t16, d, h, dh, s_len, sp_len, f, sp_rows,
                          ns, nc, nch, wbytes, kvbytes, kv_quant,
                          skv_quant) <= budget:
            return ns, nc, nch
    return (ns,) + cands[-1]  # nothing fits: compile fails loudly with the map


def _erf_f32(z):
    """Abramowitz & Stegun 7.1.26 (Pallas TPU has no erf lowering)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-za * za))


def _gelu_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * 0.7071067811865476))


def _ln(x, scale2, bias2):
    """f32-statistics layernorm; scale2/bias2 are (1, D) f32 rows."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * scale2 + bias2).astype(x.dtype)

def _kernel(
    # scalar-ish / constant-per-call inputs
    x_ref,        # (B*T16, D) bf16 — embedded tokens (+pos), pad rows garbage
    off_ref,      # (1, B) i32 SMEM — committed length per example
    cbias_ref,    # (T16, 128) f32 — intra-chunk additive mask in cols [0, T16)
    # per-layer streamed inputs
    sp_ref,       # (1, 12 + F/D, D) f32 — packed layernorms/biases + fc1 bias
    qw_ref, kw_ref, vw_ref,  # (1, D, SGd) bf16|int8 self q/k/v weight COLUMNS
                             # for the current self head group (SGd = H/ns*dh)
    ow_ref,       # (1, SGd, D) self o weight ROWS for the current group
    cqw_ref, cow_ref,   # (1, D, Gd)/(1, Gd, D) bf16 cross q/o weight columns/
                        # rows for the current head group (Gd = H/nc * dh)
    sk_ref, sv_ref,     # (1, B, S, SGd) bf16|int8 self-cache slab lane slices
                        # for the current self head group
    ss_ref,             # (1, B, S, SHp) bf16 int8-mode self-KV scales,
                        # position-major: lane h is head h's k-scale, lane
                        # H + h its v-scale (dummy when not skv_quant)
    se_ref,             # (1, SHp, 2*SGd) bf16 per-group lane-expansion block:
                        # scales @ se -> a (S, 2*SGd) per-lane scale map for
                        # the current self group (cols [0,SGd) for K,
                        # [SGd,2SGd) for V) — one good-M MXU matmul instead
                        # of per-example (S, SHp) transposes (dummy when not
                        # skv_quant)
    ck_ref,       # (1, B, Hg, dh, Sp) bf16|int8 cross keys for the current
                  # head group (head-major)
    cv_ref,       # (1, B, Sp, Gd) bf16|int8 cross values (head-flat — a
                  # head-major (.., Sp, dh=64) block would pad its minor dim
                  # to 128 lanes in the tiled layout and double the V stream)
    cks_ref,      # (1, B, 1, Hg, Sp) f32 int8-mode key scales for the current
                  # head group (dummy when not kv_quant; the explicit group
                  # dim keeps the block's last-two dims == the array dims,
                  # which Mosaic requires when Hg isn't 8-aligned)
    cvs_ref,      # (1, B, 1, Hg, Sp) f32 int8-mode value scales
    f1_ref,       # (1, D, F2) bf16 fc1 chunk
    f2_ref,       # (1, F2, D) bf16 fc2 chunk
    # outputs
    y_ref,        # (B*T16, D) bf16 final pre-norm hidden (main stack)
    y2_ref,       # (B*T16, D) bf16 medusa-block layer output (garbage if absent)
    sko_ref,      # (L, B, S, D) bf16|int8 in HBM, aliased to sk — in-place
    svo_ref,      # (L, B, S, D) bf16|int8 in HBM, aliased to sv
    sso_ref,      # (L, B, S, SHp) bf16 in HBM, aliased to ss (int8 mode)
    # scratch
    xs,           # (B*T16, D) bf16 hidden state carried across the grid
    acc,          # (B*T16, D) f32 self o-partial / cross / ffn accumulator
    lnb,          # (B*T16, D) bf16 self-attn layernorm output, computed once
                  # at self sub-phase 0 and reused by the later head groups
    nk_s,         # (B*(T16+8), SGd) staging for the group cache-window DMAs
    nv_s,
    ns_s,         # (B*(T16+8), SHp) bf16 staging for the scale rows
    sc_a,         # (B*T16, SHp) bf16 chunk K/V scales accumulated across the
                  # self sub-phases (scale-slab commit runs at the last one)
    sems,         # (3, B) DMA semaphores — one triple per example, so every
                  # wait matches exactly the copy it calibrates against
    skb,          # prefetch: (2, NS, B, S, SGd) self-K slab ring (else dummy)
    svb,          # prefetch: (2, NS, B, S, SGd) self-V slab ring
    ssr,          # prefetch: (2, B, S, SHp) bf16 scale-slab ring
    psem,         # prefetch: (3, 2, NS) DMA semaphores (tensor, slot, group)
    ckr,          # prefetch_cross: (PFS, B, Hg, dh, Sp) cross-K ring
    cvr,          # prefetch_cross: (PFS, B, Sp, Gd) cross-V ring
    csem,         # prefetch_cross: (2, PFS) DMA semaphores
    *,
    num_layers: int, num_heads: int, t16: int, t_real: int, cross_len: int,
    n_self: int, n_cross: int, n_chunks: int, scale: float, quant: bool,
    kv_quant: bool, skv_quant: bool, batch: int, has_block: bool, w8a8: bool,
    blkdiag: bool, prefetch: bool, prefetch_cross: bool, pf_slots: int,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l, p = pl.program_id(0), pl.program_id(1)
    d = x_ref.shape[1]
    dh = d // num_heads
    nsh = num_heads // n_self          # heads per self sub-phase
    sgd = nsh * dh
    last_p = n_self + n_cross + n_chunks - 1
    # Packed small-params row layout: 12 base rows, then (block variant only)
    # ln_post's scale/bias, then fc1's F/D bias rows per chunk; int8 mode
    # appends per-output-channel scale rows — 7 (self q/k/v/o, cross q/o, fc2)
    # then fc1's F/D.
    rpc = f1_ref.shape[2] // d
    base = 14 if has_block else 12
    sb = base + rpc * n_chunks

    def quant_rows(a):
        """Per-row symmetric int8 activation quantization (W8A8 path)."""
        a32 = a.astype(jnp.float32)
        amax = jnp.max(jnp.abs(a32), axis=-1, keepdims=True)
        ascale = jnp.maximum(amax, 1e-30) / 127.0
        a8 = jnp.clip(jnp.round(a32 / ascale), -127, 127).astype(jnp.int8)
        return a8, ascale

    def mm(a, w_ref, sidx, gsel=None):
        """a @ w with f32 accumulation.  int8 weights either feed the MXU
        directly (W8A8: activations quantized per row, s8 x s8 -> s32, row and
        column scales folded into the f32 product) or dequantize on the way in
        (W8A16); either way the per-column scale row applies at the output
        (``gsel`` slices the current head group's columns of the scale row
        when the weight block is group-sliced)."""
        w = w_ref[0]
        srow = None
        if quant:
            srow = sp_ref[0, sb + sidx:sb + sidx + 1]
            if gsel is not None:
                srow = gsel(srow)
        if quant and w8a8:
            a8, ascale = quant_rows(a)
            y = jax.lax.dot_general(
                a8, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * ascale * srow
        if quant:
            w = w.astype(a.dtype)
        y = jnp.dot(a, w, preferred_element_type=jnp.float32)
        if quant:
            y = y * srow
        return y

    @pl.when((l == 0) & (p == 0))
    def _():
        xs[:] = x_ref[:]

    # Deep-lookahead slab prefetch (see _prefetch): the self K/V (+ int8
    # scale) slabs are read from the ALIASED HBM outputs with manual copies
    # issued one full layer ahead, instead of from one-phase-lookahead
    # BlockSpec windows.  Reading layer l+1's HBM slab before layer l+1's
    # own commit is safe: the commit only writes rows >= off, which the
    # attention masks out and the staging merge overwrites.
    pf_slot = l % 2
    pf_g = jnp.minimum(p, n_self - 1)
    if prefetch:
        def pf_issue(lay, slot):
            for g in range(n_self):
                pltpu.make_async_copy(
                    sko_ref.at[lay, :, :, pl.ds(g * sgd, sgd)],
                    skb.at[slot, g], psem.at[0, slot, g]).start()
                pltpu.make_async_copy(
                    svo_ref.at[lay, :, :, pl.ds(g * sgd, sgd)],
                    svb.at[slot, g], psem.at[1, slot, g]).start()
            if skv_quant:
                pltpu.make_async_copy(
                    sso_ref.at[lay], ssr.at[slot],
                    psem.at[2, slot, 0]).start()

        def pf_wait(slot):
            # Reconstructed same-shape descriptors calibrate the waits (the
            # cache-commit waits below use the same pattern).
            for g in range(n_self):
                pltpu.make_async_copy(
                    sko_ref.at[0, :, :, pl.ds(0, sgd)],
                    skb.at[slot, g], psem.at[0, slot, g]).wait()
                pltpu.make_async_copy(
                    svo_ref.at[0, :, :, pl.ds(0, sgd)],
                    svb.at[slot, g], psem.at[1, slot, g]).wait()
            if skv_quant:
                pltpu.make_async_copy(
                    sso_ref.at[0], ssr.at[slot], psem.at[2, slot, 0]).wait()

        @pl.when((l == 0) & (p == 0))
        def _():
            pf_issue(0, 0)
            pf_wait(0)
            if num_layers > 1:
                pf_issue(1, 1)

        @pl.when((l > 0) & (p == 0))
        def _():
            pf_wait(pf_slot)

        if num_layers > 1:
            @pl.when((l > 0) & (l + 1 < num_layers) & (p == 0))
            def _():
                pf_issue(l + 1, (l + 1) % 2)

    # Cross-K/V ring prefetch (see _prefetch_cross): unit u = l*nc + g is
    # waited at its consuming phase (l, ns + g) and unit u + LA is issued
    # there — LA = pf_slots - 1 units of copies queue under the compute
    # shadows of the intervening phases.  g and (g + LA) % nc are python
    # ints per phase, so every slice offset except the untiled layer index
    # is static.  Runs outside the _SKIP guards so the DMA-only stub keeps
    # the full byte stream.
    hg_c = num_heads // n_cross
    gd_c = hg_c * dh
    if prefetch_cross:
        LA = pf_slots - 1
        CU = num_layers * n_cross

        def cx_issue(l2, g2, slot):
            pltpu.make_async_copy(
                ck_ref.at[l2, :, pl.ds(g2 * hg_c, hg_c)],
                ckr.at[slot], csem.at[0, slot]).start()
            pltpu.make_async_copy(
                cv_ref.at[l2, :, :, pl.ds(g2 * gd_c, gd_c)],
                cvr.at[slot], csem.at[1, slot]).start()

        def cx_wait(slot):
            pltpu.make_async_copy(
                ck_ref.at[0, :, pl.ds(0, hg_c)],
                ckr.at[slot], csem.at[0, slot]).wait()
            pltpu.make_async_copy(
                cv_ref.at[0, :, :, pl.ds(0, gd_c)],
                cvr.at[slot], csem.at[1, slot]).wait()

        @pl.when((l == 0) & (p == 0))
        def _():
            for uu in range(min(LA, CU)):
                cx_issue(uu // n_cross, uu % n_cross, uu % pf_slots)

        for g in range(n_cross):
            l_off = (g + LA) // n_cross
            g2 = (g + LA) % n_cross

            @pl.when(p == n_self + g)
            def _(g=g, l_off=l_off, g2=g2):
                u = l * n_cross + g
                cx_wait(u % pf_slots)

                @pl.when(l + l_off < num_layers)
                def _():
                    cx_issue(l + l_off, g2, (u + LA) % pf_slots)

    if has_block:
        # Entering the medusa-block grid layer: the main stack is done — save
        # its pre-norm output, then hand the block layer ln_post(hidden) as
        # its input (scan-path equivalent: decoder_layer_step(block_params,
        # ln_post(x), ...) in models/whisper.py::decode_step).
        @pl.when((l == num_layers - 1) & (p == 0))
        def _():
            y_ref[:] = xs[:]
            sp = sp_ref[0]
            xs[:] = _ln(xs[:], sp[12:13], sp[13:14])

    # ----------------------------------------------- p0..ns-1: self-attn
    # Split into n_self head-group sub-phases: the per-head attention loop is
    # the kernel's one long-compute region (1.57 ms/step exposed at int8 b=8,
    # phase-stub decomposition), and the pipeline's one-phase DMA lookahead
    # stalls behind it.  Each sub-phase streams only its group's q/k/v weight
    # columns, o rows, and cache-slab lanes, computes that group's attention,
    # and accumulates a PARTIAL o-projection in the f32 scratch — the same
    # group-partial pattern the cross phase uses.
    @pl.when((p < n_self) & ("self" not in _SKIP))
    def _():
        sp = sp_ref[0]                                   # (sp_rows, D) f32
        x = xs[:]

        @pl.when(p == 0)
        def _():
            lnb[:] = _ln(x, sp[0:1], sp[1:2])
            if skv_quant:
                sc_a[:] = jnp.zeros_like(sc_a)
        ln = lnb[:]

        def gsel(row):
            """Current self group's (1, SGd) slice of a packed (1, D) row
            (static slices selected by the sub-phase id — g = p)."""
            out = row[:, :sgd]
            for g in range(1, n_self):
                out = jnp.where(p == g, row[:, g * sgd:(g + 1) * sgd], out)
            return out

        q = (mm(ln, qw_ref, 0, gsel) + gsel(sp[2:3])).astype(x.dtype) \
            * jnp.asarray(scale, x.dtype)
        k = mm(ln, kw_ref, 1, gsel).astype(x.dtype)
        v = (mm(ln, vw_ref, 2, gsel) + gsel(sp[3:4])).astype(x.dtype)
        s_len = sk_ref.shape[2]
        # Commit each example's chunk K/V rows straight into the HBM cache
        # slab (aliased output buffer): a ~24-row DMA instead of a whole-slab
        # dynamic_update_slice outside, which XLA lowers to a 2x45 MB copy.
        # Mosaic requires 8-aligned (sublane-tile) slice offsets on both
        # sides, so this is a read-modify-write of the aligned window
        # [off_al, off_al + W): old rows come from the already-fetched VMEM
        # slab block, the chunk's rows are merged at remainder r = off -
        # off_al via a static 8-way branch, and untouched rows round-trip
        # unchanged.  init_cache over-allocates 16 rows so the window stays
        # in bounds for every caller.  Each sub-phase commits only its
        # group's lane slice of the window.
        w_rows = t16 + 8
        row = jax.lax.broadcasted_iota(jnp.int32, (w_rows, 1), 0)
        if skv_quant:
            # Quantize the chunk's K/V rows per (row, head) before staging:
            # the slab stores int8 rows, the position-major scale slab one
            # bf16 (k, v) scale pair per head per row (lanes [0, H) and
            # [H, 2H)).  Each sub-phase stashes its group's scale lanes in
            # the sc_a scratch; the scale-slab commit runs once, at the last
            # sub-phase, over the accumulated full-width rows.
            def qrows(a):                        # (B*T16, SGd) -> int8, scales
                qs, ss = [], []
                for hh in range(nsh):
                    sub = a[:, hh * dh:(hh + 1) * dh].astype(jnp.float32)
                    amax = jnp.max(jnp.abs(sub), axis=1, keepdims=True)
                    sc_ = jnp.maximum(amax, 1e-30) / 127.0
                    qs.append(jnp.clip(jnp.round(sub / sc_), -127, 127)
                              .astype(jnp.int8))
                    ss.append(sc_)
                return jnp.concatenate(qs, axis=1), jnp.concatenate(ss, axis=1)

            kq_all, ks_all = qrows(k)            # (B*T16, SGd) i8, (B*T16, nsh)
            vq_all, vs_all = qrows(v)
            for g in range(n_self):
                @pl.when(p == g)
                def _(g=g):
                    sc_a[:, g * nsh:(g + 1) * nsh] = ks_all.astype(sc_a.dtype)
                    sc_a[:, num_heads + g * nsh:num_heads + (g + 1) * nsh] = \
                        vs_all.astype(sc_a.dtype)
        for bb in range(batch) if "commit" not in _SKIP else ():
            off = off_ref[0, bb]
            # Clamp the aligned window so the HBM DMA stays in bounds even for
            # an overfull/foreign cache (fused_decoder_layers rejects slabs
            # without the +16 init_cache slack; this is the in-kernel
            # backstop).  A clamped window makes r >= 8: no merge branch
            # fires, the staging keeps the old rows, and the commit becomes a
            # harmless round-trip instead of out-of-bounds corruption.
            s_cap = ((sk_ref.shape[2] - w_rows) // 8) * 8
            off_al = pl.multiple_of(
                jnp.minimum((off // 8) * 8, s_cap), 8)
            r = off - off_al
            rows_b = slice(bb * t16, bb * t16 + t16)
            stage = slice(bb * w_rows, bb * w_rows + w_rows)
            if prefetch:
                old_k = skb[pf_slot, pf_g, bb,
                            pl.ds(off_al, w_rows)]       # (w_rows, SGd)
                old_v = svb[pf_slot, pf_g, bb, pl.ds(off_al, w_rows)]
            else:
                old_k = sk_ref[0, bb, pl.ds(off_al, w_rows)]  # (w_rows, SGd)
                old_v = sv_ref[0, bb, pl.ds(off_al, w_rows)]
            ksrc = kq_all if skv_quant else k
            vsrc = vq_all if skv_quant else v
            # The previous sub-phase's commit DMAs read from the staging
            # buffers — wait for them (same byte count, so reconstructed copy
            # descriptors calibrate the semaphore wait) before overwriting.
            # Sub-phase 0 waits for the previous LAYER's last group instead.
            @pl.when((l > 0) | (p > 0))
            def _(bb=bb, stage=stage):
                pltpu.make_async_copy(
                    nk_s.at[stage],
                    sko_ref.at[l, bb, pl.ds(0, w_rows), pl.ds(0, sgd)],
                    sems.at[0, bb]).wait()
                pltpu.make_async_copy(
                    nv_s.at[stage],
                    svo_ref.at[l, bb, pl.ds(0, w_rows), pl.ds(0, sgd)],
                    sems.at[1, bb]).wait()
            # Default (r >= 8, clamped window): round-trip the old rows.
            nk_s[stage] = old_k
            nv_s[stage] = old_v
            for rr in range(8):
                @pl.when(r == rr)
                def _(rr=rr, rows_b=rows_b, stage=stage, old_k=old_k,
                      old_v=old_v):
                    keep = (row >= rr) & (row < rr + t_real)
                    nk_s[stage] = jnp.where(
                        keep, jnp.pad(ksrc[rows_b], ((rr, 8 - rr), (0, 0))),
                        old_k)
                    nv_s[stage] = jnp.where(
                        keep, jnp.pad(vsrc[rows_b], ((rr, 8 - rr), (0, 0))),
                        old_v)
            # Issue the group's lane-slice DMAs (static lane offsets selected
            # by the sub-phase id).
            for g in range(n_self):
                @pl.when(p == g)
                def _(g=g, bb=bb, stage=stage, off_al=off_al):
                    pltpu.make_async_copy(
                        nk_s.at[stage],
                        sko_ref.at[l, bb, pl.ds(off_al, w_rows),
                                   pl.ds(g * sgd, sgd)],
                        sems.at[0, bb]).start()
                    pltpu.make_async_copy(
                        nv_s.at[stage],
                        svo_ref.at[l, bb, pl.ds(off_al, w_rows),
                                   pl.ds(g * sgd, sgd)],
                        sems.at[1, bb]).start()
        if skv_quant and "commit" not in _SKIP:
            # Scale-slab commit: full-width rows, once per layer, from the
            # sc_a scratch accumulated across the sub-phases.
            @pl.when(p == n_self - 1)
            def _():
                sc_all = sc_a[:]                        # (B*T16, SHp)
                for bb in range(batch):
                    off = off_ref[0, bb]
                    s_cap = ((sk_ref.shape[2] - w_rows) // 8) * 8
                    off_al = pl.multiple_of(
                        jnp.minimum((off // 8) * 8, s_cap), 8)
                    r = off - off_al
                    rows_b = slice(bb * t16, bb * t16 + t16)
                    stage = slice(bb * w_rows, bb * w_rows + w_rows)
                    old_sc = (ssr[pf_slot, bb, pl.ds(off_al, w_rows)]
                              if prefetch
                              else ss_ref[0, bb, pl.ds(off_al, w_rows)])

                    @pl.when(l > 0)
                    def _(bb=bb, stage=stage):
                        pltpu.make_async_copy(
                            ns_s.at[stage],
                            sso_ref.at[l, bb, pl.ds(0, w_rows), :],
                            sems.at[2, bb]).wait()
                    ns_s[stage] = old_sc
                    for rr in range(8):
                        @pl.when(r == rr)
                        def _(rr=rr, rows_b=rows_b, stage=stage,
                              old_sc=old_sc):
                            keep = (row >= rr) & (row < rr + t_real)
                            ns_s[stage] = jnp.where(
                                keep,
                                jnp.pad(sc_all[rows_b],
                                        ((rr, 8 - rr), (0, 0))),
                                old_sc)
                    pltpu.make_async_copy(
                        ns_s.at[stage],
                        sso_ref.at[l, bb, pl.ds(off_al, w_rows), :],
                        sems.at[2, bb]).start()
        cb = cbias_ref[:, :t16]                          # (T16, T16) f32
        col = jax.lax.broadcasted_iota(jnp.int32, (t16, s_len), 1)
        if "sattn" in _SKIP:
            # Debug stub: projections + commit + (optional) dequant run, the
            # per-head attention math is replaced by identity — isolates the
            # attention loop's compute from the rest of the self phase.  The
            # eps-scaled add keeps a real data dependence so the dequant
            # can't be constant-folded away (numerics are irrelevant here).
            attn = q
            if skv_quant and "sdq" not in _SKIP and not blkdiag:
                outs = []
                for bb in range(batch):
                    sc2 = jax.lax.dot_general(
                        ss_ref[0, bb], se_ref[0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(x.dtype)
                    outs.append(q[bb * t16:(bb + 1) * t16]
                                + sc2[:t16, :sgd] * jnp.asarray(1e-6, x.dtype))
                attn = jnp.concatenate(outs, axis=0)
        elif blkdiag:
            # Block-diagonal attention: the per-head (T16, dh)x(dh, S)
            # matmuls bound MXU utilization by their 11..16 query rows, and
            # at batch >= 3 that compute leaves the DMA shadow (1.6 ms/step
            # exposed at int8 b=8, phase-stub decomposition).  Instead, per
            # example, ALL nsh heads run as ONE score matmul with S on the
            # MXU's M axis: slab_k (S, SGd) x Qblk (SGd, nsh*T16), where
            # Qblk is block-diagonal (column block hh holds q_hh^T, other
            # rows zero).  The nsh x FLOP waste of the block form trades for
            # ~full MXU occupancy (waste nsh <= 5 vs the ~8x M-underuse of
            # the per-head form — and the MXU is otherwise idle).  Softmax
            # runs column-wise; int8 self-KV scales fold into the f32
            # scores/probabilities per (position, head) — the same semantics
            # as the small-batch path, now for every batch, replacing the
            # whole-slab dequant (and its VMEM liveness spike) entirely.
            nq = nsh * t16
            rowi = jax.lax.broadcasted_iota(jnp.int32, (sgd, nq), 0) // dh
            coli = jax.lax.broadcasted_iota(jnp.int32, (sgd, nq), 1) // t16
            qmask = rowi == coli
            # E (nsh, nq): E[h, h*T16 + t] = 1 — expands per-head (.., nsh)
            # scale columns to per-query-column (.., nq) with one tiny MXU
            # dot (lane-dim repeats are relayout-hostile in Mosaic).
            e_r = jax.lax.broadcasted_iota(jnp.int32, (nsh, nq), 0)
            e_c = jax.lax.broadcasted_iota(jnp.int32, (nsh, nq), 1) // t16
            e_exp = (e_r == e_c).astype(jnp.float32)
            # tileI (T16, nq): tileI[t, h*T16 + t'] = (t == t') — selects the
            # diagonal blocks out of the (nq, SGd) PV product.
            t_r = jax.lax.broadcasted_iota(jnp.int32, (t16, nq), 0)
            t_c = jax.lax.broadcasted_iota(jnp.int32, (t16, nq), 1) % t16
            tile_i = (t_r == t_c).astype(jnp.float32)
            cbt = jnp.transpose(cb, (1, 0))              # (T16k, T16q)
            cb_tiled = jax.lax.dot_general(              # (T16k, nq)
                cbt, tile_i, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s_rowi = jax.lax.broadcasted_iota(jnp.int32, (s_len, 1), 0)
            bd_mask = (jax.lax.broadcasted_iota(jnp.int32, (nq, sgd), 0)
                       // t16
                       == jax.lax.broadcasted_iota(jnp.int32, (nq, sgd), 1)
                       // dh)
            outs = []
            for bb in range(batch):
                rows_b = slice(bb * t16, bb * t16 + t16)
                qt = jnp.transpose(q[rows_b], (1, 0))    # (SGd, T16)
                qblk = jnp.where(qmask, jnp.tile(qt, (1, nsh)),
                                 jnp.zeros((), x.dtype))
                if prefetch:
                    slab_k = skb[pf_slot, pf_g, bb]      # (S, SGd) bf16|int8
                    slab_v = svb[pf_slot, pf_g, bb]
                else:
                    slab_k = sk_ref[0, bb]               # (S, SGd) bf16|int8
                    slab_v = sv_ref[0, bb]
                # (An s8 x s8 form — qblk quantized per column, the int8 slab
                # feeding the MXU natively — measured 5.8 vs 5.0 ms/step at
                # int8 b=8: the quantize chain costs more than the slab
                # casts, at every batch.)
                s1t = jax.lax.dot_general(               # (S, nq) f32
                    slab_k.astype(x.dtype), qblk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if skv_quant:
                    if "sdq" in _SKIP:                   # debug stub
                        ks_e = vs_e = jnp.ones((), jnp.float32)
                    else:
                        ssb = (ssr[pf_slot, bb] if prefetch
                               else ss_ref[0, bb])
                        sl_k = ssb[:, 0:nsh]
                        sl_v = ssb[:, num_heads:num_heads + nsh]
                        for g in range(1, n_self):
                            sl_k = jnp.where(
                                p == g, ssb[:, g * nsh:(g + 1) * nsh], sl_k)
                            sl_v = jnp.where(
                                p == g,
                                ssb[:, num_heads + g * nsh:
                                    num_heads + (g + 1) * nsh], sl_v)
                        ks_e = jax.lax.dot_general(      # (S, nq) f32
                            sl_k.astype(jnp.float32), e_exp,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        vs_e = jax.lax.dot_general(
                            sl_v.astype(jnp.float32), e_exp,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    s1t = s1t * ks_e
                s1t = jnp.where(s_rowi < off_ref[0, bb], s1t, NEG_SELF)
                s2t = jax.lax.dot_general(               # (T16k, nq) f32
                    k[rows_b], qblk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + cb_tiled
                m = jnp.maximum(jnp.max(s1t, axis=0, keepdims=True),
                                jnp.max(s2t, axis=0, keepdims=True))
                p1 = jnp.exp(s1t - m)
                p2 = jnp.exp(s2t - m)
                den = (jnp.sum(p1, axis=0, keepdims=True)
                       + jnp.sum(p2, axis=0, keepdims=True))
                p1 = p1 / den
                p2b = (p2 / den).astype(x.dtype)
                if skv_quant:
                    p1 = p1 * vs_e
                pv = jax.lax.dot_general(                # (nq, SGd) f32
                    p1.astype(x.dtype), slab_v.astype(x.dtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                big = pv + jax.lax.dot_general(
                    p2b, v[rows_b], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bigm = jnp.where(bd_mask, big, 0.0)
                oh = jax.lax.dot_general(                # (T16, SGd)
                    tile_i, bigm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                outs.append(oh.astype(x.dtype))
            attn = jnp.concatenate(outs, axis=0)         # (B*T16, SGd)
        else:
            outs = []
            for bb in range(batch):
                rows_b = slice(bb * t16, bb * t16 + t16)
                hist_bias = jnp.where(col < off_ref[0, bb], jnp.float32(0),
                                      NEG_SELF)
                slab_k = sk_ref[0, bb]                   # (S, SGd) bf16|int8
                slab_v = sv_ref[0, bb]
                sc_t = None
                if skv_quant and batch >= 5:
                    # Large batch: dequantize the group's slab lanes up front
                    # — the position-major scale rows expand to a per-lane
                    # (S, 2*SGd) map with ONE good-M MXU matmul against the
                    # group's constant expansion block.  The expansion dot is
                    # a pure gather (exactly one nonzero per column) and
                    # int8 -> bf16 casts are exact, leaving one rounding on
                    # the product.  Committed history rows carry the
                    # quantization error; the chunk's own rows (s2/p2) are
                    # fresh bf16.
                    sc2 = jax.lax.dot_general(
                        ss_ref[0, bb], se_ref[0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(x.dtype)                    # (S, 2*SGd) bf16
                    slab_k = slab_k.astype(x.dtype) * sc2[:, :sgd]
                    slab_v = slab_v.astype(x.dtype) * sc2[:, sgd:]
                elif skv_quant:
                    # Small batch: per-head score/probability scaling from
                    # one transpose of the group's scale lanes per (layer,
                    # sub-phase, example) — row hh is local head hh's k-scale
                    # vector, row nsh + hh its v-scale vector.
                    ssb = ss_ref[0, bb]
                    sl_k = ssb[:, 0:nsh]
                    sl_v = ssb[:, num_heads:num_heads + nsh]
                    for g in range(1, n_self):
                        sl_k = jnp.where(p == g,
                                         ssb[:, g * nsh:(g + 1) * nsh], sl_k)
                        sl_v = jnp.where(
                            p == g,
                            ssb[:, num_heads + g * nsh:
                                num_heads + (g + 1) * nsh], sl_v)
                    sc_t = jnp.transpose(
                        jnp.concatenate([sl_k, sl_v], axis=1)
                        .astype(jnp.float32), (1, 0))    # (2*nsh, S)
                outs_h = []
                for hh in range(nsh):
                    sl = slice(hh * dh, (hh + 1) * dh)
                    qh = q[rows_b, sl]
                    sk_h = slab_k[:, sl]
                    sv_h = slab_v[:, sl]
                    if sc_t is not None:
                        sk_h = sk_h.astype(x.dtype)
                        sv_h = sv_h.astype(x.dtype)
                    s1 = jax.lax.dot_general(
                        qh, sk_h, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if sc_t is not None:
                        s1 = s1 * sc_t[hh:hh + 1]
                    s1 = s1 + hist_bias
                    s2 = jax.lax.dot_general(
                        qh, k[rows_b, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) + cb
                    m = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True),
                                    jnp.max(s2, axis=-1, keepdims=True))
                    p1 = jnp.exp(s1 - m)
                    p2 = jnp.exp(s2 - m)
                    den = (jnp.sum(p1, axis=-1, keepdims=True)
                           + jnp.sum(p2, axis=-1, keepdims=True))
                    p1 = p1 / den
                    if sc_t is not None:
                        p1 = p1 * sc_t[nsh + hh:nsh + hh + 1]
                    p1b = p1.astype(x.dtype)
                    p2b = (p2 / den).astype(x.dtype)
                    oh = (jnp.dot(p1b, sv_h,
                                  preferred_element_type=jnp.float32)
                          + jnp.dot(p2b, v[rows_b, sl],
                                    preferred_element_type=jnp.float32))
                    outs_h.append(oh.astype(x.dtype))
                outs.append(jnp.concatenate(outs_h, axis=1))
            attn = jnp.concatenate(outs, axis=0)         # (B*T16, SGd)
        # Partial o-projection for this head group; o's per-output-column
        # int8 scale is group-invariant (contraction over the group rows) so
        # it applies once to the accumulated sum (W8A8: each group's
        # activation row scales ride its own partial).
        ow = ow_ref[0]
        if quant and w8a8:
            a8, asc = quant_rows(attn)
            part = jax.lax.dot_general(
                a8, ow, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * asc
        else:
            if quant:
                ow = ow.astype(x.dtype)
            part = jnp.dot(attn, ow, preferred_element_type=jnp.float32)

        @pl.when(p == 0)
        def _():
            acc[:] = part

        @pl.when(p > 0)
        def _():
            acc[:] = acc[:] + part

        @pl.when(p == n_self - 1)
        def _():
            tot = acc[:]
            if quant:
                tot = tot * sp[sb + 3:sb + 4]
            xs[:] = x + (tot + sp[4:5]).astype(x.dtype)

    # ----------------------------------------- p_ns..p_ns+nc-1: cross-attn
    # The cross phase is split into n_cross head-group sub-phases so its
    # VMEM windows (cross K/V + q/o weight slices, all O(B)) stay inside
    # the budget at batch > 2: group g's phase streams only its Hg = H/nc
    # heads of K/V and the matching q-columns / o-rows, computes a PARTIAL
    # o-projection, and accumulates it in the f32 scratch; the residual add
    # and bias land at the last group.
    @pl.when((p >= n_self) & (p < n_self + n_cross) & ("cross" not in _SKIP))
    def _():
        sp = sp_ref[0]
        x = xs[:]
        ln = _ln(x, sp[5:6], sp[6:7])
        hg = num_heads // n_cross
        gd = hg * dh

        def gsel(row):
            """Current group's (1, Gd) column slice of a packed (1, D) row
            (static slices selected by the phase id — g = p - n_self)."""
            out = row[:, :gd]
            for g in range(1, n_cross):
                out = jnp.where(p == n_self + g,
                                row[:, g * gd:(g + 1) * gd], out)
            return out

        qw = cqw_ref[0]                                  # (D, Gd)
        if quant and w8a8:
            ln8, lns = quant_rows(ln)
            cq = jax.lax.dot_general(
                ln8, qw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            cq = cq * lns * gsel(sp[sb + 4:sb + 5])
        else:
            if quant:
                qw = qw.astype(x.dtype)
            cq = jnp.dot(ln, qw, preferred_element_type=jnp.float32)
            if quant:
                cq = cq * gsel(sp[sb + 4:sb + 5])
        cq = (cq + gsel(sp[7:8])).astype(x.dtype) * jnp.asarray(scale, x.dtype)
        sp_len = ck_ref.shape[4]
        col = jax.lax.broadcasted_iota(jnp.int32, (t16, sp_len), 1)
        cross_bias = jnp.where(col < cross_len, jnp.float32(0),
                               jnp.float32(NEG_CROSS))
        cslot = (l * n_cross
                 + jnp.clip(p - n_self, 0, n_cross - 1)) % pf_slots
        outs = []
        for bb in range(batch):
            rows_b = slice(bb * t16, bb * t16 + t16)
            if prefetch_cross:
                import os as _os
                if _os.environ.get("WM_PF_STATIC_READ_HACK") == "1":
                    ck = ckr[0, bb]
                    cv = cvr[0, bb]
                else:
                    ck = ckr[cslot, bb]                  # (Hg, dh, Sp)
                    cv = cvr[cslot, bb]                  # (Sp, Gd) head-flat
            else:
                ck = ck_ref[0, bb]                       # (Hg, dh, Sp)
                cv = cv_ref[0, bb]                       # (Sp, Gd) head-flat
            outs_h = []
            for hh in range(hg):
                # (An s8 x s8 form — q/p quantized per row, int8 K/V straight
                # to the MXU — measured ~0.6 ms SLOWER at int8 b=8 than these
                # head-sliced casts: the (dh, Sp)/(Sp, dh) cross slices cast
                # cheaply, unlike the big (S, SGd) self slabs.)
                s = jnp.dot(cq[rows_b, hh * dh:(hh + 1) * dh],
                            ck[hh].astype(x.dtype),
                            preferred_element_type=jnp.float32)
                if kv_quant:
                    # int8 cross K: per-(head, position) scales on the scores.
                    s = s * cks_ref[0, bb, 0, hh:hh + 1, :]
                s = s + cross_bias
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                pb = e / jnp.sum(e, axis=-1, keepdims=True)
                if kv_quant:
                    # int8 cross V: dequant by scaling the probabilities —
                    # (T, Sp) elements instead of (Sp, Dh); the int8 V tensor
                    # feeds the MXU directly.
                    pb = pb * cvs_ref[0, bb, 0, hh:hh + 1, :]
                # Head hh's values are the static 64-lane slice of the flat
                # block (same pattern as the self-attn slab above).
                oh = jnp.dot(pb.astype(x.dtype),
                             cv[:, hh * dh:(hh + 1) * dh].astype(x.dtype),
                             preferred_element_type=jnp.float32)
                outs_h.append(oh.astype(x.dtype))
            outs.append(jnp.concatenate(outs_h, axis=1))
        cross = jnp.concatenate(outs, axis=0)            # (B*T16, Gd)
        ow = cow_ref[0]                                  # (Gd, D)
        if quant and w8a8:
            c8, cs = quant_rows(cross)
            part = jax.lax.dot_general(
                c8, ow, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * cs
        else:
            if quant:
                ow = ow.astype(x.dtype)
            part = jnp.dot(cross, ow, preferred_element_type=jnp.float32)

        @pl.when(p == n_self)
        def _():
            acc[:] = part

        @pl.when(p > n_self)
        def _():
            acc[:] = acc[:] + part

        @pl.when(p == n_self + n_cross - 1)
        def _():
            tot = acc[:]
            if quant:
                # cross-o's per-output-column scale is group-invariant
                # (contraction over the group rows), so it applies once to
                # the accumulated sum (W8A8: each group's activation row
                # scales already rode its own partial).
                tot = tot * sp[sb + 5:sb + 6]
            xs[:] = x + (tot + sp[8:9]).astype(x.dtype)

    # ------------------------------------------- p_ns+nc..last_p: ffn chunk
    @pl.when((p >= n_self + n_cross) & ("ffn" not in _SKIP))
    def _():
        sp = sp_ref[0]
        x = xs[:]
        ln = _ln(x, sp[9:10], sp[10:11])
        c0 = n_self + n_cross
        # fc1 bias chunk lives in the packed rows [base + c*rpc, base +
        # (c+1)*rpc) (static slices selected by a scalar compare — the chunk
        # index p - c0 is a grid value, so the rows can't be sliced
        # dynamically).
        f2c = f1_ref.shape[2]
        f1b = sp[base:base + rpc].reshape(1, f2c)
        for c in range(1, n_chunks):
            alt = sp[base + c * rpc:base + (c + 1) * rpc].reshape(1, f2c)
            f1b = jnp.where(p == c0 + c, alt, f1b)
        f1w = f1_ref[0]
        f2w = f2_ref[0]
        if quant:
            # fc1's per-column scale chunk, selected like the bias chunk.
            s0 = sb + 7
            f1s = sp[s0:s0 + rpc].reshape(1, f2c)
            for c in range(1, n_chunks):
                alt = sp[s0 + c * rpc:s0 + (c + 1) * rpc].reshape(1, f2c)
                f1s = jnp.where(p == c0 + c, alt, f1s)
        if quant and w8a8:
            ln8, lns = quant_rows(ln)
            h = jax.lax.dot_general(
                ln8, f1w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            h = h * lns * f1s
        else:
            if quant:
                f1w = f1w.astype(x.dtype)
            h = jnp.dot(ln, f1w, preferred_element_type=jnp.float32)
            if quant:
                h = h * f1s
        h = _gelu_f32(h + f1b).astype(x.dtype)
        # fc2's output scale is chunk-invariant (contraction over F), so the
        # partial sums accumulate unscaled and the scale applies at the end
        # (W8A8: each chunk's activation row scale applies to its own part).
        if quant and w8a8:
            h8, hs = quant_rows(h)
            part = jax.lax.dot_general(
                h8, f2w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * hs
        else:
            if quant:
                f2w = f2w.astype(x.dtype)
            part = jnp.dot(h, f2w, preferred_element_type=jnp.float32)

        def finish(tot):
            if quant:
                tot = tot * sp[sb + 6:sb + 7]
            return x + (tot + sp[11:12]).astype(x.dtype)

        if n_chunks == 1:
            xs[:] = finish(part)
        else:
            @pl.when(p == c0)
            def _():
                acc[:] = part

            @pl.when((p > c0) & (p < last_p))
            def _():
                acc[:] = acc[:] + part

            @pl.when(p == last_p)
            def _():
                xs[:] = finish(acc[:] + part)

    @pl.when((l == num_layers - 1) & (p == last_p))
    def _():
        if has_block:
            y2_ref[:] = xs[:]
        else:
            y_ref[:] = xs[:]
        if "self" not in _SKIP and "commit" not in _SKIP:
            # Drain the last layer's outstanding cache-commit DMAs (one k/v
            # pair per example — from the last self sub-phase — plus the
            # scale-slab copy in int8-self-KV mode).
            for bb in range(batch):
                stage = slice(bb * (t16 + 8), (bb + 1) * (t16 + 8))
                pltpu.make_async_copy(
                    nk_s.at[stage],
                    sko_ref.at[num_layers - 1, bb, pl.ds(0, t16 + 8),
                               pl.ds(0, sgd)],
                    sems.at[0, bb]).wait()
                pltpu.make_async_copy(
                    nv_s.at[stage],
                    svo_ref.at[num_layers - 1, bb, pl.ds(0, t16 + 8),
                               pl.ds(0, sgd)],
                    sems.at[1, bb]).wait()
                if skv_quant:
                    pltpu.make_async_copy(
                        ns_s.at[stage],
                        sso_ref.at[num_layers - 1, bb, pl.ds(0, t16 + 8), :],
                        sems.at[2, bb]).wait()


def fused_decoder_layers(
    dec_layers: Params,          # stacked decoder layer params (models/whisper.py)
    x: jnp.ndarray,              # (1, T, D) bf16 embedded inputs
    self_k: jnp.ndarray,         # (L, B, S, D) head-flat (KVCache layout —
                                 # a (.., H, dh) slab would cost a physical
                                 # tiled-layout copy per step at this boundary)
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,        # (L, B, H, dh, Sp) head-major
    cross_v: jnp.ndarray,        # (L, B, Sp, D) head-flat (KVCache layout)
    offset: jnp.ndarray,         # (B,) i32 committed length per example
    chunk_bias: jnp.ndarray,     # (T, T) f32 additive intra-chunk mask
    cross_len: int,
    num_heads: int,
    cross_k_s: jnp.ndarray = None,  # (L, B, H, Sp) f32 int8-cross scales
    cross_v_s: jnp.ndarray = None,
    self_s: jnp.ndarray = None,  # (L, B, S, SHp) bf16 int8-self-KV scales
                                 # (position-major; KVCache.self_s) — required
                                 # when the self slabs are int8
    ln_post: Params = None,      # medusa_block: final-layernorm params; marks
                                 # dec_layers' LAST stacked entry as the block
                                 # layer (extend_layers_with_block)
):
    """Run all decoder layers over a T-token chunk with the fused kernel.

    Returns (pre_norm (B, T, D), block_hidden (B, T, D) | None, new_self_k
    (L, B, S, D), new_self_v ..., new_self_s | None) where the returned slabs
    are the input caches updated in place (aliased buffers) with each
    example's chunk K/V rows at its ``offset``.  With ``ln_post`` set, the
    last stacked layer is the medusa-block extra layer: it consumes
    ln_post(pre_norm) and its output is returned as ``block_hidden``
    (reference: model.py:1349-1417).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nl, b, s_len, _d = self_k.shape
    h = num_heads
    dh = x.shape[-1] // num_heads
    d = x.shape[-1]
    t = x.shape[1]
    t16 = 8 if t <= 8 else 16
    # The aligned cache-commit DMA reads/writes a (t16 + 8)-row window at an
    # 8-aligned offset; init_cache over-allocates 16 slack rows so the window
    # stays in bounds for every legal offset (off + t <= s_len - 16).  Reject
    # slabs that cannot possibly satisfy that invariant instead of relying on
    # the in-kernel clamp (which degrades the commit to a no-op round-trip).
    if s_len < t16 + 16:
        raise ValueError(
            f"self-cache slab length {s_len} lacks the +16-row slack the "
            f"fused cache-commit DMA requires (need s_len >= {t16 + 16}); "
            "build caches with models/whisper.py::init_cache")
    quant = isinstance(dec_layers["self"]["q_w"], dict)
    wsel = (lambda w: w["q"]) if quant else (lambda w: w)
    f = wsel(dec_layers["fc1_w"]).shape[2]
    sp_len = cross_k.shape[-1]
    skv_quant = self_k.dtype == jnp.int8
    if skv_quant and self_s is None:
        raise ValueError("int8 self-cache slabs require the self_s scale slab")

    # Pack every per-layer small param (layernorms, biases, fc1 bias as F/D
    # rows) into one streamed (L, 12 + F/D, D) f32 block — one small DMA per
    # layer instead of a dozen sub-KB ones.  int8 mode appends the per-output-
    # channel dequant scales: 7 rows (self q/k/v/o, cross q/o, fc2) + fc1's
    # F/D rows.
    has_block = ln_post is not None
    blocks = [jnp.stack([
        dec_layers["self_ln"]["scale"], dec_layers["self_ln"]["bias"],
        dec_layers["self"]["q_b"], dec_layers["self"]["v_b"],
        dec_layers["self"]["o_b"],
        dec_layers["cross_ln"]["scale"], dec_layers["cross_ln"]["bias"],
        dec_layers["cross"]["q_b"], dec_layers["cross"]["o_b"],
        dec_layers["ffn_ln"]["scale"], dec_layers["ffn_ln"]["bias"],
        dec_layers["fc2_b"],
    ], axis=1)]
    if has_block:
        # ln_post rows ride every layer's packed block (identical copies; the
        # kernel reads them only at the block-layer transition).
        blocks.append(jnp.broadcast_to(
            jnp.stack([ln_post["scale"], ln_post["bias"]])[None],
            (nl, 2, d)))
    blocks.append(dec_layers["fc1_b"].reshape(nl, f // d, d))
    if quant:
        blocks.append(jnp.stack([
            dec_layers["self"]["q_w"]["s"], dec_layers["self"]["k_w"]["s"],
            dec_layers["self"]["v_w"]["s"], dec_layers["self"]["o_w"]["s"],
            dec_layers["cross"]["q_w"]["s"], dec_layers["cross"]["o_w"]["s"],
            dec_layers["fc2_w"]["s"],
        ], axis=1))                                      # (L, 7, D)
        blocks.append(dec_layers["fc1_w"]["s"].reshape(nl, f // d, d))
    sp = jnp.concatenate(blocks, axis=1).astype(jnp.float32)

    wbytes = 1 if quant else 2
    kvbytes = 1 if cross_k_s is not None else 2
    ns, nc, nch = _pick_phases(b, t16, d, h, dh, s_len, sp_len, f,
                               sp.shape[1], wbytes, kvbytes,
                               cross_k_s is not None, skv_quant)
    nsh = h // ns
    sgd = nsh * dh
    hg = h // nc
    gd = hg * dh
    f2 = f // nch

    x2 = x
    if t16 != t:
        x2 = jnp.pad(x2, ((0, 0), (0, t16 - t), (0, 0)))
    x2 = x2.reshape(b * t16, d)
    cb = jnp.pad(chunk_bias, ((0, t16 - t), (0, 128 - t)))
    # Padding rows/cols carry 0 bias: a padded query row attends causally via
    # garbage but its output is sliced off; padded KEY cols (j >= t) must be
    # masked for real rows:
    col = jax.lax.broadcasted_iota(jnp.int32, (t16, 128), 1)
    cb = jnp.where(col < t, cb, NEG_SELF)

    off2 = jnp.reshape(offset, (1, b)).astype(jnp.int32)

    grid = (nl, ns + nc + nch)
    L_ = nl

    # Self-phase inputs: group g's block is read at sub-phase p = g; the map
    # advances to the next group one phase ahead (Mosaic fetches step s+1's
    # block during step s), rolling to the next layer's group 0 as soon as
    # the last group's sub-phase has passed — that fetch then hides under
    # the cross and FFN phases.
    def self_l(l, p):
        return jnp.minimum(l + (p >= ns), L_ - 1)

    def self_g(l, p):
        return jnp.where(p >= ns, 0, jnp.minimum(p, ns - 1))

    # Cross-phase inputs: group g's block is read at phase p = ns + g, same
    # one-ahead advance pattern.
    def cross_l(l, p):
        return jnp.minimum(l + (p >= ns + nc), L_ - 1)

    def cross_g(l, p):
        return jnp.where(p >= ns + nc, 0, jnp.clip(p - ns, 0, nc - 1))

    kv_quant = cross_k_s is not None
    if kv_quant:
        # Group dim carried explicitly ((L, B, nc, Hg, Sp)) so the block's
        # last-two dims equal the array dims — Mosaic requires that when
        # Hg isn't a multiple of 8 (e.g. 20 heads / nc=2 -> Hg=10).
        cks = cross_k_s.reshape(nl, b, nc, hg, sp_len).astype(jnp.float32)
        cvs = cross_v_s.reshape(nl, b, nc, hg, sp_len).astype(jnp.float32)
        s_spec = pl.BlockSpec(
            (1, b, 1, hg, sp_len),
            lambda l, p: (cross_l(l, p), 0, cross_g(l, p), 0, 0))
    else:
        # Unread dummies (kv_quant=False skips them); one minimal f32 tile.
        cks = cvs = jnp.zeros((nl, 1, 1, 8, 128), jnp.float32)
        s_spec = pl.BlockSpec((1, 1, 1, 8, 128), lambda l, p: (0, 0, 0, 0, 0))
    if skv_quant:
        shp = self_s.shape[-1]
        ss_in = self_s
        ss_spec = pl.BlockSpec((1, b, s_len, shp),
                               lambda l, p: (self_l(l, p), 0, 0, 0))
        if _blkdiag():
            # Block-diagonal attention folds the scales into the f32
            # scores/probabilities — no expansion matrix to stream.
            se_in = jnp.zeros((1, 8, 128), jnp.bfloat16)
            se_spec = pl.BlockSpec((1, 8, 128), lambda l, p: (0, 0, 0))
        else:
            import numpy as _np

            # Per-group expansion blocks: group g's block maps scale lane
            # (global head) h to that head's LOCAL dh-lane range within the
            # group's K (cols [0, SGd)) or V (cols [SGd, 2*SGd)) slab slice.
            se_np = _np.zeros((ns, shp, 2 * sgd), _np.float32)
            for hh in range(h):
                g, lo = divmod(hh, nsh)
                se_np[g, hh, lo * dh:(lo + 1) * dh] = 1.0
                se_np[g, h + hh, sgd + lo * dh:sgd + (lo + 1) * dh] = 1.0
            se_in = jnp.asarray(se_np, jnp.bfloat16)
            se_spec = pl.BlockSpec((1, shp, 2 * sgd),
                                   lambda l, p: (self_g(l, p), 0, 0))
    else:
        shp = 128
        ss_in = jnp.zeros((nl, 1, 8, 128), jnp.bfloat16)
        ss_spec = pl.BlockSpec((1, 1, 8, 128), lambda l, p: (0, 0, 0, 0))
        se_in = jnp.zeros((1, 8, 128), jnp.bfloat16)
        se_spec = pl.BlockSpec((1, 8, 128), lambda l, p: (0, 0, 0))
    kern = functools.partial(
        _kernel, num_layers=nl, num_heads=num_heads, t16=t16, t_real=t,
        cross_len=cross_len, n_self=ns, n_cross=nc, n_chunks=nch,
        scale=dh ** -0.5, quant=quant, kv_quant=kv_quant,
        skv_quant=skv_quant, batch=b, has_block=has_block,
        w8a8=quant and _w8a8(), blkdiag=_blkdiag(),
        prefetch=_prefetch() and _blkdiag(),
        prefetch_cross=_prefetch_cross(), pf_slots=_pf_slots())
    sp_rows = sp.shape[1]

    y, y2, sk_new, sv_new, ss_new = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b * t16, d), lambda l, p: (0, 0)),
            pl.BlockSpec((1, b), lambda l, p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t16, 128), lambda l, p: (0, 0)),
            # sp is read in EVERY phase — its block index must stay on layer l
            # for the whole layer (a self_l-style prefetch advance would hand
            # later phases the next layer's layernorms/biases/scales; the
            # 14 KB fetch at the p0 boundary costs nothing).
            pl.BlockSpec((1, sp_rows, d), lambda l, p: (l, 0, 0)),
            pl.BlockSpec((1, d, sgd),                                   # q
                         lambda l, p: (self_l(l, p), 0, self_g(l, p))),
            pl.BlockSpec((1, d, sgd),                                   # k
                         lambda l, p: (self_l(l, p), 0, self_g(l, p))),
            pl.BlockSpec((1, d, sgd),                                   # v
                         lambda l, p: (self_l(l, p), 0, self_g(l, p))),
            pl.BlockSpec((1, sgd, d),                                   # o
                         lambda l, p: (self_l(l, p), self_g(l, p), 0)),
            pl.BlockSpec((1, d, gd),                                    # cq
                         lambda l, p: (cross_l(l, p), 0, cross_g(l, p))),
            pl.BlockSpec((1, gd, d),                                    # co
                         lambda l, p: (cross_l(l, p), cross_g(l, p), 0)),
            *([pl.BlockSpec(memory_space=pl.ANY)] * 3
              if (_prefetch() and _blkdiag()) else [
                  pl.BlockSpec((1, b, s_len, sgd),
                               lambda l, p: (self_l(l, p), 0, 0,
                                             self_g(l, p))),
                  pl.BlockSpec((1, b, s_len, sgd),
                               lambda l, p: (self_l(l, p), 0, 0,
                                             self_g(l, p))),
                  ss_spec]),
            se_spec,
            *([pl.BlockSpec(memory_space=pl.ANY)] * 2
              if _prefetch_cross() else [
                  pl.BlockSpec((1, b, hg, dh, sp_len),
                               lambda l, p: (cross_l(l, p), 0,
                                             cross_g(l, p), 0, 0)),
                  pl.BlockSpec((1, b, sp_len, gd),
                               lambda l, p: (cross_l(l, p), 0, 0,
                                             cross_g(l, p)))]),
            s_spec,
            s_spec,
            pl.BlockSpec((1, d, f2),
                         lambda l, p: (l, 0,
                                       jnp.clip(p - ns - nc, 0, nch - 1))),
            pl.BlockSpec((1, f2, d),
                         lambda l, p: (l, jnp.clip(p - ns - nc, 0, nch - 1),
                                       0)),
        ],
        out_specs=[
            pl.BlockSpec((b * t16, d), lambda l, p: (0, 0)),
            pl.BlockSpec((b * t16, d), lambda l, p: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * t16, d), x.dtype),
            jax.ShapeDtypeStruct((b * t16, d), x.dtype),
            jax.ShapeDtypeStruct((nl, b, s_len, d), self_k.dtype),
            jax.ShapeDtypeStruct((nl, b, s_len, d), self_v.dtype),
            jax.ShapeDtypeStruct(ss_in.shape, ss_in.dtype),
        ],
        # The self-cache slabs (and the int8-mode scale slab) are read as
        # pipelined VMEM blocks (args 10/11/12) and updated in place through
        # the aliased HBM outputs.
        input_output_aliases={10: 2, 11: 3, 12: 4},
        scratch_shapes=[
            pltpu.VMEM((b * t16, d), x.dtype),
            pltpu.VMEM((b * t16, d), jnp.float32),
            pltpu.VMEM((b * t16, d), x.dtype),
            pltpu.VMEM((b * (t16 + 8), sgd), self_k.dtype),
            pltpu.VMEM((b * (t16 + 8), sgd), self_v.dtype),
            pltpu.VMEM((b * (t16 + 8), shp), jnp.bfloat16),
            pltpu.VMEM((b * t16, shp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((3, b)),
            # Prefetch slab rings (dummies when the flag is off).
            pltpu.VMEM((2, ns, b, s_len, sgd) if (_prefetch() and _blkdiag())
                       else (1, 1, 1, 8, 128), self_k.dtype),
            pltpu.VMEM((2, ns, b, s_len, sgd) if (_prefetch() and _blkdiag())
                       else (1, 1, 1, 8, 128), self_v.dtype),
            pltpu.VMEM((2, b, s_len, shp)
                       if (_prefetch() and _blkdiag() and skv_quant)
                       else (1, 1, 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((3, 2, ns)),
            # Cross-K/V prefetch rings (dummies when the flag is off).
            pltpu.VMEM((_pf_slots(), b, hg, dh, sp_len) if _prefetch_cross()
                       else (1, 1, 1, 8, 128), cross_k.dtype),
            pltpu.VMEM((_pf_slots(), b, sp_len, gd) if _prefetch_cross()
                       else (1, 1, 8, 128), cross_v.dtype),
            pltpu.SemaphoreType.DMA((2, _pf_slots())),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "WM_MEGASTEP_VMEM_MB", "128")) * 1024 * 1024),
        interpret=_INTERPRET,
    )(
        x2, off2, cb, sp,
        wsel(dec_layers["self"]["q_w"]), wsel(dec_layers["self"]["k_w"]),
        wsel(dec_layers["self"]["v_w"]), wsel(dec_layers["self"]["o_w"]),
        wsel(dec_layers["cross"]["q_w"]), wsel(dec_layers["cross"]["o_w"]),
        self_k, self_v, ss_in, se_in,
        cross_k.reshape(nl, b, h, dh, sp_len),
        cross_v.reshape(nl, b, sp_len, d),
        cks, cvs,
        wsel(dec_layers["fc1_w"]),
        wsel(dec_layers["fc2_w"]),
    )
    pre_norm = y.reshape(b, t16, d)[:, :t]
    block_hidden = y2.reshape(b, t16, d)[:, :t] if has_block else None
    return pre_norm, block_hidden, sk_new, sv_new, \
        (ss_new if skv_quant else None)
