"""Opt-in full per-position score stacks, recomputed post-hoc.

The reference hauls every verification step's logits tuples out of its generate
loop and reassembles them host-side into ``output_scores``
(reference: whisper_medusa/models/model.py:317-377 ``_update_medusa_outputs``;
scores plumbing model.py:716-758).  Doing that on TPU would stream
(B, nodes, V~51k) float32 stacks out of every ``lax.while_loop`` iteration —
a host-transfer-bound design.

Here the decode loop stays lean (it captures only the committed tokens'
processed logprobs, ``speculative.py``) and ``return_scores="full"`` is served
by ONE post-hoc teacher-forced decoder pass over the final sequences.  Every
logits processor in this repo is a pure function of
``(logits, pred_pos, history)`` (decoding/processors.py), and the history at
position ``p`` is fully determined by the committed tokens ``< p`` — so the
recomputed rows are the rows the serving loop scored, not an approximation.
``tests/test_scores_words.py`` pins the gathered values against the in-loop
capture.

Memory: the (B, T_gen, V) float32 stack is materialized on the HOST, built
from bounded device-side chunks (``chunk`` positions x V at a time); the full
stack never lives in HBM.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import whisper
from ..models.whisper import Params, WhisperDims
from .processors import (ProcessorConfig, apply_processors,
                         apply_timestamp_rules)


def _timestamp_history(tokens: np.ndarray, begin_index: int,
                       ts_begin: int) -> tuple:
    """Per-position (last, penult, max_ts) history, derived from the committed
    sequence — the same values the loop tracked incrementally.

    For the prediction at absolute position ``p``: ``last = tokens[p-1]``,
    ``penult = tokens[p-2]`` and ``max_ts`` is the highest timestamp token among
    the *generated* tokens strictly before ``p`` (0 when none yet), matching the
    loop's running-max carry (speculative.py ``SpecState.max_ts``).
    """
    b, t = tokens.shape
    last = tokens[:, :-1]                                   # predicts pos 1..t-1
    penult = np.concatenate(
        [np.zeros((b, 1), tokens.dtype), tokens[:, :-2]], axis=1)
    gen = np.where(np.arange(t - 1)[None, :] >= begin_index, tokens[:, :-1], 0)
    ts_val = np.where(gen >= ts_begin, gen, 0)
    max_ts = np.maximum.accumulate(ts_val, axis=1)
    # max_ts for predicting position p covers generated tokens < p, i.e. the
    # cummax *through* index p-1 of the shifted array — which is exactly
    # ``max_ts`` above at column p-1.
    return last, penult, max_ts


def full_scores(
    params: Params,
    dims: WhisperDims,
    tokens: np.ndarray,            # (B, L) committed sequences (prompt + generated)
    lengths: np.ndarray,           # (B,) committed lengths
    enc_out: jnp.ndarray,          # (B, S, D)
    pcfg: ProcessorConfig,
    max_length: int,
    chunk: int = 64,
) -> np.ndarray:
    """Full processed score stack: (B, max_length - prompt_len, V) float32.

    Row ``i`` is the processed logits that predicted generated token ``i``
    (absolute position ``begin_index + i``), as log-probabilities — gathering at
    the committed tokens reproduces ``GenerateOutput.token_logprobs``.  Rows at
    or beyond each example's committed length are 0.

    Verification rows always come from the BASE backbone hidden state — in the
    medusa_block variant the extra layer feeds only the draft heads
    (speculative.py ``verify_hidden(hidden, hsrc, ...)``), so no block replay
    is needed here.
    """
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    b, lbuf = tokens.shape
    begin = pcfg.begin_index
    t_gen = max_length - begin
    v = dims.vocab_size

    dec_in = jnp.asarray(tokens[:, :max_length], jnp.int32)
    wp = params

    hidden = jax.jit(
        lambda p, t, e: whisper.decode_train(p, dims, t, e).hidden
    )(wp, dec_in, enc_out)                                   # (B, T, D)

    last_np, penult_np, maxts_np = _timestamp_history(
        tokens[:, :max_length], begin, pcfg.timestamp_begin)

    @jax.jit
    def score_chunk(h_slice, pred_pos, last, penult, max_ts):
        logits = whisper.project_logits(wp, h_slice)         # (B, C, V) f32
        proc = apply_processors(logits, pred_pos, pcfg)
        if pcfg.timestamp_rules:
            proc = apply_timestamp_rules(proc, pred_pos, last, penult,
                                         max_ts, pcfg)
        return jax.nn.log_softmax(proc, axis=-1)

    out = np.zeros((b, t_gen, v), np.float32)
    for c0 in range(0, t_gen, chunk):
        c1 = min(c0 + chunk, t_gen)
        # Hidden at absolute position p-1 predicts position p.
        h_slice = jax.lax.dynamic_slice_in_dim(
            hidden, begin + c0 - 1, c1 - c0, axis=1)
        pred_pos = jnp.arange(begin + c0, begin + c1, dtype=jnp.int32)[None, :]
        cols = slice(begin + c0 - 1, begin + c1 - 1)
        rows = score_chunk(
            h_slice, jnp.broadcast_to(pred_pos, (b, c1 - c0)),
            jnp.asarray(last_np[:, cols]), jnp.asarray(penult_np[:, cols]),
            jnp.asarray(maxts_np[:, cols]))
        out[:, c0:c1] = np.asarray(rows)
    # Zero rows past each example's committed length (position begin+i is
    # committed iff begin+i < length).
    gen_idx = np.arange(t_gen)[None, :]
    out[(begin + gen_idx) >= lengths[:, None]] = 0.0
    return out
