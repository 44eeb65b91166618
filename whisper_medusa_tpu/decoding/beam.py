"""Beam search for the Whisper decoder — beyond the reference (which raises
``NotImplementedError`` for ``num_beams > 1``, reference model.py:1153-1156).

Standard alive/finished-set formulation (t5x-style), fully on device in one
``lax.while_loop`` with static shapes:

  * The beam axis is folded into the batch axis for the decoder/KV-cache
    (``B*K`` rows); beams advance one token per step, so the cache offset is a
    single shared scalar per step.
  * Each step: top-2K continuations of the alive beams; those ending in EOS are
    offered to the finished set (scored with GNMT length penalty
    ``((5+len)/6)**length_penalty``); the best K non-EOS continuations become the
    next alive set.  Alive tokens and the KV cache are reordered by parent-beam
    gather.
  * Early stopping (HF ``early_stopping=True`` semantics): stop once the finished
    set cannot be improved — the best possible alive continuation score is below
    the worst kept finished score.

Greedy/medusa decoding stays in :mod:`whisper_medusa_tpu.decoding.speculative`;
beams and speculation are not combined.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from whisper_medusa_tpu.config import GenerationConfig, WhisperDims
from whisper_medusa_tpu.decoding.processors import (ProcessorConfig,
                                                    apply_processors,
                                                    apply_timestamp_rules)
from whisper_medusa_tpu.models import whisper

Params = Dict[str, Any]

NEG = jnp.float32(-1e9)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BeamState:
    alive_tokens: jnp.ndarray   # (B, K, L)
    alive_lp: jnp.ndarray       # (B, K) cumulative logprob
    fin_tokens: jnp.ndarray     # (B, K, L)
    fin_scores: jnp.ndarray     # (B, K) length-normalized
    fin_lengths: jnp.ndarray    # (B, K)
    cache: whisper.KVCache      # beam-flattened (rows = B*K)
    cur_len: jnp.ndarray        # () int32 — shared across beams
    steps: jnp.ndarray          # ()
    max_ts: jnp.ndarray         # (B, K) running max timestamp token (0 = none)


class BeamResult(NamedTuple):
    tokens: jnp.ndarray         # (B, max_length) best hypothesis
    lengths: jnp.ndarray        # (B,)
    scores: jnp.ndarray         # (B,) length-normalized logprob
    steps: jnp.ndarray
    # n-best: the full kept finished set, best-first
    nbest_tokens: jnp.ndarray = None   # (B, K, max_length)
    nbest_scores: jnp.ndarray = None   # (B, K)
    nbest_lengths: jnp.ndarray = None  # (B, K)


def _length_norm(length, length_penalty: float):
    return jnp.power((5.0 + length.astype(jnp.float32)) / 6.0, length_penalty)


def beam_search(
    params: Params,
    dims: WhisperDims,
    pcfg: ProcessorConfig,
    gen: GenerationConfig,
    enc_out: jnp.ndarray,       # (B, S, D)
    prompt: jnp.ndarray,        # (B, T0)
    num_beams: int = 5,
    length_penalty: float = 1.0,
) -> BeamResult:
    b, t0 = prompt.shape
    k = num_beams
    bk = b * k
    eos = gen.eos_token_id
    pad = gen.pad_token_id
    max_length = gen.max_length
    buf = max_length + 1

    # Cross K/V are beam-invariant: computed and stored once per example (B rows)
    # while the self cache is per-beam (B*K rows) — K-fold cross-cache HBM saving
    # (VERDICT r1 #10; was jnp.repeat over beams).
    cache = whisper.init_cache(params, dims, enc_out, max_length + 1,
                               self_batch=bk)
    prompt_rep = jnp.repeat(prompt, k, axis=0)                   # (BK, T0)
    out, cache = whisper.decode_step(
        params, dims, prompt_rep, cache, jnp.zeros((bk,), jnp.int32),
        cross_beam=k)
    use_ts = pcfg.timestamp_rules

    def ts_val(tok):
        return jnp.where(tok >= pcfg.timestamp_begin, tok, 0)

    logits0 = whisper.project_logits(params, out.hidden[:, -1])  # (BK, V)
    proc0 = apply_processors(logits0, jnp.full((bk,), t0, jnp.int32), pcfg)
    if use_ts:
        proc0 = apply_timestamp_rules(
            proc0, jnp.full((bk,), t0, jnp.int32),
            prompt_rep[:, -1], prompt_rep[:, -2] if t0 >= 2 else prompt_rep[:, -1],
            jnp.zeros((bk,), jnp.int32), pcfg)
    lp0 = jax.nn.log_softmax(proc0, axis=-1)

    alive_tokens = jnp.full((b, k, buf), pad, jnp.int32)
    alive_tokens = alive_tokens.at[:, :, :t0].set(prompt[:, None, :])
    # Only beam 0 is live initially (identical prompts would duplicate beams).
    alive_lp = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG).astype(jnp.float32)
    alive_lp = jnp.broadcast_to(alive_lp, (b, k))

    state = BeamState(
        alive_tokens=alive_tokens,
        alive_lp=alive_lp,
        fin_tokens=jnp.full((b, k, buf), pad, jnp.int32),
        fin_scores=jnp.full((b, k), NEG, jnp.float32),
        fin_lengths=jnp.zeros((b, k), jnp.int32),
        cache=cache,
        cur_len=jnp.int32(t0),
        steps=jnp.int32(0),
        max_ts=jnp.zeros((b, k), jnp.int32),
    )
    first_lp = lp0.reshape(b, k, -1)

    def expand(s: BeamState, step_lp):
        """One beam expansion given per-beam next-token logprobs (B, K, V)."""
        v = step_lp.shape[-1]
        total = s.alive_lp[:, :, None] + step_lp                 # (B, K, V)
        flat = total.reshape(b, k * v)
        top_lp, top_idx = lax.top_k(flat, 2 * k)                 # (B, 2K)
        parent = top_idx // v
        token = top_idx % v

        new_len = s.cur_len + 1
        is_eos = token == eos

        # Offer EOS continuations to the finished set.
        cand_score = top_lp / _length_norm(new_len, length_penalty)
        cand_score = jnp.where(is_eos, cand_score, NEG)
        # Build candidate finished sequences: parent tokens + EOS at cur_len.
        par_tokens = jnp.take_along_axis(
            s.alive_tokens, parent[:, :, None], axis=1)          # (B, 2K, L)
        cand_tokens = jax.vmap(
            lambda t, tok, L: t.at[:, L].set(tok))(par_tokens, token,
            jnp.broadcast_to(s.cur_len, (b,)))
        all_scores = jnp.concatenate([s.fin_scores, cand_score], axis=1)   # (B, 3K)
        all_tokens = jnp.concatenate([s.fin_tokens, cand_tokens], axis=1)
        all_lengths = jnp.concatenate(
            [s.fin_lengths, jnp.broadcast_to(new_len, (b, 2 * k))], axis=1)
        keep_s, keep_i = lax.top_k(all_scores, k)
        fin_tokens = jnp.take_along_axis(all_tokens, keep_i[:, :, None], axis=1)
        fin_lengths = jnp.take_along_axis(all_lengths, keep_i, axis=1)
        fin_scores = keep_s

        # Best K non-EOS continuations stay alive.
        alive_cand_lp = jnp.where(is_eos, NEG, top_lp)
        a_lp, a_i = lax.top_k(alive_cand_lp, k)                  # (B, K)
        a_parent = jnp.take_along_axis(parent, a_i, axis=1)
        a_token = jnp.take_along_axis(token, a_i, axis=1)
        a_tokens = jnp.take_along_axis(
            s.alive_tokens, a_parent[:, :, None], axis=1)
        a_tokens = jax.vmap(
            lambda t, tok, L: t.at[:, L].set(tok))(a_tokens, a_token,
            jnp.broadcast_to(s.cur_len, (b,)))

        # Reorder the beam-flattened cache by parent beam.
        flat_parent = (jnp.arange(b)[:, None] * k + a_parent).reshape(-1)  # (BK,)

        def reorder(buf_arr):  # (L, BK, S, D) head-flat slabs
            return jnp.take(buf_arr, flat_parent, axis=1)

        cache = dataclasses.replace(
            s.cache,
            self_k=reorder(s.cache.self_k),
            self_v=reorder(s.cache.self_v),
            self_s=(reorder(s.cache.self_s)
                    if s.cache.self_s is not None else None))
        max_ts = jnp.maximum(
            jnp.take_along_axis(s.max_ts, a_parent, axis=1), ts_val(a_token))
        return dataclasses.replace(
            s, alive_tokens=a_tokens, alive_lp=a_lp, fin_tokens=fin_tokens,
            fin_scores=fin_scores, fin_lengths=fin_lengths, cache=cache,
            cur_len=new_len, steps=s.steps + 1, max_ts=max_ts), a_token

    # First expansion uses the prefill logprobs.
    state, last_token = expand(state, first_lp)

    def cond(carry):
        s, _ = carry
        # Best achievable alive score (optimistic: current lp, max normalization).
        best_alive = jnp.max(
            s.alive_lp / _length_norm(jnp.int32(max_length), length_penalty),
            axis=1)
        worst_fin = jnp.min(s.fin_scores, axis=1)
        improvable = best_alive > worst_fin
        return (s.cur_len < max_length) & jnp.any(improvable)

    def body(carry):
        s, last = carry
        offsets = jnp.broadcast_to(s.cur_len - 1, (bk,)).astype(jnp.int32)
        out, cache = whisper.decode_step(
            params, dims, last.reshape(bk, 1), s.cache, offsets, cross_beam=k)
        s = dataclasses.replace(s, cache=cache)
        logits = whisper.project_logits(params, out.hidden[:, -1])
        proc = apply_processors(
            logits, jnp.broadcast_to(s.cur_len, (bk,)), pcfg)
        if use_ts:
            # Per-beam history straight from the alive token buffers.
            li = jnp.broadcast_to(s.cur_len - 1, (b, k, 1))
            pi = jnp.broadcast_to(jnp.maximum(s.cur_len - 2, 0), (b, k, 1))
            last_t = jnp.take_along_axis(s.alive_tokens, li, axis=2)[:, :, 0]
            pen_t = jnp.take_along_axis(s.alive_tokens, pi, axis=2)[:, :, 0]
            proc = apply_timestamp_rules(
                proc, jnp.broadcast_to(s.cur_len, (bk,)),
                last_t.reshape(bk), pen_t.reshape(bk),
                s.max_ts.reshape(bk), pcfg)
        lp = jax.nn.log_softmax(proc, axis=-1)
        return expand(s, lp.reshape(b, k, -1))

    state, _ = lax.while_loop(cond, body, (state, last_token))

    # Fall back to the best alive hypothesis if nothing finished.
    none_fin = state.fin_scores[:, 0] <= NEG / 2
    alive_best = state.alive_tokens[:, 0]
    alive_best = jax.vmap(lambda t, L: t.at[L].set(eos))(
        alive_best, jnp.broadcast_to(state.cur_len, (b,)))
    best_tokens = jnp.where(none_fin[:, None], alive_best,
                            state.fin_tokens[:, 0])
    best_len = jnp.where(none_fin, state.cur_len + 1, state.fin_lengths[:, 0])
    best_score = jnp.where(
        none_fin,
        state.alive_lp[:, 0] / _length_norm(state.cur_len, length_penalty),
        state.fin_scores[:, 0])

    pos = jnp.arange(buf)[None, :]
    best_tokens = jnp.where(pos < best_len[:, None], best_tokens, pad)
    nb_tokens = jnp.where(pos[None] < state.fin_lengths[:, :, None],
                          state.fin_tokens, pad)
    return BeamResult(tokens=best_tokens[:, :max_length],
                      lengths=jnp.minimum(best_len, max_length),
                      scores=best_score, steps=state.steps,
                      nbest_tokens=nb_tokens[:, :, :max_length],
                      nbest_scores=state.fin_scores,
                      nbest_lengths=jnp.minimum(state.fin_lengths, max_length))
