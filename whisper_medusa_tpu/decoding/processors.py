"""Logits processors as pure, position-aware JAX functions.

The reference uses stock HF processors applied uniformly with the *current* prefix
length, including across all tree-verification positions
(reference: whisper_medusa/models/model.py:653-665, 690-694 and 1177-1199).
Here each processor is a pure function of ``(logits, pred_pos)`` where ``pred_pos`` is
the absolute index of the token being predicted, so speculative verification applies
exactly the per-position rules a vanilla step-by-step loop would — which is what makes
greedy Medusa decoding token-identical to greedy vanilla decoding (SURVEY §4 golden
test).  This is deliberately *more* position-accurate than the reference's uniform
application (documented deviation; it only differs when a position-dependent processor
fires mid-chain).

Implemented processors (the reference's live set):
  * suppress-tokens (HF ``SuppressTokensLogitsProcessor``)
  * begin-suppress-tokens (HF ``SuppressTokensAtBeginLogitsProcessor``)
  * exponential-decay length penalty (HF ``ExponentialDecayLengthPenalty``;
    part of the reference's public API, README.md:116-117, eval_whisper_medusa.py:53-65)

Additionally :func:`apply_timestamp_rules` implements the full Whisper timestamp
grammar — functional here, whereas the reference raises ``NotImplementedError`` and
ships its timestamp processors as dead code (model.py:1171-1205,
medusa_utils.py:21-302).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-float("inf"))


@dataclasses.dataclass(frozen=True)
class ProcessorConfig:
    """Static processor configuration, closed over by jitted decode loops."""

    vocab_size: int
    suppress_tokens: Optional[Tuple[int, ...]] = None
    begin_suppress_tokens: Optional[Tuple[int, ...]] = None
    begin_index: int = 0
    # (start, factor) with start measured in *generated* tokens, converted by the
    # caller to an absolute position: regulation_start + prompt_len (HF semantics).
    exponential_decay_length_penalty: Optional[Tuple[int, float]] = None
    eos_token_id: int = 0
    # Timestamp rules (working implementation of what the reference ships only as
    # dead code + NotImplementedError, medusa_utils.py:21-302, model.py:1171-1175).
    timestamp_rules: bool = False
    timestamp_begin: int = 50364          # <|0.00|>
    no_timestamps_id: int = 50363
    max_initial_timestamp_index: Optional[int] = 50  # == 1.0s default in whisper
    # User extension point (the reference's ``logits_processor`` kwarg, in
    # TPU-native form): a PURE jax function ``(logits (..., V) f32,
    # pred_pos (...,) i32) -> logits`` compiled into the decode loop and
    # applied AFTER the built-ins at every scored position (draft heads,
    # verification rows, beams, the scoring pass).  Host callbacks are
    # impossible inside the on-device while_loop; purity is the contract.
    # Routes verification off the fused kernel (speculative.py gate).
    custom: Optional[Callable] = None

    def suppress_mask(self) -> Optional[np.ndarray]:
        if not self.suppress_tokens:
            return None
        m = np.zeros((self.vocab_size,), np.bool_)
        m[list(self.suppress_tokens)] = True
        return m

    def begin_suppress_mask(self) -> Optional[np.ndarray]:
        if not self.begin_suppress_tokens:
            return None
        m = np.zeros((self.vocab_size,), np.bool_)
        m[list(self.begin_suppress_tokens)] = True
        return m


def apply_processors(
    logits: jnp.ndarray,     # (..., V) float32
    pred_pos: jnp.ndarray,   # (...,) int32 — absolute index of the predicted token
    cfg: ProcessorConfig,
) -> jnp.ndarray:
    """Apply the processor pipeline at the given positions.

    ``pred_pos`` equals HF's ``input_ids.shape[1]`` at the moment the prediction for
    that position is made.
    """
    v = logits.shape[-1]
    assert v == cfg.vocab_size, (v, cfg.vocab_size)
    logits = logits.astype(jnp.float32)

    sup = cfg.suppress_mask()
    if sup is not None:
        logits = jnp.where(jnp.asarray(sup), NEG_INF, logits)

    bsup = cfg.begin_suppress_mask()
    if bsup is not None:
        at_begin = (pred_pos == cfg.begin_index)[..., None]
        logits = jnp.where(jnp.asarray(bsup) & at_begin, NEG_INF, logits)

    if cfg.exponential_decay_length_penalty is not None:
        start, factor = cfg.exponential_decay_length_penalty
        # HF: for cur_len > regulation_start, eos_logit += |eos_logit| * (factor^idx - 1)
        idx = jnp.maximum(pred_pos - start, 0).astype(jnp.float32)
        active = (pred_pos > start)
        eos = logits[..., cfg.eos_token_id]
        penalty = jnp.abs(eos) * (jnp.power(jnp.float32(factor), idx) - 1.0)
        new_eos = jnp.where(active, eos + penalty, eos)
        logits = logits.at[..., cfg.eos_token_id].set(new_eos)

    if cfg.custom is not None:
        logits = cfg.custom(logits, pred_pos).astype(jnp.float32)

    return logits


def apply_timestamp_rules(
    logits: jnp.ndarray,      # (..., V) float32 (already base-processed)
    pred_pos: jnp.ndarray,    # (...,) absolute index of the predicted token
    last_tok: jnp.ndarray,    # (...,) token immediately preceding the prediction
    penult_tok: jnp.ndarray,  # (...,) token two back
    max_ts: jnp.ndarray,      # (...,) highest timestamp token emitted so far (or 0)
    cfg: ProcessorConfig,
) -> jnp.ndarray:
    """Whisper timestamp decoding rules, fully vectorized.

    Semantics follow OpenAI/HF ``WhisperTimeStampLogitsProcessor``:
      * ``<|notimestamps|>`` is always suppressed;
      * timestamps come in pairs: after a single timestamp the next token must not
        be a timestamp->text transition violation — i.e. if the last token is a
        timestamp and the one before is not, only text/EOS may NOT follow (a second
        timestamp or EOS is required); if both are timestamps, a timestamp cannot
        follow;
      * timestamps are non-decreasing: tokens in [timestamp_begin, max_ts(+1)) are
        suppressed;
      * at the first generated position only timestamps up to
        ``max_initial_timestamp_index`` are allowed;
      * if the total probability of all timestamp tokens exceeds the most likely
        text token, a timestamp is forced.

    History (last/penult/max_ts) is supplied per position so the speculative
    verification pass can evaluate the rules mid-chain exactly as a step-by-step
    loop would — preserving the medusa==vanilla token-parity invariant.
    """
    v = logits.shape[-1]
    ts_begin = cfg.timestamp_begin
    vocab_ids = jnp.arange(v)
    is_ts_region = vocab_ids >= ts_begin

    logits = logits.at[..., cfg.no_timestamps_id].set(NEG_INF)

    gen_len = pred_pos - cfg.begin_index       # sampled tokens so far
    last_is_ts = (last_tok >= ts_begin) & (gen_len >= 1)
    penult_is_ts = (gen_len < 2) | (penult_tok >= ts_begin)

    # Pairing rules.
    suppress_ts = last_is_ts & penult_is_ts           # must emit text next
    suppress_text = last_is_ts & ~penult_is_ts        # must emit timestamp/EOS
    text_mask = (vocab_ids < cfg.eos_token_id)
    logits = jnp.where(
        (suppress_ts[..., None] & is_ts_region)
        | (suppress_text[..., None] & text_mask),
        NEG_INF, logits)

    # Monotonicity: suppress timestamps strictly below the running max (and below
    # max+1 when the last emitted token closed a pair).
    floor = jnp.where(last_is_ts & ~penult_is_ts, max_ts, max_ts + 1)
    floor = jnp.where(max_ts > 0, floor, ts_begin)    # no timestamps yet -> free
    mono = is_ts_region & (vocab_ids < floor[..., None])
    logits = jnp.where(mono, NEG_INF, logits)

    # Initial-timestamp cap at the first generated position.
    if cfg.max_initial_timestamp_index is not None:
        cap = ts_begin + cfg.max_initial_timestamp_index
        at_begin = (pred_pos == cfg.begin_index)[..., None]
        logits = jnp.where(at_begin & (vocab_ids > cap), NEG_INF, logits)

    # Sum-probability rule: force a timestamp when the timestamp mass dominates.
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts_region, logprobs, NEG_INF), axis=-1)
    max_text = jnp.max(jnp.where(is_ts_region, NEG_INF, logprobs), axis=-1)
    force_ts = ts_logprob > max_text
    logits = jnp.where(force_ts[..., None] & ~is_ts_region, NEG_INF, logits)
    return logits
