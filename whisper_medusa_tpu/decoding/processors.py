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

Timestamp and no-speech processors raise ``NotImplementedError`` in the reference
(model.py:1171-1205) and are likewise not part of the live set here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

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
    # If >= 0, force this token at every position >= begin_index - 1?  Not used;
    # placeholder for future forced-token support.

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

    return logits
