"""Medusa training losses — per-head shifted CE and KL distillation.

Reference semantics (whisper_medusa/utils/losses.py):
  * ``MedusaCrossEntropyLoss`` (losses.py:5-65): stacked logits
    ``(num_heads, B, T, V)``; head at stack index *i* is trained against labels
    shifted by ``shift_idx + i`` where ``shift_idx = 0`` when the base head is
    included (``loss_on_original``) else 1 (the base head is excluded from the
    stack in that case).  Heads whose shift exceeds the sequence length produce
    no loss (the reference breaks out of the loop on NaN, losses.py:60-63 — here
    they are masked out with a validity flag instead).
  * ``MedusaKLDivLoss`` (losses.py:68-108): per-head batchmean KL of head
    log-softmax vs softmax of the (detached) teacher logits at the shifted
    positions, scaled by ``lamda``.  Note the reference does *not* mask label
    padding in the KL term; replicated faithfully.

Label convention: ``labels`` uses -100 for positions excluded from CE
(reference: dataset.py:122-131 collator).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


class MedusaLosses(NamedTuple):
    per_head_ce: jnp.ndarray      # (H',) float32 — NaN-free, masked by valid
    valid: jnp.ndarray            # (H',) bool — head had >=1 supervised position
    per_head_kl: Optional[jnp.ndarray]  # (H',) or None
    total: jnp.ndarray            # () mean over valid heads (CE) + KL sum


def _shifted_ce(logits: jnp.ndarray, labels: jnp.ndarray, shift: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CE of ``logits[:, t]`` against ``labels[:, t + shift]``.

    Returns (loss, valid).  Ignores -100 labels; valid=False when no supervised
    positions exist (the reference's NaN-break case).
    """
    b, t, v = logits.shape
    if shift >= t:
        return jnp.float32(0.0), jnp.asarray(False)
    lg = logits[:, : t - shift] if shift else logits
    lb = labels[:, shift:]
    mask = lb != IGNORE_INDEX
    lb_safe = jnp.where(mask, lb, 0)
    logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, lb_safe[..., None], axis=-1)[..., 0]
    denom = jnp.sum(mask)
    loss = jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(denom, 1)
    return loss, denom > 0


def medusa_cross_entropy(
    stack_logits: jnp.ndarray,   # (H', B, T, V)
    labels: jnp.ndarray,         # (B, T)
    loss_on_original: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-head shifted CE.  ``stack_logits`` must already exclude the base head
    when ``loss_on_original=False`` (mirroring the reference call sites,
    model.py:1320-1328)."""
    shift0 = 0 if loss_on_original else 1
    losses, valids = [], []
    for i in range(stack_logits.shape[0]):
        l, v = _shifted_ce(stack_logits[i], labels, shift0 + i)
        losses.append(l)
        valids.append(v)
    return jnp.stack(losses), jnp.stack(valids)


def medusa_kl(
    stack_logits: jnp.ndarray,   # (H', B, T, V)
    teacher_logits: jnp.ndarray,  # (B, T, V) — caller detaches (lax.stop_gradient)
    lamda: float,
    loss_on_original: bool,
) -> jnp.ndarray:
    """Per-head KL(teacher || head) with torch 'batchmean' reduction (sum / B)."""
    shift0 = 0 if loss_on_original else 1
    teacher = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    out = []
    b, t, v = teacher.shape
    for i in range(stack_logits.shape[0]):
        shift = shift0 + i
        if shift >= t:
            out.append(jnp.float32(0.0))
            continue
        lg = stack_logits[i][:, : t - shift] if shift else stack_logits[i]
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        tp = teacher[:, shift:]
        kl = jnp.sum(tp * (jnp.log(jnp.maximum(tp, 1e-30)) - logp))
        out.append(kl / b * lamda)
    return jnp.stack(out)
