"""Teacher-forced Medusa training: forward, freeze policies, train step.

Replaces the reference training path (reference: whisper_medusa/models/model.py:1223-
1347 forward-with-labels, model.py:133-177 freeze policies, utils/medusa_trainer_cls.py
``MedusaTrainer``) with a pure JAX loss function + optax, pjit-able over a device mesh.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from whisper_medusa_tpu.config import ModelConfig
from whisper_medusa_tpu.models import medusa as medusa_mod
from whisper_medusa_tpu.models import whisper
from whisper_medusa_tpu.training import losses as losses_mod

Params = Dict[str, Any]

FREEZE_POLICIES = ("whisper", "all_but_last")


def shift_tokens_right(labels: jnp.ndarray, pad_token_id: int,
                       decoder_start_token_id: int) -> jnp.ndarray:
    """labels -> decoder_input_ids (HF semantics used by reference medusa_forward,
    model.py:107-111): prepend start token, drop last, -100 -> pad."""
    shifted = jnp.concatenate(
        [jnp.full((labels.shape[0], 1), decoder_start_token_id, labels.dtype),
         labels[:, :-1]], axis=1)
    return jnp.where(shifted == losses_mod.IGNORE_INDEX, pad_token_id, shifted)


class TrainForwardOut(NamedTuple):
    loss: jnp.ndarray
    per_head_ce: jnp.ndarray
    per_head_kl: Optional[jnp.ndarray]
    valid_heads: jnp.ndarray


def medusa_train_forward(
    params: Params,               # {"whisper": ..., "medusa": ...}
    config: ModelConfig,
    input_features: jnp.ndarray,  # (B, n_mels, frames)
    labels: jnp.ndarray,          # (B, T) with -100 padding
    decoder_input_ids: Optional[jnp.ndarray] = None,
    freeze_policy: Optional[str] = None,
    remat: Any = True,
    decoder_remat: Any = None,
) -> TrainForwardOut:
    """Full teacher-forced forward with per-head losses.

    ``freeze_policy`` structurally prunes the backward pass to the trainable
    set (grads are bit-identical to full-backward-then-mask, which
    make_train_step still applies as a belt-and-braces):

      * ``"whisper"`` (the CLI default, reference model.py:163-166) — the
        whole backbone is frozen, so the decoder/encoder outputs are
        stop-gradiented and remat is skipped entirely: the step's backward is
        just the head matmuls + streamed loss.
      * ``"all_but_last"`` — encoder stop-gradiented; the decoder backward
        covers only the last layer (decode_train(grad_last_only=True)).
      * ``None`` — full fine-tune; ``remat`` selects the checkpoint policy
        for the backbone stacks (True/"full" or "dots", see
        whisper.py::_remat_wrap).

    Either way the tied-embedding projection weight is stop-gradiented when
    the lm head is frozen (reference _freeze_lm_head, model.py:152-154): the
    (V, D) weight-gradient matmul costs as much as the projection itself.

    Mirrors reference ``WhisperMedusaModel.forward`` with labels
    (model.py:1223-1347): per-head shifted CE over base+head logits, optional
    KL vs detached base logits or the frozen-teacher replay logits
    (``output_whisper_original``, model.py:2031-2076).  Unlike the reference
    (and this repo through round 3), the (H+1, B, T, V) logits stack is never
    materialized: losses stream through T-chunked vocab projections
    (losses.py::medusa_losses_streaming) — at whisper-large shapes the dense
    stack is ~4 GB of bf16 HBM traffic per step.
    """
    dims = config.dims
    med = config.medusa
    wp, mp = params["whisper"], params["medusa"]

    if decoder_input_ids is None:
        decoder_input_ids = shift_tokens_right(
            labels, pad_token_id=50257, decoder_start_token_id=50258)

    if freeze_policy is not None and freeze_policy not in FREEZE_POLICIES:
        raise ValueError(
            f"parts_to_freeze {freeze_policy!r} is not supported, select from "
            f"{list(FREEZE_POLICIES)}")
    frozen_bb = freeze_policy is not None
    enc_out = whisper.encode(wp, dims, input_features,
                             remat=False if frozen_bb else remat)
    if frozen_bb:
        enc_out = jax.lax.stop_gradient(enc_out)
    need_teacher = med.output_whisper_original
    if freeze_policy == "whisper":
        dec = whisper.decode_train(wp, dims, decoder_input_ids, enc_out,
                                   collect_penultimate=need_teacher,
                                   remat=False)
        dec = jax.tree.map(jax.lax.stop_gradient, dec)
    elif freeze_policy == "all_but_last":
        dec = whisper.decode_train(wp, dims, decoder_input_ids, enc_out,
                                   collect_penultimate=need_teacher,
                                   remat=False, grad_last_only=True)
    else:
        # The decoder's activations are T/S_enc ~ 7x smaller than the
        # encoder's; ``decoder_remat=False`` skips its recompute pass while
        # the encoder keeps full remat.  The split only fits at smaller
        # batch/chip counts — at B=8 on a 16 GB v5e it OOMs, so bench.py's
        # train leg runs full remat on both stacks.
        dec = whisper.decode_train(
            wp, dims, decoder_input_ids, enc_out,
            collect_penultimate=need_teacher,
            remat=remat if decoder_remat is None else decoder_remat)
    nh = dims.decoder_attention_heads
    # Frozen lm head: the projection reads the weights but never needs their
    # gradient (the mask would zero it; structurally skipping it removes a
    # full (V, D) weight-grad matmul per streamed chunk).
    wp_proj = jax.lax.stop_gradient(wp) if frozen_bb else wp

    # Per-head hidden rows (H+1, B, T, D) — base row 0, then draft heads.
    if med.medusa_heads_type == "base_head":
        head_stack = medusa_mod.apply_heads(mp, dec.hidden)
    else:
        enc_p, enc_kv = whisper.pad_enc_for_cross(enc_out)
        block_out = whisper.decoder_layer_full(mp["block"], dec.hidden,
                                               enc_p, nh, enc_kv_len=enc_kv)
        head_out = medusa_mod.apply_heads(mp, block_out)    # (H, B, T, D)
        head_stack = jnp.concatenate([dec.hidden[None], head_out], axis=0)

    # CE (reference model.py:1303-1331) + optional KL in one streamed pass.
    ce_rows = head_stack if med.medusa_loss_on_original else head_stack[1:]
    teacher_hidden = None
    if med.medusa_kl_loss:
        if need_teacher:
            # Frozen replay of the (possibly fine-tuned) last decoder layer's
            # *original* weights on the penultimate hidden state
            # (reference: model.py:2031-2076).
            enc_p, enc_kv = whisper.pad_enc_for_cross(enc_out)
            teacher_h = whisper.decoder_layer_full(
                mp["teacher_layer"], dec.penultimate, enc_p, nh,
                enc_kv_len=enc_kv)
            teacher_hidden = whisper.layer_norm(
                teacher_h, wp["decoder"]["ln_post"]["scale"],
                wp["decoder"]["ln_post"]["bias"])
        else:
            teacher_hidden = head_stack[0]
        teacher_hidden = jax.lax.stop_gradient(teacher_hidden)

    per_head_ce, valid, per_head_kl = losses_mod.medusa_losses_streaming(
        lambda h: whisper.project_logits(wp_proj, h),
        ce_rows, labels, med.medusa_loss_on_original,
        teacher_hidden=teacher_hidden, kl_lamda=med.medusa_kl_weight)

    loss = jnp.sum(jnp.where(valid, per_head_ce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
    if per_head_kl is not None:
        loss = loss + jnp.mean(per_head_kl)

    return TrainForwardOut(loss=loss, per_head_ce=per_head_ce,
                           per_head_kl=per_head_kl, valid_heads=valid)


# ---------------------------------------------------------------------------
# Freeze policies (reference: model.py:49-52, 133-177, 2015-2016)
# ---------------------------------------------------------------------------

def trainable_mask(params: Params, policy: Optional[str]) -> Params:
    """Multiplicative gradient mask implementing the reference freeze policies.

      * ``"whisper"``       — freeze the whole backbone; train heads (+block).
      * ``"all_but_last"``  — additionally train the *last* decoder layer
                              (expressed as a per-layer 0/1 vector on the stacked
                              layer axis — no per-layer module split needed).
      * ``None``            — train everything.
    The frozen-teacher replay layer is always frozen (model.py:2028-2029).
    """
    if policy is not None and policy not in FREEZE_POLICIES:
        raise ValueError(
            f"parts_to_freeze {policy!r} is not supported, select from "
            f"{list(FREEZE_POLICIES)}")

    def ones(tree):
        return jax.tree.map(lambda a: jnp.float32(1.0), tree)

    def zeros(tree):
        return jax.tree.map(lambda a: jnp.float32(0.0), tree)

    mask: Params = {"whisper": ones(params["whisper"]),
                    "medusa": ones(params["medusa"])}
    if "teacher_layer" in params["medusa"]:
        mask["medusa"]["teacher_layer"] = zeros(params["medusa"]["teacher_layer"])
    if policy is None:
        return mask

    mask["whisper"] = zeros(params["whisper"])
    if policy == "all_but_last":
        dec_layers = params["whisper"]["decoder"]["layers"]

        def last_layer_only(a):
            n_layers = a.shape[0]
            m = jnp.zeros((n_layers,) + (1,) * (a.ndim - 1), jnp.float32)
            return m.at[-1].set(1.0)

        mask["whisper"]["decoder"]["layers"] = jax.tree.map(
            last_layer_only, dec_layers)
    return mask


def apply_mask(grads: Params, mask: Params) -> Params:
    return jax.tree.map(lambda g, m: g * m.astype(g.dtype), grads, mask)


# ---------------------------------------------------------------------------
# Optimizer + train step
# ---------------------------------------------------------------------------

def make_optimizer(
    name: str = "adafactor",
    lr: float = 1e-4,
    warmup_steps: int = 100,
    total_steps: int = 10000,
    schedule: str = "linear",
    gradient_accumulation_steps: int = 1,
) -> optax.GradientTransformation:
    """Optimizer matching the reference's Seq2SeqTrainingArguments surface
    (reference: config_and_args.py:65-95 — adafactor default, warmup, linear lr)."""
    if schedule == "linear":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
            [warmup_steps])
    elif schedule == "constant":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.constant_schedule(lr)], [warmup_steps])
    else:
        raise ValueError(f"unknown lr schedule {schedule!r}")
    if name == "adafactor":
        opt = optax.adafactor(learning_rate=sched)
    elif name == "adamw":
        opt = optax.adamw(learning_rate=sched, weight_decay=0.0)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, gradient_accumulation_steps)
    return opt


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def make_train_step(config: ModelConfig, optimizer: optax.GradientTransformation,
                    freeze_policy: Optional[str], remat: Any = "attn",
                    decoder_remat: Any = None):
    """Build the jittable train step.  The gradient mask is computed once from the
    param structure and closed over (static).  ``freeze_policy`` both masks the
    gradients AND structurally prunes the backward (see medusa_train_forward);
    ``remat`` picks the backbone checkpoint policy for full fine-tunes."""

    def train_step(state: TrainState, input_features, labels):
        mask = trainable_mask(state.params, freeze_policy)

        def loss_fn(p):
            out = medusa_train_forward(p, config, input_features, labels,
                                       freeze_policy=freeze_policy,
                                       remat=remat,
                                       decoder_remat=decoder_remat)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = apply_mask(grads, mask)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "per_head_ce": out.per_head_ce,
                   "valid_heads": out.valid_heads}
        if out.per_head_kl is not None:
            metrics["per_head_kl"] = out.per_head_kl
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(params: Params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.int32(0))


def eval_loss(config: ModelConfig, params: Params, input_features, labels):
    out = medusa_train_forward(params, config, input_features, labels)
    return out.loss, out.per_head_ce
