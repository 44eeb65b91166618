"""Training loop with checkpointing, per-head logging, eval, and resume.

Replaces the reference's ``MedusaTrainer(Seq2SeqTrainer)`` + HF Trainer machinery
(reference: whisper_medusa/utils/medusa_trainer_cls.py:24-158, trainer.py:16-71,
config_and_args.py:65-95) with an explicit JAX loop:

  * jitted train step (grad-accum inside optax.MultiSteps),
  * per-step per-head loss scalars ``MedusaHead_{i}_loss``
    (reference: medusa_trainer_cls.py:115-117),
  * periodic eval on a validation iterator (``eval_steps``),
  * orbax checkpoints every ``save_steps`` with ``save_total_limit`` retention and
    best-on-eval-loss tracking (``load_best_model_at_end``),
  * ``resume_from_checkpoint`` restores params/opt-state/step.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_medusa_tpu.config import ModelConfig
from whisper_medusa_tpu.training import train as train_mod

logger = logging.getLogger("whisper_medusa_tpu")


@dataclasses.dataclass
class TrainingArgs:
    """Mirror of the live subset of the reference Seq2SeqTrainingArguments
    (reference: config_and_args.py:65-95)."""

    output_dir: str = "out"
    batch_size: int = 2
    gradient_accumulation_steps: int = 1
    lr: float = 1e-4
    warmup_steps: int = 100
    max_steps: int = 1000
    eval_steps: int = 100
    save_steps: int = 100
    save_total_limit: int = 2
    logging_steps: int = 1
    optim: str = "adafactor"
    lr_scheduler_type: str = "linear"
    parts_to_freeze: Optional[str] = None
    load_best_model_at_end: bool = True
    eval_batches: int = 8           # batches per evaluation pass


class MedusaTrainer:
    def __init__(
        self,
        config: ModelConfig,
        params: Dict[str, Any],
        args: TrainingArgs,
        train_iter: Iterator[Dict[str, np.ndarray]],
        eval_iter_fn: Optional[Callable[[], Iterator[Dict[str, np.ndarray]]]] = None,
        log_fn: Optional[Callable[[Dict[str, float], int], None]] = None,
        mesh=None,
    ):
        self.config = config
        self.args = args
        self.train_iter = train_iter
        self.eval_iter_fn = eval_iter_fn
        self.log_fn = log_fn
        # DP+TP mesh (parallel/mesh.py).  The reference gets DP via
        # accelerate/Trainer (medusa_trainer_cls.py:142-156); here it's explicit:
        # params TP-sharded, batches DP-sharded, XLA inserts the collectives.
        self.mesh = mesh
        if mesh is not None:
            from whisper_medusa_tpu.parallel import mesh as mesh_mod

            params = mesh_mod.shard_params(params, mesh)
            if args.batch_size % mesh.devices.shape[0] != 0:
                raise ValueError(
                    f"batch_size {args.batch_size} must divide by dp="
                    f"{mesh.devices.shape[0]}")

        self.optimizer = train_mod.make_optimizer(
            args.optim, args.lr, args.warmup_steps, args.max_steps,
            args.lr_scheduler_type, args.gradient_accumulation_steps)
        with self._mesh_ctx():
            self.state = train_mod.init_train_state(params, self.optimizer)
        self._step_fn = jax.jit(train_mod.make_train_step(
            config, self.optimizer, args.parts_to_freeze))
        self._eval_fn = jax.jit(
            lambda p, f, l: train_mod.eval_loss(config, p, f, l))

        self._ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "checkpoints"))
        self._data_sharding = None
        if mesh is not None:
            from whisper_medusa_tpu.parallel import mesh as mesh_mod

            self._data_sharding = mesh_mod.data_sharding(mesh)
        self._mngr = None
        self.best_eval_loss = float("inf")
        self.best_step = -1
        self.history: list = []

    # ---------------------------------------------------------------- mesh
    def _mesh_ctx(self):
        import contextlib

        return jax.set_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()

    def _put(self, x) -> jnp.ndarray:
        arr = jnp.asarray(x)
        if self._data_sharding is not None and \
                arr.shape[0] % self.mesh.devices.shape[0] == 0:
            return jax.device_put(arr, self._data_sharding)
        return arr

    # ---------------------------------------------------------------- ckpt
    def _manager(self):
        if self._mngr is None:
            import orbax.checkpoint as ocp

            os.makedirs(self._ckpt_dir, exist_ok=True)
            self._mngr = ocp.CheckpointManager(
                self._ckpt_dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.args.save_total_limit, create=True),
            )
        return self._mngr

    def save_checkpoint(self, step: int) -> None:
        import orbax.checkpoint as ocp

        self._manager().save(
            step, args=ocp.args.StandardSave({
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": np.asarray(step, np.int32),
            }))
        self._manager().wait_until_finished()
        meta = {"best_eval_loss": self.best_eval_loss, "best_step": self.best_step}
        with open(os.path.join(self._ckpt_dir, "trainer_state.json"), "w") as f:
            json.dump(meta, f)

    def restore_checkpoint(self, step: Optional[int] = None) -> bool:
        import orbax.checkpoint as ocp

        mngr = self._manager()
        step = step if step is not None else mngr.latest_step()
        if step is None:
            return False
        target = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": np.asarray(0, np.int32),
        }
        restored = mngr.restore(step, args=ocp.args.StandardRestore(target))
        self.state = train_mod.TrainState(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jnp.int32(restored["step"]))
        meta_path = os.path.join(self._ckpt_dir, "trainer_state.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.best_eval_loss = meta.get("best_eval_loss", float("inf"))
            self.best_step = meta.get("best_step", -1)
        logger.info("resumed from checkpoint step %d", step)
        return True

    # ---------------------------------------------------------------- loops
    def evaluate(self) -> float:
        assert self.eval_iter_fn is not None, "no eval dataset configured"
        losses = []
        it = self.eval_iter_fn()
        for _ in range(self.args.eval_batches):
            try:
                batch = next(it)
            except StopIteration:
                break
            with self._mesh_ctx():
                loss, _ = self._eval_fn(self.state.params,
                                        self._put(batch["input_features"]),
                                        self._put(batch["labels"]))
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else float("nan")

    def train(self, resume_from_checkpoint: bool = False) -> Dict[str, Any]:
        if resume_from_checkpoint:
            self.restore_checkpoint()
        args = self.args
        t0 = time.time()
        start = int(self.state.step)
        for step in range(start, args.max_steps):
            batch = next(self.train_iter)
            with self._mesh_ctx():
                self.state, metrics = self._step_fn(
                    self.state, self._put(batch["input_features"]),
                    self._put(batch["labels"]))

            if (step + 1) % args.logging_steps == 0:
                scalars = {"loss": float(metrics["loss"]),
                           "step_time": (time.time() - t0) / max(step - start + 1, 1)}
                per_head = np.asarray(metrics["per_head_ce"])
                valid = np.asarray(metrics["valid_heads"])
                for i, (v, ok) in enumerate(zip(per_head, valid)):
                    if ok:
                        # reference: medusa_trainer_cls.py:115-117
                        scalars[f"MedusaHead_{i}_loss"] = float(v)
                self._log(scalars, step + 1)

            if self.eval_iter_fn and (step + 1) % args.eval_steps == 0:
                eval_loss = self.evaluate()
                self._log({"eval_validation_loss": eval_loss}, step + 1)
                if eval_loss < self.best_eval_loss:
                    self.best_eval_loss = eval_loss
                    self.best_step = step + 1

            if (step + 1) % args.save_steps == 0:
                self.save_checkpoint(step + 1)

        if args.load_best_model_at_end and self.best_step > 0:
            try:
                self.restore_checkpoint(self.best_step)
            except Exception:   # best may have been rotated out (save_total_limit)
                logger.warning("best checkpoint %d unavailable; keeping last",
                               self.best_step)
        return {"final_step": int(self.state.step),
                "best_eval_loss": self.best_eval_loss}

    def _log(self, scalars: Dict[str, float], step: int) -> None:
        self.history.append((step, scalars))
        if self.log_fn:
            self.log_fn(scalars, step)
        else:
            logger.info("step %d: %s", step,
                        " ".join(f"{k}={v:.4f}" for k, v in scalars.items()))
