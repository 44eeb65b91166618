"""Logger/seed helpers (reference: whisper_medusa/utils/utils.py:10-78)."""

from __future__ import annotations

import logging
import random

import numpy as np


def set_logger(level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("whisper_medusa_tpu")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        logger.addHandler(h)
    logger.setLevel(level)
    return logger


def set_seed(seed: int = 42) -> None:
    """Host-side seeding; device RNG is explicit via jax.random keys."""
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> int:
    import jax

    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))


def make_wandb_logger(project: str, run_name: str = None, config: dict = None,
                      resume_id: str = None):
    """Optional Weights & Biases hook (reference: utils.py:331-351).  Returns a
    ``log_fn(scalars, step)`` for MedusaTrainer, or None when wandb is absent."""
    try:
        import wandb
    except ImportError:
        logging.getLogger("whisper_medusa_tpu").warning(
            "wandb not installed; metrics go to the standard logger")
        return None
    kwargs = {}
    if resume_id:
        kwargs.update(resume="must", id=resume_id)
    run = wandb.init(project=project, name=run_name, config=config, **kwargs)

    def log_fn(scalars, step):
        run.log(scalars, step=step)

    return log_fn
