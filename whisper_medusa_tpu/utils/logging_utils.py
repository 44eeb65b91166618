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
