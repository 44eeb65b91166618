"""Multi-process (multi-host) bootstrap: ``jax.distributed`` + global meshes.

The reference reaches multi-GPU only through HF accelerate's process launcher
and NCCL DDP/ZeRO (reference: whisper_medusa/utils/medusa_trainer_cls.py:
142-156, models/model.py:947-951).  The TPU-native equivalent is JAX's
distributed runtime: every process calls :func:`initialize`, sees the global
device set, and runs the SAME SPMD program — XLA partitions it over a global
``Mesh`` whose *data* axis strides across processes (DCN) while the *model*
axis stays inside each process's chips (ICI), so TP collectives ride the fast
interconnect and only DP gradient reductions cross hosts (the
"How to Scale Your Model" mesh recipe).

On TPU pods ``jax.distributed.initialize()`` auto-discovers the coordinator
from the TPU metadata; elsewhere (GPU/CPU fleets, tests) pass
``coordinator_address``/``num_processes``/``process_id`` or set the standard
``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` env vars.
Validated by the two-process virtual-CPU dryrun
(``__graft_entry__.dryrun_multichip(8, n_processes=2)`` /
tests/test_distributed.py) — real DCN is exercised the same way, just with a
real coordinator address.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from whisper_medusa_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join the JAX distributed runtime (idempotent; no-op single-process).

    With no arguments, defers to JAX's auto-detection (TPU pod metadata,
    SLURM, or the ``JAX_*`` env vars).  Must be called before any other JAX
    API touches the backend."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes == 1 and coordinator_address is None:
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should own logging/wandb/host-side writes."""
    return jax.process_index() == 0


def global_mesh(dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """A (data, model) mesh over EVERY process's devices.

    Device order groups each process's chips contiguously, so with
    ``tp <= local_device_count`` the model axis never crosses a process
    boundary: TP collectives stay on ICI, and only the data axis — gradient
    all-reduce, the cheap one — spans DCN."""
    devices = sorted(jax.devices(),
                     key=lambda d: (d.process_index, getattr(d, "id", 0)))
    n = len(devices)
    local = max(len(jax.local_devices()), 1)
    if dp is None and tp is None:
        tp = local
        while tp > 1 and (n % tp != 0):
            tp //= 2
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != global device count {n}")
    if tp > local and jax.process_count() > 1:
        raise ValueError(
            f"tensor-parallel size {tp} would put TP collectives on DCN "
            f"(local devices per process: {local}); choose tp <= {local} and "
            "scale the data axis across processes instead")
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def local_batch_to_global(sharding, local_data: np.ndarray):
    """Assemble a global batch array from each process's local shard.

    Each process loads only its ``global_batch / process_count`` rows; the
    returned ``jax.Array`` is the sharded global view (no cross-host copy).
    The single-process case degenerates to ``device_put``."""
    if jax.process_count() == 1:
        return jax.device_put(local_data, sharding)
    return jax.make_array_from_process_local_data(sharding, local_data)


def sync(name: str = "wm_sync") -> None:
    """Cross-process barrier (orbax-style save coordination, shutdown)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
