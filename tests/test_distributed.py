"""Multi-process (multi-host stand-in) SPMD tests.

Two coordinated processes, each owning 4 virtual CPU devices, join through
jax.distributed (parallel/distributed.py) and run the full train step over
the global (2,4) mesh — the data axis spans processes the way it would span
DCN on a real multi-host fleet.  The reference's multi-process story is
accelerate DDP (reference: medusa_trainer_cls.py:142-156); ours is
multi-controller JAX + GSPMD.
"""

import subprocess
import sys

import pytest


def test_two_process_dryrun():
    # Subprocess indirection: the test process's jax is pinned to its own
    # virtual 8-CPU backend (conftest) and cannot re-init; the launcher
    # spawns fresh processes with their own device counts.
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8, n_processes=2)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=850, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "n_processes=2" in proc.stdout and "all processes agree" in proc.stdout


def test_global_mesh_axis_layout():
    """In-process (single-controller) sanity: global_mesh orders the model
    axis within a process and data outermost; specs still apply."""
    import jax

    from whisper_medusa_tpu.parallel import distributed

    mesh = distributed.global_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.size == len(jax.devices())


def test_local_batch_to_global_single_process():
    import numpy as np

    from whisper_medusa_tpu.parallel import distributed, mesh as mesh_mod

    mesh = mesh_mod.make_mesh(8)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    arr = distributed.local_batch_to_global(mesh_mod.data_sharding(mesh), x)
    np.testing.assert_array_equal(np.asarray(arr), x)
