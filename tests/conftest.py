"""Test configuration: force a *local* virtual 8-device CPU mesh.

Multi-device sharding tests run without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY §4 — the reference has no tests at
all; this harness is the framework's own test strategy).

Note: this environment ships a sitecustomize that force-registers a remote-TPU
("axon") PJRT plugin regardless of ``JAX_PLATFORMS``; ``jax.config.update`` after
import is the reliable way to pin tests to the in-process CPU backend (device
transfers through the remote tunnel are orders of magnitude slower).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (dozens of tiny
# decode-loop variants); caching across runs roughly halves wall clock.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/wm_test_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
