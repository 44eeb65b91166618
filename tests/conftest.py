"""Test configuration: force a virtual 8-device CPU mesh before JAX initializes.

Multi-device sharding tests run without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY §4 — the reference has no tests at
all; this harness is the framework's own test strategy).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
