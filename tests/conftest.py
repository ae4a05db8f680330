"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding is validated the TPU-world way — a virtual host-device
mesh (`--xla_force_host_platform_device_count=8`) substitutes for real chips
(SURVEY.md §4). The environment may pre-register a TPU platform at
interpreter boot (sitecustomize), so we switch platforms via jax.config —
env vars alone are too late — before any backend is initialised.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.device_count() == 8, "tests require the 8-device virtual CPU mesh"
