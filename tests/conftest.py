"""Test harness config: run JAX on CPU with 8 virtual devices so
distributed/sharding tests work without TPU hardware (SURVEY.md §4.4).

The environment pre-imports jax and pins ``jax_platforms`` to the TPU
backend at interpreter startup, so setting JAX_PLATFORMS here is too late —
override via jax.config before any backend is touched. XLA_FLAGS must also
be set before first backend use to get the 8-device virtual CPU mesh.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
