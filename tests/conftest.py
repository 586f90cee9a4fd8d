"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh (the idiomatic
JAX pattern for testing distributed code without hardware — the reference had
no equivalent, its NCCL paths were only exercised on real clusters).

The environment's sitecustomize imports jax and registers the TPU plugin
before pytest starts, so plain env vars are too late — we must go through
jax.config before the backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
