"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The container's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon before any user code runs, so the env-var route is dead;
jax.config.update after import still wins. The real TPU (1 chip) is used by
bench.py; tests validate correctness and multi-device sharding on a virtual
CPU mesh, per the project build contract.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import starky_bls12_381_tpu  # noqa: E402,F401  (enables x64 before jax is used)
