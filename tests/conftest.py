"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX analog of a fake distributed backend — multi-chip sharding
code is exercised without TPUs (SURVEY.md §4 test plan).

Note: the axon TPU plugin is registered by a sitecustomize at interpreter
start, so JAX_PLATFORMS env manipulation in here is too late; we must force
the platform through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Bitwise-comparable numerics vs the float32 torch oracle (TPU-style bf16
# matmul passes would swamp golden-test tolerances).
jax.config.update("jax_default_matmul_precision", "highest")
