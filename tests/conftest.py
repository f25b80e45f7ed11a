"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX analog of a fake distributed backend — multi-chip sharding
code is exercised without TPUs (SURVEY.md §4 test plan).
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
