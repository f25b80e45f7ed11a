"""Multi-host bootstrap.

The reference carried dead `torch.distributed`/NCCL init code
(util.py:216-238, never called).  The JAX equivalent is one call: process
coordination via `jax.distributed.initialize`, after which `jax.devices()`
spans the whole slice and every mesh/collective in this package works
unchanged across hosts (ICI within a slice, DCN across slices).
"""
from __future__ import annotations

import os


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX if the environment calls for it.

    Returns True if distributed mode was initialized.  No-ops (returns
    False) in single-process settings so the CLI is always safe to call.
    Honors standard cluster env vars (JAX/TPU pods auto-detect; explicit
    args cover env:// style manual setups, the analog of the reference's
    --dist_url flag).
    """
    import jax

    explicit = coordinator_address is not None
    auto = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not explicit and not auto and not os.environ.get("TPU_WORKER_HOSTNAMES_DIST"):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except Exception:
        # already initialized or single-process
        return jax.process_count() > 1
