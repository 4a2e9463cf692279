"""Multi-host initialization (SURVEY.md §5 'Distributed communication
backend': jax.distributed over ICI/DCN replaces the reference's
nothing — it is strictly single-process, main.py:71).

Call `ensure_initialized()` once at program start on each host of a
multi-host topology (GKE/JobSet-style env vars or explicit args); on
a single host it is a no-op. All collectives then ride XLA over
ICI within a slice and DCN across slices — no NCCL-style code here.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def ensure_initialized(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when a multi-host launch is
    detected (env: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or TPU pod metadata auto-detection). Returns True
    if running distributed."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else \
        _env_int("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else \
        _env_int("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # No explicit config. Standard Cloud-TPU multi-host pods set
        # TPU_WORKER_HOSTNAMES (comma-separated worker list) without
        # any JAX_* vars — there jax.distributed.initialize() with no
        # args auto-detects via the TPU metadata. A lone hostname (or
        # nothing) means single host: stay local and never touch the
        # backend.
        if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
            jax.distributed.initialize()
            _initialized = True
            return jax.process_count() > 1
        _initialized = True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_primary() -> bool:
    """Host 0 writes artifacts/checkpoints; others stay silent."""
    return jax.process_index() == 0
