"""Multi-host (multi-slice) initialization helper.

A single v5e slice is driven by one host; pods beyond a slice need
``jax.distributed.initialize`` before any backend use, after which
``jax.devices()`` spans all hosts, the ('data','model') mesh covers the
full pod, and every sharded program in this framework works unchanged —
XLA routes intra-slice collectives over ICI and cross-slice over DCN.

Env-driven (the standard launcher contract):
  ADV_TPU_COORDINATOR   host:port of process 0
  ADV_TPU_NUM_PROCESSES total process count
  ADV_TPU_PROCESS_ID    this process's index

No-ops when unset or already initialized, so single-host CLIs never care.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed from env vars; returns True if active."""
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("ADV_TPU_COORDINATOR")
    if not coordinator:
        return False
    num = int(os.environ.get("ADV_TPU_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("ADV_TPU_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num,
        process_id=pid,
    )
    _initialized = True
    return True
