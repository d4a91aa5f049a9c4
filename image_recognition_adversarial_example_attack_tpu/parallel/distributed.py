"""Multi-host (multi-slice) initialization + DCN-aware mesh.

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

``make_dcn_mesh`` lays the data axis out hybrid: consecutive data shards
stay inside one process/slice, so the only traffic that crosses DCN is
the data-axis reduction (counter psums — bytes), while model-axis
collectives (activations) ride ICI.  This is the scaling-book recipe:
pick the mesh so the slow network carries the small collectives.

Validated without a pod by ``tests/test_distributed.py``: two CPU
processes (4 virtual devices each) run the sharded counter program over
a global mesh and must reproduce the single-process counters exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np

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


def make_dcn_mesh(n_model: int = 1):
    """('data','model') mesh spanning every process, DCN-aware.

    Single-process: identical to ``make_mesh``.  Multi-process: the data
    axis is ordered process-major (hybrid layout) so each process's local
    devices hold CONTIGUOUS data shards — model-axis collectives never
    leave a slice's ICI; only data-axis reductions cross DCN.
    """
    from jax.sharding import Mesh

    from .mesh import make_mesh

    n_proc = jax.process_count()
    if n_proc == 1:
        return make_mesh(n_model=n_model)
    local = jax.local_device_count()
    if local % n_model:
        raise ValueError(f"{local} local devices not divisible by "
                         f"model={n_model}")
    from jax.experimental import mesh_utils

    try:
        # TPU pods: granule = slice (devices carry slice_index)
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // n_model, n_model),
            dcn_mesh_shape=(n_proc, 1),
        )
    except ValueError:
        # CPU/GPU processes expose no slice_index: granule = process
        # (same contiguity property — each process's devices stay
        # adjacent on the data axis)
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // n_model, n_model),
            dcn_mesh_shape=(n_proc, 1),
            process_is_granule=True,
        )
    return Mesh(devices, axis_names=("data", "model"))


def process_local_batch(x_global: np.ndarray, mesh) -> jax.Array:
    """Build the globally-sharded batch from per-process slices.

    ``x_global`` is the full [B, ...] host array (deterministically
    reproducible on every process, e.g. a seeded decode order); each
    process contributes only its own contiguous slice.  Returns a global
    jax.Array sharded P('data') over the mesh.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(x_global), sharding)
    return jax.make_array_from_process_local_data(sharding, _local_slice(
        x_global, sharding))


def _local_slice(x_global: np.ndarray, sharding) -> np.ndarray:
    """This process's contiguous rows of the global batch."""
    rows = sorted(
        {idx[0].indices(x_global.shape[0])[:2]
         for dev, idx in sharding.addressable_devices_indices_map(
             x_global.shape).items()})
    lo = min(r[0] for r in rows)
    hi = max(r[1] for r in rows)
    return np.ascontiguousarray(x_global[lo:hi])
