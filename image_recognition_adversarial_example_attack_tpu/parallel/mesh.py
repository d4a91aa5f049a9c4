"""Mesh construction and sharding rules.

The reference is single-process single-device by construction (SURVEY.md §2:
no torch.distributed / NCCL / MPI anywhere; batch size is literally 1).
This module is its TPU-native replacement: a 2-D ``jax.sharding.Mesh``
``('data', 'model')`` where

- the image batch is sharded over ``data`` (pure data parallelism — the
  dominant axis for <100M-param vision models; collectives ride ICI),
- model parameters are replicated by default, with an opt-in tensor-parallel
  rule that shards the classifier head's [in, out] kernel over ``model``
  (the one layer whose activations [B, 2048] x [2048, 1000] benefit when a
  model outgrows a chip; XLA inserts the psum/all-gather).

Scalar metrics (attack-success counts, detector-score quantiles) come out of
jitted programs already reduced; cross-chip reduction is XLA's job via the
sharded program, not hand-written collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        if n_total % n_model != 0:
            raise ValueError(f"{n_total} devices not divisible by model={n_model}")
        n_data = n_total // n_model
    if n_data * n_model > n_total:
        raise ValueError(f"mesh {n_data}x{n_model} needs more than {n_total} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a [B, ...] array with B sharded over the data axis."""
    return jax.device_put(x, data_sharding(mesh))


def _is_head_kernel(path: tuple, leaf) -> bool:
    """True for the classifier head's dense kernel ([in, out], out = classes)."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return (
        len(names) >= 2
        and names[-1] == "kernel"
        # fc: resnet; head: vit/swin; classifier: densenet/efficientnet;
        # classifier_6: vgg
        and names[-2] in ("fc", "head", "classifier", "classifier_6")
        and getattr(leaf, "ndim", 0) == 2
    )


def shard_model_variables(variables: dict, mesh: Mesh, tensor_parallel: bool = False):
    """Place model variables on the mesh.

    Default: fully replicated (NamedSharding(mesh, P())).  With
    ``tensor_parallel=True`` and a model axis > 1, the classifier-head
    kernel is sharded over 'model' on its output dim; XLA adds the gather
    for the logits.
    """
    repl = replicated_sharding(mesh)
    if not tensor_parallel or mesh.shape.get("model", 1) == 1:
        return jax.device_put(variables, repl)

    head = NamedSharding(mesh, P(None, "model"))

    def place(path, leaf):
        return jax.device_put(leaf, head if _is_head_kernel(path, leaf) else repl)

    return jax.tree_util.tree_map_with_path(place, variables)
