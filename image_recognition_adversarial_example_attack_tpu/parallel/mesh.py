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


def _path_names(path: tuple) -> list[str]:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def _is_head_kernel(path: tuple, leaf) -> bool:
    """True for the classifier head's dense kernel ([in, out], out = classes)."""
    names = _path_names(path)
    return (
        len(names) >= 2
        and names[-1] == "kernel"
        # fc: resnet; head: vit/swin; classifier: densenet/efficientnet;
        # classifier_6: vgg
        and names[-2] in ("fc", "head", "classifier", "classifier_6")
        and getattr(leaf, "ndim", 0) == 2
    )


def tensor_parallel_spec(path: tuple, leaf) -> P | None:
    """PartitionSpec for a parameter under tensor parallelism, or None
    (replicate).

    Megatron-style column/row pairing over the 'model' axis (SURVEY §2
    parallelism table, TP row — "so larger models (ViT-L+) can shard
    parameters over ICI"):

    - ViT/Swin attention: qkv kernel stored HEAD-ALIGNED [D, 3, H, hd]
      (models/vit.py::MHSA) and sharded on the head axis
      P(None, None, 'model', None), bias [3, H, hd] to match; output
      projection row-parallel [D->shard, D] (XLA inserts the psum).
      MEASURED (benchmarks/tp_qkv_probe.py, 8-device virtual mesh,
      ViT-B geometry, model=4): the earlier packed-contiguous [D, 3D]
      column split forced GSPMD to reshard at the q/k/v split — 7
      collective-permutes + 1 all-reduce per block, 1.09x slower —
      vs exactly 1 all-reduce per block for this layout; adopted
      accordingly (VERDICT r3 #5).  Legacy ndim-2/1 qkv leaves keep the
      contiguous column rule.
    - ViT MLP: linear_1 column-parallel, linear_2 row-parallel — the
      canonical pair with one psum per block and the two largest
      parameter tensors partitioned.
    - ResNet stage convs (layer1..4 bottlenecks): out-channel sharding
      [kh, kw, in, out->shard] on every conv kernel — the stage convs
      hold ~90% of ResNet-50's parameters; BatchNorm stays replicated
      (tiny) and GSPMD inserts the boundary reshards.
    - Classifier head: output-dim sharding (the round-1 rule).

    Semantics are unchanged by ANY of these annotations (GSPMD inserts
    collectives to keep the math identical — verified to atol by
    tests/test_sharding.py); what they buy is per-chip parameter memory
    ~1/n_model on the dominant tensors.
    """
    names = _path_names(path)
    if not names:
        return None
    last = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    ndim = getattr(leaf, "ndim", 0)

    if _is_head_kernel(path, leaf):
        return P(None, "model")
    # attention qkv/proj pairs: ViT ('self_attention'/qkv + out) and Swin
    # ('attn'/qkv + proj) — column-parallel packed qkv, row-parallel
    # output projection
    in_attention = any(n in ("self_attention", "attn") for n in names)
    if in_attention and parent == "qkv":
        if last == "kernel" and ndim == 4:   # head-aligned [D, 3, H, hd]
            return P(None, None, "model", None)
        if last == "bias" and ndim == 3:     # [3, H, hd]
            return P(None, "model", None)
        if last == "kernel" and ndim == 2:   # legacy packed [D, 3D]
            return P(None, "model")
        if last == "bias" and ndim == 1:
            return P("model")
    if (in_attention and parent in ("out", "proj")
            and last == "kernel" and ndim == 2):
        return P("model", None)  # row-parallel; bias replicated
    # MLP column/row pairs: ViT mlp_linear_1/2, Swin mlp_0/mlp_3, VGG's
    # giant classifier_0/classifier_3 pair (25088x4096 / 4096x4096 — the
    # bulk of VGG-19's 143M parameters)
    if parent in ("mlp_linear_1", "mlp_0", "classifier_0"):
        if last == "kernel" and ndim == 2:
            return P(None, "model")
        if last == "bias" and ndim == 1:
            return P("model")
    if (parent in ("mlp_linear_2", "mlp_3", "classifier_3")
            and last == "kernel" and ndim == 2):
        return P("model", None)
    # stage/block convs, out-channel sharded: ResNet layerN_i bottlenecks,
    # DenseNet denseblockB_denselayerL, EfficientNet stageS_blockB,
    # MobileNetV2 blockN inverted residuals
    if (last == "kernel" and ndim == 4
            and any(n.startswith(("layer", "denseblock", "stage", "block"))
                    for n in names)):
        return P(None, None, None, "model")
    return None


def shard_model_variables(variables: dict, mesh: Mesh, tensor_parallel: bool = False):
    """Place model variables on the mesh.

    Default: fully replicated (NamedSharding(mesh, P())).  With
    ``tensor_parallel=True`` and a model axis > 1, parameters matching
    ``tensor_parallel_spec`` (ViT qkv/MLP, ResNet stage convs, classifier
    heads) are sharded over 'model'; XLA inserts the collectives.
    """
    repl = replicated_sharding(mesh)
    n_model = mesh.shape.get("model", 1)
    if not tensor_parallel or n_model == 1:
        return jax.device_put(variables, repl)

    def place(path, leaf):
        spec = tensor_parallel_spec(path, leaf)
        if spec is not None:
            # replicate instead of shard when the partitioned dim does
            # not divide the model axis (e.g. EfficientNet's tiny SE
            # squeeze channels) — partial tensors are never worth uneven
            # sharding here
            for dim, axis in enumerate(spec):
                if axis == "model" and leaf.shape[dim] % n_model:
                    spec = None
                    break
        sh = repl if spec is None else NamedSharding(mesh, spec)
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, variables)
