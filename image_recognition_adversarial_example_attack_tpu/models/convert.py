"""torch state_dict -> Flax variables conversion.

The reference obtains weights from torchvision downloads at import time
(ResNet.py:13).  This framework is built for air-gapped TPU fleets: weight
import is a one-time offline step — point ``convert_state_dict`` (or the
zoo's ``--weights`` flag) at a torchvision-compatible ``.pth`` state dict
and it is re-laid-out into Flax NHWC variables and cached as msgpack.

Layout rules:
- conv weight   [O, I, kh, kw] -> kernel [kh, kw, I, O]
- linear weight [O, I]         -> kernel [I, O]
- bn weight/bias -> scale/bias under ``params``;
  running_mean/var -> mean/var under ``batch_stats``;
  num_batches_tracked is dropped.

torch is imported lazily so the TPU runtime never depends on it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Mapping

import numpy as np


def _set_path(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _to_numpy(t: Any) -> np.ndarray:
    # Works for torch tensors and numpy arrays without importing torch here.
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_state_dict(
    state_dict: Mapping[str, Any],
    module_rename: Callable[[str], str],
) -> dict:
    """Generic torch -> Flax conversion.

    Args:
      state_dict: flat torch mapping ``"a.b.c.weight" -> tensor``.
      module_rename: maps a torch module path ("layer1.0.downsample.0") to
        the flax module path, slash-separated ("layer1_0/downsample_conv").

    Returns ``{"params": ..., "batch_stats": ...}`` nested dicts.
    """
    out: dict = {"params": {}, "batch_stats": {}}
    for key, tensor in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        module_path, _, leaf = key.rpartition(".")
        flax_module = tuple(p for p in module_rename(module_path).split("/") if p)
        arr = _to_numpy(tensor)

        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                _set_path(out["params"], flax_module + ("kernel",), arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:  # linear OI -> IO
                _set_path(out["params"], flax_module + ("kernel",), arr.T)
            elif arr.ndim == 1:  # batchnorm gamma
                _set_path(out["params"], flax_module + ("scale",), arr)
            else:
                raise ValueError(f"unhandled weight rank {arr.ndim} at {key}")
        elif leaf == "bias":
            _set_path(out["params"], flax_module + ("bias",), arr)
        elif leaf == "running_mean":
            _set_path(out["batch_stats"], flax_module + ("mean",), arr)
        elif leaf == "running_var":
            _set_path(out["batch_stats"], flax_module + ("var",), arr)
        else:
            raise ValueError(f"unhandled state_dict leaf: {key}")
    if not out["batch_stats"]:
        del out["batch_stats"]
    return out


# ---------------------------------------------------------------------------
# Per-architecture module renames (torchvision key conventions).
# ---------------------------------------------------------------------------

def resnet_rename(path: str) -> str:
    """torchvision resnet50: layer1.0.downsample.0 -> layer1_0/downsample_conv.

    Leading "module."/"model." wrappers (DataParallel / RobustBench
    checkpoints) are stripped so robust weights convert with the same rule.
    """
    parts = path.split(".")
    while parts and parts[0] in ("module", "model"):
        parts = parts[1:]
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith("layer") and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p == "downsample":
            idx = parts[i + 1]
            out.append("downsample_conv" if idx == "0" else "downsample_bn")
            i += 2
        else:
            out.append(p)
            i += 1
    return "/".join(out)


def vgg_rename(path: str) -> str:
    """torchvision vgg19: features.N -> features_N, classifier.N -> classifier_N."""
    parts = path.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("features", "classifier") and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return "/".join(out)


RENAMES: dict[str, Callable[[str], str]] = {
    "resnet50": resnet_rename,
    "resnet50_robust": resnet_rename,
    "vgg19": vgg_rename,
}


def load_torch_checkpoint(path: str | Path) -> Mapping[str, Any]:
    """Load a .pth/.pt state dict on CPU (lazy torch import)."""
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(obj, Mapping) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def assert_tree_shapes_match(converted: Mapping, reference: Mapping, prefix: str = "") -> None:
    """Raise if converted variables don't structurally match a model's init."""
    ref_keys = set(reference.keys())
    got_keys = set(converted.keys())
    if ref_keys != got_keys:
        missing = ref_keys - got_keys
        extra = got_keys - ref_keys
        raise ValueError(f"tree mismatch at '{prefix}': missing={sorted(missing)} extra={sorted(extra)}")
    for k in ref_keys:
        r, c = reference[k], converted[k]
        if isinstance(r, Mapping):
            assert_tree_shapes_match(c, r, prefix=f"{prefix}/{k}")
        else:
            if tuple(np.shape(c)) != tuple(np.shape(r)):
                raise ValueError(
                    f"shape mismatch at '{prefix}/{k}': got {np.shape(c)}, want {np.shape(r)}"
                )
