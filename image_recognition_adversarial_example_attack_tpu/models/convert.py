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
            elif arr.ndim == 1:  # batchnorm / layernorm gamma
                _set_path(out["params"], flax_module + ("scale",), arr)
            else:
                raise ValueError(f"unhandled weight rank {arr.ndim} at {key}")
        elif leaf == "bias":
            _set_path(out["params"], flax_module + ("bias",), arr)
        elif leaf == "running_mean":
            _set_path(out["batch_stats"], flax_module + ("mean",), arr)
        elif leaf == "running_var":
            _set_path(out["batch_stats"], flax_module + ("var",), arr)
        elif leaf == "in_proj_weight":  # torch MHA fused qkv [3D, D]
            _set_path(out["params"], flax_module + ("qkv", "kernel"), arr.T)
        elif leaf == "in_proj_bias":
            _set_path(out["params"], flax_module + ("qkv", "bias"), arr)
        elif leaf in ("class_token", "pos_embedding", "relative_position_bias_table"):
            # bare parameters: leaf name IS the flax param name, shapes match
            _set_path(out["params"], flax_module + (leaf,), arr)
        elif leaf == "layer_scale":  # convnext [dim,1,1] -> flax [dim]
            _set_path(out["params"], flax_module + (leaf,), arr.reshape(-1))
        elif leaf == "relative_position_index":
            continue  # static buffer; recomputed at trace time (swin.py)
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


def vit_rename(path: str) -> str:
    """torchvision vit_b_16 keys -> vit.py module paths.

    encoder.layers.encoder_layer_3.self_attention.out_proj
      -> encoder_layer_3/self_attention/out
    mlp.0 / mlp.linear_1 -> mlp_linear_1 ; mlp.3 / mlp.linear_2 -> mlp_linear_2
    encoder.pos_embedding / class_token -> root params.
    """
    parts = [p for p in path.split(".") if p]
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("encoder", "layers", "heads"):
            i += 1  # structural wrappers with no flax counterpart
        elif p == "out_proj":
            out.append("out")
            i += 1
        elif p == "mlp" and i + 1 < len(parts):
            nxt = parts[i + 1]
            if nxt in ("0", "linear_1"):
                out.append("mlp_linear_1")
            elif nxt in ("3", "linear_2"):
                out.append("mlp_linear_2")
            else:
                raise ValueError(f"unexpected vit mlp index: {path}")
            i += 2
        else:
            out.append(p)
            i += 1
    return "/".join(out)


def swin_rename(path: str) -> str:
    """torchvision swin_t keys -> swin.py module paths.

    features.0.0 -> patch_conv ; features.0.2 -> patch_norm
    features.{1,3,5,7}.B.* -> stage{1..4}_block{B}/* (mlp.0->mlp_0, mlp.3->mlp_3)
    features.{2,4,6}.* -> merge{1,2,3}/*
    """
    parts = [p for p in path.split(".") if p]
    out: list[str] = []
    i = 0
    stage_of = {"1": 1, "3": 2, "5": 3, "7": 4}
    merge_of = {"2": 1, "4": 2, "6": 3}
    while i < len(parts):
        p = parts[i]
        if p == "features" and i + 1 < len(parts):
            idx = parts[i + 1]
            if idx == "0":
                sub = parts[i + 2]
                out.append("patch_conv" if sub == "0" else "patch_norm")
                i += 3
            elif idx in stage_of:
                block = parts[i + 2]
                out.append(f"stage{stage_of[idx]}_block{block}")
                i += 3
            elif idx in merge_of:
                out.append(f"merge{merge_of[idx]}")
                i += 2
            else:
                raise ValueError(f"unexpected swin features index: {path}")
        elif p == "mlp" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"mlp_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return "/".join(out)


def densenet_rename(path: str) -> str:
    """torchvision densenet121 keys -> densenet.py module paths."""
    parts = [p for p in path.split(".") if p]
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "features" and i + 1 < len(parts):
            nxt = parts[i + 1]
            if nxt.startswith("denseblock") and i + 2 < len(parts):
                out.append(f"{nxt}_{parts[i + 2]}")  # denseblock1_denselayer1
                i += 3
            elif nxt.startswith("transition"):
                out.append(nxt)
                i += 2
            else:  # conv0/norm0/norm5
                out.append(f"features_{nxt}")
                i += 2
        else:
            out.append(p)
            i += 1
    return "/".join(out)


def efficientnet_rename(path: str) -> str:
    """torchvision efficientnet_b0 keys -> efficientnet.py module paths.

    features.0.{0,1} -> stem_conv/stem_bn ; features.8.{0,1} -> head_conv/head_bn
    features.S.B.block.I.J -> stage{S}_block{B}/<role>, where the role of
    sequential index I depends on whether the block has an expansion conv
    (stage 1 blocks have expand_ratio 1 and no expansion).
    classifier.1 -> classifier
    """
    parts = [p for p in path.split(".") if p]
    if parts[0] == "classifier":
        return "classifier"
    if parts[0] != "features":
        return "/".join(parts)
    s = parts[1]
    if s == "0":
        return "stem_conv" if parts[2] == "0" else "stem_bn"
    if s == "8":
        return "head_conv" if parts[2] == "0" else "head_bn"

    stage, block = int(s), parts[2]
    rest = parts[3:]  # ['block', I, J, ...] or ['block', I, 'fc1'] for SE
    assert rest[0] == "block", path
    i_seq = rest[1]
    has_expand = stage != 1
    if has_expand:
        roles = {"0": "expand", "1": "dw", "2": "se", "3": "project"}
    else:
        roles = {"0": "dw", "1": "se", "2": "project"}
    role = roles[i_seq]
    prefix = f"stage{stage}_block{block}"
    if role == "se":
        return f"{prefix}/se/{rest[2]}"  # fc1 / fc2
    # Conv2dNormActivation: sub-index 0 = conv, 1 = bn
    sub = "conv" if rest[2] == "0" else "bn"
    return f"{prefix}/{role}_{sub}"


def wideresnet_rename(path: str) -> str:
    """Madry/RobustBench WideResNet: block1.layer.0.conv1 -> block1_0/conv1.

    Leading "module."/"model." wrappers are stripped (DataParallel /
    RobustBench checkpoints); ``sub_block`` duplicates in some RobustBench
    dumps are rejected upstream by shape checking, so only the canonical
    ``blockN.layer.I`` spine is mapped here.
    """
    parts = path.split(".")
    while parts and parts[0] in ("module", "model"):
        parts = parts[1:]
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if (p.startswith("block") and i + 2 < len(parts)
                and parts[i + 1] == "layer" and parts[i + 2].isdigit()):
            out.append(f"{p}_{parts[i + 2]}")
            i += 3
        else:
            out.append(p)
            i += 1
    return "/".join(out)


def preactresnet_rename(path: str) -> str:
    """PreActResNet (kuangliu/RobustBench lineage):
    layer2.0.shortcut.0 -> layer2_0/shortcut_0; layer1.0.bn1 -> layer1_0/bn1.

    Leading "module."/"model." wrappers are stripped.
    """
    parts = path.split(".")
    while parts and parts[0] in ("module", "model"):
        parts = parts[1:]
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if ((p.startswith("layer") or p == "shortcut")
                and i + 1 < len(parts) and parts[i + 1].isdigit()):
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return "/".join(out)


def mobilenet_rename(path: str) -> str:
    """torchvision mobilenet_v2 keys -> mobilenet.py module paths.

    features.0.{0,1} -> stem_conv/stem_bn ; features.18.{0,1} ->
    head_conv/head_bn ; classifier.1 -> classifier ;
    features.N.conv.I... -> block{N}/<role> where the Conv2dNormActivation
    sub-index (0=conv, 1=bn) applies to expand/dw, and the linear
    bottleneck's plain conv/bn sit at top-level sequential indices.
    """
    parts = [p for p in path.split(".") if p]
    if parts[0] == "classifier":
        return "classifier"
    if parts[0] != "features":
        return "/".join(parts)
    n = parts[1]
    if n == "0":
        return "stem_conv" if parts[2] == "0" else "stem_bn"
    if n == "18":
        return "head_conv" if parts[2] == "0" else "head_bn"

    rest = parts[3:]  # after 'conv': [I, J?] — parts[2] == 'conv'
    assert parts[2] == "conv", path
    i_seq = rest[0]
    has_expand = n != "1"
    prefix = f"block{n}"
    if has_expand:
        # conv.0 = expand CNA, conv.1 = dw CNA, conv.2/.3 = project conv/bn
        if i_seq == "0":
            return f"{prefix}/expand_{'conv' if rest[1] == '0' else 'bn'}"
        if i_seq == "1":
            return f"{prefix}/dw_{'conv' if rest[1] == '0' else 'bn'}"
        return f"{prefix}/project_conv" if i_seq == "2" else f"{prefix}/project_bn"
    # expand_ratio 1: conv.0 = dw CNA, conv.1/.2 = project conv/bn
    if i_seq == "0":
        return f"{prefix}/dw_{'conv' if rest[1] == '0' else 'bn'}"
    return f"{prefix}/project_conv" if i_seq == "1" else f"{prefix}/project_bn"


def convnext_rename(path: str) -> str:
    """torchvision convnext_tiny keys -> convnext.py module paths.

    features.0.{0,1} -> stem_conv/stem_ln ; features.{1,3,5,7}.J ->
    stage{K}_J (K = 1..4) with block.{0,2,3,5} -> dwconv/ln/mlp_linear_1/
    mlp_linear_2 (layer_scale is a bare param on the block itself) ;
    features.{2,4,6}.{0,1} -> down{D}_{ln,conv} (D = 1..3) ;
    classifier.{0,2} -> head_ln/classifier.
    """
    parts = [p for p in path.split(".") if p]
    if parts[0] == "classifier":
        return "head_ln" if parts[1] == "0" else "classifier"
    assert parts[0] == "features", path
    n = int(parts[1])
    if n == 0:
        return "stem_conv" if parts[2] == "0" else "stem_ln"
    if n % 2 == 0:  # downsample: 2,4,6 -> down1..3
        d = n // 2
        return f"down{d}_ln" if parts[2] == "0" else f"down{d}_conv"
    stage = (n + 1) // 2  # 1,3,5,7 -> 1..4
    prefix = f"stage{stage}_{parts[2]}"
    if len(parts) == 3:  # the block itself (layer_scale param)
        return prefix
    assert parts[3] == "block", path
    sub = {"0": "dwconv", "2": "ln", "3": "mlp_linear_1",
           "5": "mlp_linear_2"}[parts[4]]
    return f"{prefix}/{sub}"


def conform_qkv_layout(converted: dict, template: dict) -> dict:
    """Reshape packed qkv leaves to the template's head-aligned layout.

    torch stores fused attention projections PACKED — MHA's
    ``in_proj_weight`` [3D, D] and Swin's qkv Linear [3D, D] — which the
    generic pass above converts to [D, 3D] / bias [3D].  The flax models
    store the same values HEAD-ALIGNED as [D, 3, H, hd] / [3, H, hd]
    (models/vit.py::MHSA — the tensor-parallel shard of H then never
    crosses a q/k/v or head boundary; measured in
    benchmarks/tp_qkv_probe.py).  torch's packing order is exactly
    (part, head, head_dim) row-major, so a reshape to the template's
    shape is the precise re-layout — no permutation needed.  Element
    counts are checked; every other leaf passes through untouched.
    """

    def walk(conv, tmpl, path):
        if not isinstance(conv, dict):
            return conv
        out = {}
        for k, v in conv.items():
            t = tmpl.get(k) if isinstance(tmpl, dict) else None
            if (path and path[-1] == "qkv" and k in ("kernel", "bias")
                    and t is not None and v.shape != np.shape(t)):
                if v.size != np.size(t):
                    raise ValueError(
                        f"qkv {k} at {'/'.join(path)}: {v.shape} has "
                        f"{v.size} elements, template wants "
                        f"{np.shape(t)} ({np.size(t)})")
                out[k] = np.ascontiguousarray(v).reshape(np.shape(t))
            else:
                out[k] = walk(v, t, path + (k,))
        return out

    return {coll: walk(tree, template.get(coll, {}), ())
            for coll, tree in converted.items()}


RENAMES: dict[str, Callable[[str], str]] = {
    "resnet50": resnet_rename,
    "resnet50_robust": resnet_rename,
    # same Bottleneck topology at 1/8 width — lets the weights-day
    # runbook (scripts/weights_day.py) drill the REAL conversion path on
    # a model this 1-core host can synthesize in seconds
    "resnet_tiny": resnet_rename,
    "vgg19": vgg_rename,
    "vit_b_16": vit_rename,
    "swin_t": swin_rename,
    "densenet121": densenet_rename,
    "efficientnet_b0": efficientnet_rename,
    "mobilenet_v2": mobilenet_rename,
    "convnext_tiny": convnext_rename,
    "wrn28_10": wideresnet_rename,
    "wrn34_10": wideresnet_rename,
    "wrn28_10_robust": wideresnet_rename,
    "preact_resnet18": preactresnet_rename,
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
