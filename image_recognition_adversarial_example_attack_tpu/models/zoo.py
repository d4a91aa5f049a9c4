"""Model registry + weight resolution.

Replaces the reference's ad-hoc per-script loaders (ResNet.py:13,
blackbox_transfer.py:14-54, transferability_attack.py:22-49) with one
registry.  Weight resolution order for ``load_model(name)``:

1. explicit ``weights=`` path (``.msgpack`` Flax cache or torch ``.pth``),
2. ``$ADV_TPU_WEIGHTS_DIR/<name>.msgpack`` (or ``./weights/<name>.msgpack``),
3. ``$ADV_TPU_WEIGHTS_DIR/<name>.pth`` torchvision state dict (converted and
   cached as msgpack for next time),
4. deterministic random init (PRNGKey(0)) with a loud warning — this keeps
   every CLI runnable on an air-gapped machine; accuracy-parity claims are
   only meaningful with real weights.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..core.constants import (CIFAR10_MEAN, CIFAR10_STD, IMAGENET_MEAN,
                              IMAGENET_STD, IMAGE_SIZE)
from . import convert as conv_mod
from .resnet import resnet50, resnet_tiny
from .tiny import TinyCNN


@dataclass
class ModelBundle:
    """A loaded model: Flax module + variables + normalization constants."""

    name: str
    module: Any
    variables: dict
    source: str  # "cache" | "converted" | "random"
    mean: np.ndarray = field(default_factory=lambda: IMAGENET_MEAN.copy())
    std: np.ndarray = field(default_factory=lambda: IMAGENET_STD.copy())
    input_size: int = IMAGE_SIZE

    def apply(self, x_norm: jnp.ndarray) -> jnp.ndarray:
        return self.module.apply(self.variables, x_norm)


# name -> (module factory(dtype) , supports torch conversion)
_REGISTRY: dict[str, Callable[[Any], Any]] = {}


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


register("resnet50")(lambda dtype, **kw: resnet50(dtype=dtype, **kw))
# Adversarially-trained arm (reference defense_experiments.py:674-686 loads
# RobustBench Engstrom2019Robustness): same architecture, separate weights,
# identity normalization applied by the caller.
register("resnet50_robust")(lambda dtype, **kw: resnet50(dtype=dtype, **kw))
register("resnet_tiny")(lambda dtype, **kw: resnet_tiny(dtype=dtype, **kw))
register("tiny")(lambda dtype, **kw: TinyCNN(num_classes=1000, dtype=dtype, **kw))


def register_lazy(name: str, import_path: str, factory_name: str) -> None:
    """Register a model whose module is imported on first use."""

    def factory(dtype, **kw):
        import importlib

        mod = importlib.import_module(import_path, package=__package__)
        return getattr(mod, factory_name)(dtype=dtype, **kw)

    _REGISTRY[name] = factory


# Transfer-study architectures (built in their own modules).
register_lazy("vgg19", ".vgg", "vgg19")
register_lazy("vit_b_16", ".vit", "vit_b_16")
register_lazy("swin_t", ".swin", "swin_t")
register_lazy("densenet121", ".densenet", "densenet121")
register_lazy("efficientnet_b0", ".efficientnet", "efficientnet_b0")
register_lazy("mobilenet_v2", ".mobilenet", "mobilenet_v2")
register_lazy("convnext_tiny", ".convnext", "convnext_tiny")
# Small-image (CIFAR) family — the robustness literature's standard
# backbones; trainable from scratch with cli/adversarial_train.py.
register_lazy("wrn28_10", ".wideresnet", "wrn28_10")
register_lazy("wrn34_10", ".wideresnet", "wrn34_10")
register_lazy("wrn_tiny", ".wideresnet", "wrn_tiny")
register_lazy("preact_resnet18", ".preactresnet", "preact_resnet18")
# RobustBench-style robust WRN arm: same architecture, separate weights,
# inputs consumed in raw [0,1] (identity normalization), mirroring
# resnet50_robust (reference defense_experiments.py:674-686,765-767).
register_lazy("wrn28_10_robust", ".wideresnet", "wrn28_10")
# Certified family: plain conv/relu/dense stacks whose worst-case logits
# under an L-inf ball are bounded in closed form (models/ibp.py,
# defenses/ibp.py) — trainable with cli/adversarial_train --objective ibp,
# certified with cli/certify --method ibp.
register_lazy("ibp_cnn7", ".ibp", "ibp_cnn7")
register_lazy("ibp_tiny", ".ibp", "ibp_tiny")


# Per-model defaults beyond the ImageNet-224 convention.  Keys:
# input_size, mean, std (np [3] arrays).  Models absent here use
# IMAGE_SIZE and the ImageNet statistics.
_META: dict[str, dict] = {
    "wrn28_10": {"input_size": 32, "mean": CIFAR10_MEAN, "std": CIFAR10_STD},
    "wrn34_10": {"input_size": 32, "mean": CIFAR10_MEAN, "std": CIFAR10_STD},
    "wrn_tiny": {"input_size": 32, "mean": CIFAR10_MEAN, "std": CIFAR10_STD},
    "preact_resnet18": {"input_size": 32, "mean": CIFAR10_MEAN,
                        "std": CIFAR10_STD},
    # robust checkpoints are trained on raw [0,1] pixels (RobustBench
    # convention) — identity normalization.
    "wrn28_10_robust": {"input_size": 32,
                        "mean": np.zeros(3, np.float32),
                        "std": np.ones(3, np.float32)},
    # IBP nets consume raw [0,1] pixels (the IBP literature's setting);
    # identity normalization keeps the certified eps in pixel units, the
    # same convention as the robust arms above.
    "ibp_cnn7": {"input_size": 32,
                 "mean": np.zeros(3, np.float32),
                 "std": np.ones(3, np.float32)},
    "ibp_tiny": {"input_size": 32,
                 "mean": np.zeros(3, np.float32),
                 "std": np.ones(3, np.float32)},
}


def model_meta(name: str) -> dict:
    """Default input_size/mean/std for a registered model name."""
    meta = {"input_size": IMAGE_SIZE, "mean": IMAGENET_MEAN,
            "std": IMAGENET_STD}
    meta.update(_META.get(name, {}))
    return meta


def list_models() -> list[str]:
    return sorted(_REGISTRY)


def weights_dir() -> Path:
    return Path(os.environ.get("ADV_TPU_WEIGHTS_DIR", "weights"))


def _init_variables(module, input_size: int) -> dict:
    # jit the init: on TPU, eager init would dispatch each op over the
    # interconnect; one compiled program materializes all params at once.
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    return jax.device_get(variables)


def _load_msgpack(path: Path, template: dict) -> dict:
    return serialization.from_bytes(template, path.read_bytes())


def save_variables(variables: dict, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(jax.device_get(variables)))


def _convert_torch(name: str, pth: Path, template: dict) -> dict:
    rename = conv_mod.RENAMES.get(name)
    if rename is None:
        raise ValueError(f"no torch->flax converter registered for '{name}'")
    sd = conv_mod.load_torch_checkpoint(pth)
    converted = conv_mod.convert_state_dict(sd, rename)
    # packed torch qkv -> the models' head-aligned [D, 3, H, hd] layout
    converted = conv_mod.conform_qkv_layout(converted, template)
    conv_mod.assert_tree_shapes_match(converted, template)
    return converted


def load_model(
    name: str,
    dtype: Any = jnp.float32,
    weights: str | Path | None = None,
    input_size: int | None = None,
    cache_converted: bool = True,
    int8: bool = False,
) -> ModelBundle:
    """Resolve a model by name; see module docstring for the search order.

    ``input_size=None`` uses the model's native default (224 for the
    ImageNet families, 32 for the WRN/CIFAR family — ``model_meta``);
    normalization constants also come from the model's metadata.

    ``int8=True`` builds the model in quantized-inference mode (convs and
    classifier matmuls on the int8 MXU, ops/int8.py) — same parameter
    tree, so every weight-resolution path below works unchanged.
    """
    if name not in _REGISTRY:
        raise ValueError(f"unknown model '{name}'; known: {list_models()}")
    meta = model_meta(name)
    if input_size is None:
        input_size = int(meta["input_size"])
    norm = dict(mean=meta["mean"].copy(), std=meta["std"].copy())
    if int8:
        try:
            module = _REGISTRY[name](dtype, int8=True)
        except TypeError as e:
            raise ValueError(
                f"model '{name}' does not support int8 inference yet") from e
    else:
        module = _REGISTRY[name](dtype)
    template = _init_variables(module, input_size)

    candidates: list[Path] = []
    if weights is not None:
        candidates.append(Path(weights))
    candidates.append(weights_dir() / f"{name}.msgpack")
    candidates.append(weights_dir() / f"{name}.pth")

    for path in candidates:
        if not path.is_file():
            continue
        if path.suffix == ".msgpack":
            variables = _load_msgpack(path, template)
            return ModelBundle(name=name, module=module, variables=variables,
                               source="cache", input_size=input_size, **norm)
        if path.suffix in (".pth", ".pt"):
            variables = _convert_torch(name, path, template)
            if cache_converted:
                save_variables(variables, weights_dir() / f"{name}.msgpack")
            return ModelBundle(name=name, module=module, variables=variables,
                               source="converted", input_size=input_size, **norm)

    warnings.warn(
        f"no weights found for '{name}' (searched {[str(c) for c in candidates]}); "
        "using deterministic random init — predictions are NOT ImageNet-accurate. "
        "Drop a torchvision state dict at "
        f"{weights_dir() / (name + '.pth')} to enable pretrained behavior.",
        stacklevel=2,
    )
    return ModelBundle(name=name, module=module, variables=template,
                       source="random", input_size=input_size, **norm)
