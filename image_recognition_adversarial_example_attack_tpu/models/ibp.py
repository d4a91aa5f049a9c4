"""Spec-driven convnets for interval-bound-propagation (IBP) certification.

Beyond-reference capability: the reference's defense story is empirical
preprocessing + a feature detector (defense_experiments.py:170-345) and its
robust arm CONSUMES an adversarially trained checkpoint
(defense_experiments.py:674-686); it has no *provable* robustness anywhere.
The framework already adds the probabilistic certificate (randomized
smoothing, defenses/smoothing.py); this family adds the DETERMINISTIC one:
networks whose worst-case logits under an L∞ ball are bounded in closed form
by interval arithmetic (Gowal et al. 2018, "On the Effectiveness of Interval
Bound Propagation"; Zhang et al. 2020 CROWN-IBP's `cnn7` is the standard
benchmark architecture reproduced here).

Why a dedicated family: IBP bounds must walk the exact layer sequence with
the exact parameters the forward pass uses.  Instead of reimplementing each
architecture twice (and letting the copies drift), the architecture IS data:
a ``spec`` tuple of layer descriptors that both the Flax ``__call__`` and the
interval propagator in defenses/ibp.py consume.  Plain conv/relu/dense only —
no BatchNorm (interval propagation through batch statistics is unsound
without extra machinery, and the IBP literature's standard models omit it).

TPU design: interval propagation is two parallel forwards (midpoint through
W, radius through |W|) — pure convs/matmuls that tile straight onto the MXU,
compiled into the SAME XLA program as the loss.  Default dtype is float32:
interval arithmetic subtracts nearly-equal quantities (hi-lo), and bf16
rounding there can understate the radius, voiding the certificate (same
mechanism as the DeepFool/NES findings, docs/EXPERIMENTS.md).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# Layer descriptors understood by IBPNet.__call__ AND
# defenses/ibp.py::interval_bounds (one source of truth):
#   ("conv", features, kernel, stride)   3x3-style SAME conv, bias
#   ("relu",)
#   ("flatten",)
#   ("dense", features)

CNN7_SPEC = (
    ("conv", 64, 3, 1), ("relu",),
    ("conv", 64, 3, 1), ("relu",),
    ("conv", 128, 3, 2), ("relu",),
    ("conv", 128, 3, 1), ("relu",),
    ("conv", 128, 3, 1), ("relu",),
    ("flatten",),
    ("dense", 512), ("relu",),
    ("dense", 10),
)

TINY_SPEC = (
    ("conv", 8, 3, 2), ("relu",),
    ("conv", 16, 3, 2), ("relu",),
    ("flatten",),
    ("dense", 32), ("relu",),
    ("dense", 10),
)


class IBPNet(nn.Module):
    """A plain conv/relu/dense stack built from a ``spec`` tuple.

    Layer names are ``{kind}_{i}`` with ``i`` the spec index, so the
    interval propagator can look every parameter up unambiguously.
    """

    spec: tuple = CNN7_SPEC
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, layer in enumerate(self.spec):
            kind = layer[0]
            if kind == "conv":
                _, features, kernel, stride = layer
                x = nn.Conv(features, (kernel, kernel),
                            strides=(stride, stride), padding="SAME",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv_{i}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            elif kind == "flatten":
                x = x.reshape(x.shape[0], -1)
            elif kind == "dense":
                x = nn.Dense(layer[1], dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"dense_{i}")(x)
            else:  # pragma: no cover - specs are module-level constants
                raise ValueError(f"unknown IBP layer kind '{kind}'")
        return x


def ibp_cnn7(dtype: Any = jnp.float32, num_classes: int = 10) -> IBPNet:
    """The CROWN-IBP 'CNN7' CIFAR benchmark net (~17M params)."""
    spec = CNN7_SPEC[:-1] + (("dense", num_classes),)
    return IBPNet(spec=spec, dtype=dtype)


def ibp_tiny(dtype: Any = jnp.float32, num_classes: int = 10) -> IBPNet:
    """Miniature IBP net for tests / CI smoke."""
    spec = TINY_SPEC[:-1] + (("dense", num_classes),)
    return IBPNet(spec=spec, dtype=dtype)
