"""Pixel-space <-> model-space normalization.

The architectural invariant inherited from the reference (attack.py:10-17):
images live in [0,1] pixel space everywhere; ImageNet normalization is
applied only immediately before each model forward.  Layout here is NHWC
(TPU-native), not the reference's NCHW.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import IMAGENET_MEAN, IMAGENET_STD


def normalize_batch(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    """(x - mean) / std with mean/std broadcast over the channel axis.

    Args:
      x: [..., H, W, C] image batch in [0,1] pixel space (NHWC).
      mean, std: length-C arrays.

    Returns an array of the same shape/dtype as ``x``. The subtraction runs
    in the input dtype so it fuses into the first conv under XLA.
    """
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    if mean.ndim != 1 or std.ndim != 1:
        raise ValueError("mean/std must be 1D arrays with shape [C]")
    return (x - mean) / std


def normalizer(mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Returns a closure ``x01 -> normalized`` capturing mean/std.

    With ``mean=0, std=1`` this is the identity path used for robust models
    (reference defense_experiments.py:765-767).
    """

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        return normalize_batch(x, mean, std)

    return apply
