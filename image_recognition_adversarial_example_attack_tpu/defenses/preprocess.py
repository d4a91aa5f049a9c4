"""Preprocessing defenses: smoothing, quantization, optional JPEG.

Semantics parity with reference defense_experiments.py:170-217:
- smoothing: 3x3 average pool, stride 1, pad 1, divisor 9 everywhere
  (count_include_pad semantics, matching torch ``F.avg_pool2d`` defaults);
- quantization: ``round(x * (levels-1)) / (levels-1)`` with levels=16;
- composite: clip -> smooth -> quantize -> (JPEG) -> clip.

TPU design: smoothing + quantization are pure jnp on NHWC batches and stay
inside the same XLA program as the model forwards they guard.  The JPEG
round-trip is inherently host-side (PIL codec); it is isolated behind
``jax.experimental.io_callback`` in jpeg.py so the default path
(use_jpeg=False, the reference default defense_experiments.py:173) is fully
fused, and enabling JPEG inserts exactly one host round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax import lax

from ..core.constants import JPEG_QUALITY, QUANTIZATION_LEVELS


def defense_smoothing(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean filter, stride 1, SAME-1 padding, on [B,H,W,C]."""
    summed = lax.reduce_window(
        x,
        jnp.array(0.0, x.dtype),
        lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / jnp.array(9.0, x.dtype)


def defense_quantization(x: jnp.ndarray, levels: int = QUANTIZATION_LEVELS) -> jnp.ndarray:
    """Round pixels to ``levels`` uniform values in [0,1]. Idempotent.

    Routes through the pallas kernel when ADV_TPU_USE_PALLAS=1 on TPU
    (bit-identical semantics; see ops/pallas_ops.py).
    """
    from ..ops.pallas_ops import quantize_pallas, use_pallas

    if use_pallas():
        return quantize_pallas(x, levels)
    x = jnp.clip(x, 0.0, 1.0)
    scale = jnp.array(levels - 1, x.dtype)
    return jnp.round(x * scale) / scale


@dataclass(frozen=True)
class DefenseConfig:
    use_jpeg: bool = False
    jpeg_quality: int = JPEG_QUALITY
    quant_levels: int = QUANTIZATION_LEVELS


def defend_input(x: jnp.ndarray, config: DefenseConfig = DefenseConfig()) -> jnp.ndarray:
    """Composite defense: clip -> smooth -> quantize -> (JPEG) -> clip."""
    x01 = jnp.clip(x, 0.0, 1.0)
    x01 = defense_smoothing(x01)
    x01 = defense_quantization(x01, levels=config.quant_levels)
    if config.use_jpeg:
        from .jpeg import jpeg_compress_batch

        x01 = jpeg_compress_batch(x01, quality=config.jpeg_quality)
    return jnp.clip(x01, 0.0, 1.0)
