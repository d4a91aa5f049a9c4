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
    """3x3 mean filter, stride 1, SAME-1 padding, on [B,H,W,C].

    Expressed as nine shifted adds (fixed summation order) rather than
    ``lax.reduce_window``: identical math, but reduce_window's gradient
    fails to linearize inside ``lax.scan`` in current JAX — and adaptive
    attacks differentiate through the whole defense inside scanned attack
    loops (tests/test_jpeg_dct.py).  XLA fuses the shifts either way.
    """
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    summed = xp[:, 0:h, 0:w, :]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            summed = summed + xp[:, dy:dy + h, dx:dx + w, :]
    return summed / jnp.array(9.0, x.dtype)


def defense_quantization(x: jnp.ndarray, levels: int = QUANTIZATION_LEVELS) -> jnp.ndarray:
    """Round pixels to ``levels`` uniform values in [0,1]. Idempotent.

    Straight-through gradient: forward values are the exact rounded
    pixels, backward is the identity — so adaptive attacks can
    differentiate THROUGH the quantizer (plain ``round`` would zero
    every gradient and silently turn an "adaptive" attack into noise;
    this is the standard BPDA-identity treatment with an exact forward).
    Routes through the pallas kernel when ADV_TPU_USE_PALLAS=1 on TPU
    (bit-identical forward; the STE wrapper keeps it differentiable —
    the kernel itself needs no VJP).
    """
    from ..ops.pallas_ops import quantize_pallas, use_pallas

    x01 = jnp.clip(x, 0.0, 1.0)
    if use_pallas():
        quantized = quantize_pallas(x01, levels)
    else:
        scale = jnp.array(levels - 1, x01.dtype)
        quantized = jnp.round(x01 * scale) / scale
    return x01 + lax.stop_gradient(quantized - x01)


@dataclass(frozen=True)
class DefenseConfig:
    use_jpeg: bool = False
    jpeg_quality: int = JPEG_QUALITY
    quant_levels: int = QUANTIZATION_LEVELS
    # 'host' = reference-parity PIL codec behind io_callback (one host
    # round-trip; needs the split-program path under SPMD).  'dct' = the
    # device-side differentiable baseline codec (defenses/jpeg_dct.py):
    # fully fused, SPMD-safe, adaptive-attack-capable.
    jpeg_mode: str = "host"
    # TV-minimization arm (defenses/tv.py; beyond-reference): runs FIRST
    # in the chain when enabled — reconstruct, then the parity chain.
    use_tv: bool = False
    tv_weight: float = 0.03
    tv_steps: int = 30


def defend_input(x: jnp.ndarray, config: DefenseConfig = DefenseConfig()) -> jnp.ndarray:
    """Composite defense: clip -> (TV) -> smooth -> quantize -> (JPEG) -> clip."""
    x01 = jnp.clip(x, 0.0, 1.0)
    if config.use_tv:
        from .tv import tv_minimize

        x01 = tv_minimize(x01, weight=config.tv_weight,
                          steps=config.tv_steps)
    x01 = defense_smoothing(x01)
    x01 = defense_quantization(x01, levels=config.quant_levels)
    if config.use_jpeg:
        if config.jpeg_mode == "dct":
            from .jpeg_dct import jpeg_dct_roundtrip

            x01 = jpeg_dct_roundtrip(x01, quality=config.jpeg_quality)
        elif config.jpeg_mode == "host":
            from .jpeg import jpeg_compress_batch

            # BPDA-identity: the host codec has no VJP (io_callback);
            # exact forward, identity backward — adaptive attacks remain
            # possible against the parity path too.  The codec INPUT must
            # itself be stop_gradient'ed: io_callback rejects JVP tracers
            # outright, so the callback may never see the differentiated
            # value (x + sg(cb(x)-x) still traces cb with a tracer;
            # x + sg(cb(sg(x))-x) does not)
            x_sg = lax.stop_gradient(x01)
            x01 = x01 + lax.stop_gradient(
                jpeg_compress_batch(x_sg, quality=config.jpeg_quality) - x_sg)
        else:
            raise ValueError(f"unknown jpeg_mode '{config.jpeg_mode}'")
    return jnp.clip(x01, 0.0, 1.0)
