"""int8 quantized inference: route convs/matmuls onto the v5e's int8 MXU.

The v5e rates 394 TOPS int8 vs 197 TFLOP/s bf16, and XLA does emit the
int8 systolic path for ``conv_general_dilated``/``dot_general`` with int8
operands + ``preferred_element_type=int32`` — measured on this chip at
225 TOP/s vs 134 TF/s bf16 for the ResNet body conv (1.68x,
benchmarks/int8_probe.py).  This module makes that a drop-in inference
mode for any checkpoint:

- **weights**: symmetric per-output-channel int8 (scale = absmax/127 per
  channel) — the standard PTQ recipe; quantized from the float params at
  trace time (an O(params) elementwise pass, negligible next to the conv
  FLOPs it feeds, and requiring NO change to checkpoints or param trees).
- **activations**: symmetric per-tensor DYNAMIC int8 — the scale is a
  traced scalar computed per forward, so no calibration data is needed
  (none exists in this container).
- **gradients**: the whole quantized op carries a custom VJP that
  differentiates the FLOAT operation at the same point (the
  straight-through treatment at op granularity), so the attack zoo runs
  unmodified against a quantized model — quantized-model robustness is
  evaluable end-to-end, not just servable.

The functions match the exact signatures flax injects
(``nn.Conv(conv_general_dilated=...)``, ``nn.Dense(dot_general=...)``,
flax 0.12 injection hooks), which is how the model zoo's ``int8=True``
flag threads them in without touching parameter structure or the
torchvision-name converter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def quantize_symmetric(x: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization reducing absmax over ``axes``.

    Returns (q int8, scale float32) with x ≈ q * scale.  ``axes=None``
    reduces everything (per-tensor); a tuple keeps the remaining axes
    (e.g. per-output-channel for an HWIO kernel with axes=(0,1,2)).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv_general_dilated(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    window_strides=None,
    padding=None,
    *,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count: int = 1,
    batch_group_count: int = 1,
    precision=None,
    preferred_element_type=None,
):
    """lax.conv_general_dilated signature, int8 MXU execution, float-VJP.

    Forward: per-tensor dynamic activation quant x per-out-channel weight
    quant -> int8 conv accumulating in int32 -> dequantize.  Backward:
    the VJP of the float conv at the same primal point (straight-through
    at op granularity), so attacks/gradients flow as for the float model.
    Assumes the feature dimension is LAST in the conv output (NHWC /
    '...C' dimension_numbers — this repo's convention everywhere).
    """
    del precision, preferred_element_type  # quantized path defines both
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    conv_kw = dict(
        window_strides=window_strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        batch_group_count=batch_group_count,
    )

    def quantized(l, r):
        ql, sl = quantize_symmetric(l, axes=None)          # per-tensor
        qr, sr = quantize_symmetric(r, axes=(0, 1, 2))     # per-out-channel [O]
        acc = lax.conv_general_dilated(
            ql, qr, preferred_element_type=jnp.int32, **conv_kw)
        # sl scalar; sr [1,1,1,O] -> broadcast over the trailing feature dim
        scale = (sl.reshape(()) * sr.reshape(-1)).astype(jnp.float32)
        return (acc.astype(jnp.float32) * scale).astype(out_dtype)

    def float_conv(l, r):
        return lax.conv_general_dilated(l, r, **conv_kw)

    @jax.custom_vjp
    def qconv(l, r):
        return quantized(l, r)

    def fwd(l, r):
        return quantized(l, r), (l, r)

    def bwd(res, g):
        _, vjp = jax.vjp(float_conv, *res)
        return vjp(g.astype(out_dtype))

    qconv.defvjp(fwd, bwd)
    return qconv(lhs, rhs)


def int8_dot_general(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    dimension_numbers,
    precision=None,
    preferred_element_type=None,
):
    """lax.dot_general signature for the Dense case (contract lhs's last
    dim with rhs's first, no batch dims) on the int8 MXU; any other
    contraction falls back to the float op unquantized."""
    (lc, rc), (lb, rb) = dimension_numbers
    dense_case = (
        tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,)
        and not lb and not rb and rhs.ndim == 2
    )
    if not dense_case:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type)

    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)

    def quantized(l, r):
        ql, sl = quantize_symmetric(l, axes=None)
        qr, sr = quantize_symmetric(r, axes=(0,))          # per-column [O]
        acc = lax.dot_general(
            ql, qr, dimension_numbers, preferred_element_type=jnp.int32)
        scale = (sl.reshape(()) * sr.reshape(-1)).astype(jnp.float32)
        return (acc.astype(jnp.float32) * scale).astype(out_dtype)

    def float_dot(l, r):
        return lax.dot_general(l, r, dimension_numbers, precision=precision)

    @jax.custom_vjp
    def qdot(l, r):
        return quantized(l, r)

    def fwd(l, r):
        return quantized(l, r), (l, r)

    def bwd(res, g):
        _, vjp = jax.vjp(float_dot, *res)
        return vjp(g.astype(out_dtype))

    qdot.defvjp(fwd, bwd)
    return qdot(lhs, rhs)
