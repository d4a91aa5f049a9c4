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
- **activations**: symmetric PER-EXAMPLE dynamic int8 — the scale reduces
  over every axis EXCEPT batch, so each example's quantization grid is a
  function of that example alone.  This keeps serve's per-request
  isolation and makes results independent of co-batching / --max_batch
  chunking (a per-tensor scale would couple each prediction to the
  loudest activation anywhere in its batch).  No calibration data needed.
- **gradients**: the whole quantized op carries a custom VJP that
  differentiates the FLOAT operation at the same point (the
  straight-through treatment at op granularity), so the attack zoo runs
  unmodified against a quantized model — quantized-model robustness is
  evaluable end-to-end, not just servable.

The functions match the exact signatures flax injects
(``nn.Conv(conv_general_dilated=...)``, ``nn.Dense(dot_general=...)``,
flax 0.12 injection hooks); models opt in via the ``quant_conv_kwargs`` /
``quant_dense_kwargs`` helpers so every family threads the same two
dicts.  Transformer families quantize their Dense matmuls (qkv / proj /
MLP — where the FLOPs are); attention score einsums stay float, the
standard W8 treatment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def quant_conv_kwargs(int8: bool) -> dict:
    """kwargs for ``nn.Conv`` construction: the int8 hook, or nothing."""
    return {"conv_general_dilated": int8_conv_general_dilated} if int8 else {}


def quant_dense_kwargs(int8: bool) -> dict:
    """kwargs for ``nn.Dense`` construction: the int8 hook, or nothing."""
    return {"dot_general": int8_dot_general} if int8 else {}


def quantize_symmetric(x: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization reducing absmax over ``axes``.

    Returns (q int8, scale float32 with kept dims) with x ≈ q * scale.
    ``axes=None`` reduces everything (per-tensor); a tuple keeps the
    remaining axes (e.g. per-output-channel for an HWIO kernel with
    axes=(0,1,2), or per-example for an NHWC activation with axes=(1,2,3)).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _batch_axes(ndim: int) -> tuple[int, ...]:
    """All axes except the leading batch axis (per-example reduction)."""
    return tuple(range(1, ndim))


def _with_float_vjp(quantized, float_fn, out_dtype):
    """Wrap a quantized binary op so its VJP is the float op's at the same
    primal point.  Under jit the float forward inside ``jax.vjp`` is dead
    code on the fwd pass (only its linearization survives), so this costs
    nothing extra at inference."""

    @jax.custom_vjp
    def op(l, r):
        return quantized(l, r)

    def fwd(l, r):
        return quantized(l, r), (l, r)

    def bwd(res, g):
        _, vjp = jax.vjp(float_fn, *res)
        return vjp(g.astype(out_dtype))

    op.defvjp(fwd, bwd)
    return op


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

    Forward: per-example dynamic activation quant x per-out-channel weight
    quant -> int8 conv accumulating in int32 -> dequantize.  Backward:
    the VJP of the float conv at the same primal point.  Assumes batch
    leads and features trail in the conv output (NHWC / 'N...C'
    dimension_numbers — this repo's convention everywhere).
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
        ql, sl = quantize_symmetric(l, axes=_batch_axes(l.ndim))  # [B,1,1,1]
        qr, sr = quantize_symmetric(r, axes=(0, 1, 2))            # [1,1,1,O]
        acc = lax.conv_general_dilated(
            ql, qr, preferred_element_type=jnp.int32, **conv_kw)
        # sl [B,1,1,1] x sr-as-[1,1,1,O] -> [B,1,1,O], broadcast over H,W
        scale = sl * sr.reshape((1,) * (acc.ndim - 1) + (-1,))
        return (acc.astype(jnp.float32) * scale).astype(out_dtype)

    def float_conv(l, r):
        return lax.conv_general_dilated(l, r, **conv_kw)

    return _with_float_vjp(quantized, float_conv, out_dtype)(lhs, rhs)


def int8_dot_general(
    lhs: jnp.ndarray,
    rhs: jnp.ndarray,
    dimension_numbers,
    precision=None,
    preferred_element_type=None,
):
    """lax.dot_general signature for the Dense/DenseGeneral case
    (contract lhs's last dim with rhs's first, no batch dims — covers
    [B,K] / [B,T,K] token inputs against [K,O] Dense kernels AND the
    head-aligned multi-feature [K,3,H,hd] qkv kernels flax's
    DenseGeneral injects here) on the int8 MXU; any other contraction
    falls back to the float op unquantized."""
    (lc, rc), (lb, rb) = dimension_numbers
    dense_case = (
        tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,)
        and not lb and not rb and rhs.ndim >= 2
    )
    if not dense_case:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type)

    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)

    def quantized(l, r):
        ql, sl = quantize_symmetric(l, axes=_batch_axes(l.ndim))  # [B,1(,1)]
        qr, sr = quantize_symmetric(r, axes=(0,))    # [1, *feature_dims]
        acc = lax.dot_general(
            ql, qr, dimension_numbers, preferred_element_type=jnp.int32)
        # acc = l.shape[:-1] + r.shape[1:]; broadcast the two scale
        # factors into that layout (sl keeps per-example leading dims,
        # sr keeps per-output-feature trailing dims)
        sl_b = sl.reshape(sl.shape[: l.ndim - 1] + (1,) * (r.ndim - 1))
        sr_b = sr.reshape((1,) * (l.ndim - 1) + r.shape[1:])
        return (acc.astype(jnp.float32) * (sl_b * sr_b)).astype(out_dtype)

    def float_dot(l, r):
        return lax.dot_general(l, r, dimension_numbers, precision=precision)

    return _with_float_vjp(quantized, float_dot, out_dtype)(lhs, rhs)
