"""CROWN-IBP: tighter deterministic L-infinity certificates.

Pure interval propagation (defenses/ibp.py) treats every logit
independently, so the margin bound ``lo_y - max hi_j`` double-counts the
shared input uncertainty.  CROWN-IBP (Zhang et al., ICLR 2020 — the
`crown-ibp` in the model family's cnn7 benchmark) keeps IBP's cheap
intermediate bounds but lower-bounds each margin ``z_y - z_j`` with ONE
backward pass of linear coefficients through the network: every ReLU is
replaced by its optimal linear relaxation given the interval its input
lives in, and the surviving linear function is minimized exactly over
the input box.  Same soundness, strictly better use of correlations —
on trained nets the verified accuracy is never worse and usually
substantially higher at large eps.

The propagator walks the same ``spec`` tuple as the forward pass and the
IBP propagator (models/ibp.py), so the three can never drift apart.

TPU design: the backward pass is batched linear algebra — the margin
specs ride a size-``n_classes`` leading axis folded into the batch, so
conv adjoints (via ``jax.vjp`` of the forward conv — exactly XLA's
transposed conv) and dense transposes stay MXU matmuls; ReLU relaxation
is one fused elementwise select.  Everything (IBP forward trace +
backward CROWN pass + box minimization) compiles into ONE XLA program
with ``eps`` traced, so a whole eps sweep reuses a single compilation,
matching the defense-grid convention (eval/defense_eval.py).  All
contractions run at ``lax.Precision.HIGHEST`` — bound arithmetic
subtracts nearly-equal quantities, and bf16 accumulation could
under-state a radius, silently voiding the certificate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.normalize import normalize_batch
from .ibp import pixel_bounds, spec_forward

_DIMS = ("NHWC", "HWIO", "NHWC")
_PREC = lax.Precision.HIGHEST


def interval_trace(params: dict, spec: tuple, lo: jnp.ndarray,
                   hi: jnp.ndarray) -> list:
    """IBP forward recording the bounds ENTERING each layer.

    Returns ``pre`` with ``pre[i] = (lo_i, hi_i)`` the elementwise bounds
    on layer ``i``'s input — the ReLU relaxations and the shape book-
    keeping of the backward pass both read from it.  Same arithmetic as
    ``ibp.interval_propagate`` (midpoint through W, radius through |W|).
    """
    lo = lo.astype(jnp.float32)
    hi = hi.astype(jnp.float32)
    pre = []
    for i, layer in enumerate(spec):
        pre.append((lo, hi))
        kind = layer[0]
        if kind == "conv":
            _, _, _, stride = layer
            p = params[f"conv_{i}"]
            w = p["kernel"].astype(jnp.float32)
            b = p["bias"].astype(jnp.float32)
            mid, rad = (hi + lo) / 2, (hi - lo) / 2
            mid = lax.conv_general_dilated(
                mid, w, window_strides=(stride, stride), padding="SAME",
                dimension_numbers=_DIMS, precision=_PREC) + b
            rad = lax.conv_general_dilated(
                rad, jnp.abs(w), window_strides=(stride, stride),
                padding="SAME", dimension_numbers=_DIMS, precision=_PREC)
            lo, hi = mid - rad, mid + rad
        elif kind == "relu":
            lo, hi = jnp.maximum(lo, 0.0), jnp.maximum(hi, 0.0)
        elif kind == "flatten":
            lo = lo.reshape(lo.shape[0], -1)
            hi = hi.reshape(hi.shape[0], -1)
        elif kind == "dense":
            p = params[f"dense_{i}"]
            w = p["kernel"].astype(jnp.float32)
            b = p["bias"].astype(jnp.float32)
            mid, rad = (hi + lo) / 2, (hi - lo) / 2
            mid = jnp.dot(mid, w, precision=_PREC) + b
            rad = jnp.dot(rad, jnp.abs(w), precision=_PREC)
            lo, hi = mid - rad, mid + rad
        else:  # pragma: no cover - specs are module-level constants
            raise ValueError(f"unknown IBP layer kind '{kind}'")
    return pre


def _relu_relaxation(l: jnp.ndarray, u: jnp.ndarray):
    """Per-neuron linear ReLU relaxation over pre-activation box [l, u].

    upper:  relu(x) <= up_slope * x + up_intercept   (the CROWN chord)
    lower:  relu(x) >= low_slope * x                 (adaptive: identity
            when the box leans positive, zero otherwise — Zhang et al.'s
            heuristic that minimizes the relaxation area)
    Stable-positive neurons (l >= 0) are exact identity; stable-negative
    (u <= 0) exact zero.
    """
    crossing = (l < 0.0) & (u > 0.0)
    denom = jnp.where(crossing, u - l, 1.0)  # guarded: only read if crossing
    up_slope = jnp.where(l >= 0.0, 1.0,
                         jnp.where(crossing, u / denom, 0.0))
    up_intercept = jnp.where(crossing, -l * u / denom, 0.0)
    low_slope = jnp.where(l >= 0.0, 1.0,
                          jnp.where(crossing,
                                    (u >= -l).astype(jnp.float32), 0.0))
    return up_slope, up_intercept, low_slope


def crown_backward_bound(params: dict, spec: tuple, pre: list,
                         A: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Lower-bound the linear functionals ``A @ logits + bias`` over the
    input box, by one CROWN backward pass.

    ``A`` is [B, S, n_out] (S specs per sample), ``pre`` comes from
    ``interval_trace``.  Returns [B, S] sound lower bounds.
    """
    b_sz, s_sz = A.shape[0], A.shape[1]
    for i in reversed(range(len(spec))):
        layer = spec[i]
        kind = layer[0]
        lo_i, hi_i = pre[i]
        if kind == "dense":
            p = params[f"dense_{i}"]
            w = p["kernel"].astype(jnp.float32)
            b = p["bias"].astype(jnp.float32)
            bias = bias + jnp.einsum("bso,o->bs", A, b, precision=_PREC)
            A = jnp.einsum("bso,io->bsi", A, w, precision=_PREC)
        elif kind == "relu":
            up_s, up_i, low_s = _relu_relaxation(lo_i, hi_i)
            # broadcast per-sample relaxations over the spec axis
            up_s, up_i, low_s = (t[:, None] for t in (up_s, up_i, low_s))
            neg = jnp.minimum(A, 0.0)
            reduce_axes = tuple(range(2, A.ndim))
            bias = bias + jnp.sum(neg * up_i, axis=reduce_axes)
            A = jnp.where(A >= 0.0, A * low_s, A * up_s)
        elif kind == "flatten":
            A = A.reshape(b_sz, s_sz, *lo_i.shape[1:])
        elif kind == "conv":
            _, _, _, stride = layer
            p = params[f"conv_{i}"]
            w = p["kernel"].astype(jnp.float32)
            b = p["bias"].astype(jnp.float32)
            bias = bias + jnp.einsum("bshwc,c->bs", A, b, precision=_PREC)

            # adjoint of the (linear) forward conv = vjp at any point;
            # fold the spec axis into the batch so it stays ONE conv
            def fwd(x):
                return lax.conv_general_dilated(
                    x, w, window_strides=(stride, stride), padding="SAME",
                    dimension_numbers=_DIMS, precision=_PREC)

            in_shape = (b_sz * s_sz,) + lo_i.shape[1:]
            _, vjp = jax.vjp(fwd, jnp.zeros(in_shape, jnp.float32))
            (a_in,) = vjp(A.reshape(b_sz * s_sz, *A.shape[2:]))
            A = a_in.reshape(b_sz, s_sz, *lo_i.shape[1:])
        else:  # pragma: no cover - specs are module-level constants
            raise ValueError(f"unknown IBP layer kind '{kind}'")

    # exact minimum of the surviving linear function over the input box
    lo0, hi0 = pre[0]
    mid, rad = (hi0 + lo0) / 2.0, (hi0 - lo0) / 2.0
    reduce_axes = tuple(range(2, A.ndim))
    return (bias
            + jnp.sum(A * mid[:, None], axis=reduce_axes)
            - jnp.sum(jnp.abs(A) * rad[:, None], axis=reduce_axes))


def margin_spec_bounds(params: dict, spec: tuple, x01: jnp.ndarray,
                       y: jnp.ndarray, eps, mean, std
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-spec sound lower bounds on ``z_y - z_j`` over the eps-ball.

    Returns ``(crown, ibp)``, each [B, n_classes]: column j bounds the
    margin against class j (column y is exactly 0 in both — its spec
    row ``e_y - e_y`` is the zero functional).  Both are differentiable
    w.r.t. ``params``, so they double as training objectives (the
    CROWN-IBP loss mixes them with a ramped beta — Zhang et al. 2020,
    eq. 12)."""
    lo0, hi0 = pixel_bounds(x01, eps, mean, std)
    pre = interval_trace(params, spec, lo0, hi0)

    n = spec[-1][1]  # last layer is dense(num_classes) by construction
    # spec rows: c_j = e_y - e_j  (row y is identically zero -> bound 0)
    A0 = (jax.nn.one_hot(y, n, dtype=jnp.float32)[:, None, :]
          - jnp.eye(n, dtype=jnp.float32)[None, :, :])
    bias0 = jnp.zeros((x01.shape[0], n), jnp.float32)
    crown = crown_backward_bound(params, spec, pre, A0, bias0)

    # plain IBP per-spec bound from the trace's final interval: push
    # pre[-1] through the last dense, then lo_y - hi_j (with column y
    # pinned to the same exact-0 convention as the CROWN specs)
    lo_fin, hi_fin = pre[-1]
    p = params[f"dense_{len(spec) - 1}"]
    w = p["kernel"].astype(jnp.float32)
    b = p["bias"].astype(jnp.float32)
    mid, rad = (hi_fin + lo_fin) / 2, (hi_fin - lo_fin) / 2
    mid = jnp.dot(mid, w, precision=_PREC) + b
    rad = jnp.dot(rad, jnp.abs(w), precision=_PREC)
    lo_log, hi_log = mid - rad, mid + rad
    lo_y = jnp.take_along_axis(lo_log, y[:, None], axis=-1)  # [B,1]
    mask = jax.nn.one_hot(y, n, dtype=jnp.bool_)
    ibp = jnp.where(mask, 0.0, lo_y - hi_log)  # [B, n]
    return crown, ibp


def crown_ibp_margin(params: dict, spec: tuple, x01: jnp.ndarray,
                     y: jnp.ndarray, eps, mean, std) -> jnp.ndarray:
    """[B] sound lower bound on ``min_{j!=y} (z_y - z_j)`` over the
    eps-ball: positive iff the label is PROVABLY argmax.

    The returned margin is the per-spec MAX of the CROWN-IBP backward
    bound and the plain IBP bound — both are sound, so their pointwise
    maximum is too (and the result is never worse than ``--method ibp``).
    """
    crown, ibp = margin_spec_bounds(params, spec, x01, y, eps, mean, std)
    n = crown.shape[-1]
    margin_specs = jnp.maximum(crown, ibp)
    mask = jax.nn.one_hot(y, n, dtype=jnp.bool_)
    return jnp.min(jnp.where(mask, jnp.inf, margin_specs), axis=-1)


def make_crown_verify_fn(params: dict, spec: tuple, mean, std):
    """(x01, y, eps) -> {verified, correct, margin}; the CROWN-IBP
    counterpart of ``ibp.make_verify_fn`` (eps traced: one program per
    eps sweep)."""

    def verify(x01: jnp.ndarray, y: jnp.ndarray, eps) -> dict:
        margin = crown_ibp_margin(params, spec, x01, y, eps, mean, std)
        clean = spec_forward(
            params, spec, normalize_batch(x01.astype(jnp.float32),
                                          mean, std))
        return {
            "verified": margin > 0.0,
            "correct": jnp.argmax(clean, axis=-1) == y,
            "margin": margin,
        }

    return verify
