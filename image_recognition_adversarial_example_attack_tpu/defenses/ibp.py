"""Interval bound propagation (IBP): deterministic L-infinity certificates.

Beyond-reference capability: the reference's defense story is empirical
(preprocessing + feature detector, defense_experiments.py:170-345) and its
robust arm merely CONSUMES an adversarially trained checkpoint
(defense_experiments.py:674-686).  The framework already carries the
probabilistic certificate (randomized smoothing, defenses/smoothing.py);
this module adds the deterministic one: closed-form bounds on every logit
over the whole eps-ball (Gowal et al. 2018, "On the Effectiveness of
Interval Bound Propagation").

The propagator walks the SAME ``spec`` tuple that builds the network
(models/ibp.py), looking parameters up by the shared ``{kind}_{i}``
naming — forward pass and certificate cannot drift apart.

TPU design: an interval forward is exactly two real forwards fused in one
XLA program — the midpoint through W and the radius through |W| — so every
bound is MXU matmuls/convs at the cost of 2x a standard forward.  All
contractions run at ``lax.Precision.HIGHEST``: intervals subtract
nearly-equal quantities (hi - lo), and the TPU's default bf16 conv
accumulation could under-state a radius, silently voiding the certificate
(same mechanism as the DeepFool sensitivity documented in
docs/EXPERIMENTS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.normalize import normalize_batch

_DIMS = ("NHWC", "HWIO", "NHWC")
_PREC = lax.Precision.HIGHEST


def interval_propagate(params: dict, spec: tuple,
                       lo: jnp.ndarray, hi: jnp.ndarray
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Propagate elementwise bounds ``lo <= x <= hi`` through ``spec``.

    ``params`` is the ``variables['params']`` tree of a models/ibp.IBPNet
    with the same ``spec``.  Returns (lo_logits, hi_logits): sound
    per-class bounds on the logits over the entire input box.
    """
    lo = lo.astype(jnp.float32)
    hi = hi.astype(jnp.float32)
    for i, layer in enumerate(spec):
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
    return lo, hi


def pixel_bounds(x01: jnp.ndarray, eps, mean, std
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Model-space bounds of the L-inf eps-ball around [0,1] pixels.

    The ball is intersected with the valid pixel box first (the attack
    stack's clamp convention, attacks/pgd.py), then both ends pass
    through the per-channel affine normalization — monotone because
    std > 0, so the box maps to a box.  ``eps`` may be a traced scalar:
    one compiled program serves a whole eps sweep (the defense-grid
    convention, eval/defense_eval.py).
    """
    lo = jnp.clip(x01 - eps, 0.0, 1.0)
    hi = jnp.clip(x01 + eps, 0.0, 1.0)
    return (normalize_batch(lo.astype(jnp.float32), mean, std),
            normalize_batch(hi.astype(jnp.float32), mean, std))


def logit_bounds(params: dict, spec: tuple, x01: jnp.ndarray, eps,
                 mean, std) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sound logit bounds for the eps-ball around a [0,1] pixel batch."""
    lo, hi = pixel_bounds(x01, eps, mean, std)
    return interval_propagate(params, spec, lo, hi)


def spec_forward(params: dict, spec: tuple, x_norm: jnp.ndarray
                 ) -> jnp.ndarray:
    """Plain forward through ``spec`` (the zero-radius interval): used
    where only the clean logits are needed, at half the interval cost."""
    x = x_norm.astype(jnp.float32)
    for i, layer in enumerate(spec):
        kind = layer[0]
        if kind == "conv":
            _, _, _, stride = layer
            p = params[f"conv_{i}"]
            x = lax.conv_general_dilated(
                x, p["kernel"].astype(jnp.float32),
                window_strides=(stride, stride), padding="SAME",
                dimension_numbers=_DIMS, precision=_PREC
            ) + p["bias"].astype(jnp.float32)
        elif kind == "relu":
            x = jnp.maximum(x, 0.0)
        elif kind == "flatten":
            x = x.reshape(x.shape[0], -1)
        elif kind == "dense":
            p = params[f"dense_{i}"]
            x = jnp.dot(x, p["kernel"].astype(jnp.float32),
                        precision=_PREC) + p["bias"].astype(jnp.float32)
        else:  # pragma: no cover - specs are module-level constants
            raise ValueError(f"unknown IBP layer kind '{kind}'")
    return x


def worst_case_logits(lo_logits: jnp.ndarray, hi_logits: jnp.ndarray,
                      y: jnp.ndarray) -> jnp.ndarray:
    """The certification adversary's logits: lower bound at the true
    class, upper bound everywhere else (Gowal et al. 2018, eq. 6)."""
    n = lo_logits.shape[-1]
    true = jax.nn.one_hot(y, n, dtype=jnp.bool_)
    return jnp.where(true, lo_logits, hi_logits)


def verified_margin(lo_logits: jnp.ndarray, hi_logits: jnp.ndarray,
                    y: jnp.ndarray) -> jnp.ndarray:
    """min_j!=y (lo_y - hi_j): positive iff the label is PROVABLY argmax
    over the whole ball."""
    n = lo_logits.shape[-1]
    true = jax.nn.one_hot(y, n, dtype=jnp.bool_)
    worst_other = jnp.max(jnp.where(true, -jnp.inf, hi_logits), axis=-1)
    lo_true = jnp.take_along_axis(lo_logits, y[:, None], axis=-1)[:, 0]
    return lo_true - worst_other


def make_verify_fn(params: dict, spec: tuple, mean, std):
    """(x01, y, eps) -> {verified, correct, margin}; eps is traced, so one
    jitted program serves an eps sweep.  ``verified`` implies ``correct``
    (eps >= 0 makes the clean point a member of its own ball)."""

    def verify(x01: jnp.ndarray, y: jnp.ndarray, eps) -> dict:
        lo, hi = logit_bounds(params, spec, x01, eps, mean, std)
        clean = spec_forward(
            params, spec, normalize_batch(x01.astype(jnp.float32),
                                          mean, std))
        margin = verified_margin(lo, hi, y)
        return {
            "verified": margin > 0.0,
            "correct": jnp.argmax(clean, axis=-1) == y,
            "margin": margin,
        }

    return verify
