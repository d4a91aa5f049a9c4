"""Spatial attack: worst-case rotation + translation (Engstrom et al.,
ICML 2019, "Exploring the Landscape of Spatial Robustness").

The threat model is a TRANSFORM budget, not a pixel budget: the adversary
may rotate the image by up to ``max_rot`` degrees and translate it by up to
``max_trans`` of the image extent per axis, and wins if ANY transform in
the budget flips the prediction.  The paper's two search modes are both
here: ``grid`` (exhaustive, the strongest — first-order methods do poorly
on this landscape, paper §5.1) and ``random`` worst-of-k (the cheap
standard, k=10).  Complements the zoo's other non-Lp members: stAdv
(attacks/stadv.py) optimizes a smooth per-pixel flow; this attack searches
a 3-parameter GLOBAL transform family — images a human reads identically
that no Lp ball contains.  The reference has no spatial attack (its zoo is
attack.py:37-140: FGSM/PGD/CW only) — beyond-reference.

TPU design: the paper evaluates candidate transforms one at a time on GPU;
here the whole search is ONE XLA program — candidates ride a ``lax.scan``
whose body warps the full batch (a pair of batched gathers, same machinery
as stadv's bilinear sampler) and runs one forward, with per-sample
best tracking (first success wins ties; among equal success states the
higher CE loss) in the carry.  Memory stays O(B) — the carry holds one
best-image buffer, never the [K,B,...] candidate stack — and the batch
dimension shards untouched on the 'data' mesh axis.  Grid mode needs no
randomness at all; random mode takes one explicit key (A2 policy).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def affine_warp(
    x: jnp.ndarray,
    angle_deg: jnp.ndarray,
    tx: jnp.ndarray,
    ty: jnp.ndarray,
    fill: float = 0.0,
) -> jnp.ndarray:
    """Rotate ``x [B,H,W,C]`` by per-sample ``angle_deg`` about the image
    center, then translate by (``tx`` right, ``ty`` down) pixels; bilinear
    sampling, out-of-image samples take ``fill`` (the paper's black-border
    convention — rotation must not invent border pixels).

    Zero parameters are exactly the identity.  Differentiable in ``x`` (for
    EOT / adaptive compositions); the transform parameters themselves are
    search variables, not gradient variables.
    """
    b, h, w, _ = x.shape
    dt = x.dtype
    theta = jnp.deg2rad(angle_deg.astype(dt))
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    ii = jnp.arange(h, dtype=dt)[None, :, None]
    jj = jnp.arange(w, dtype=dt)[None, None, :]
    # inverse map: dest (i, j) samples source R(-theta) @ (dest - c - t) + c
    dy = ii - cy - ty.astype(dt)[:, None, None]
    dx = jj - cx - tx.astype(dt)[:, None, None]
    sx = cos * dx + sin * dy + cx
    sy = -sin * dx + cos * dy + cy

    # 1e-3 px slack: float32 trig (sin(pi_f32) ~ -8.7e-8) pushes exact
    # border samples out of range by ~1e-7 px; without it a 180-degree
    # rotation spuriously fills border pixels
    tol = 1e-3
    valid = ((sy >= -tol) & (sy <= h - 1.0 + tol)
             & (sx >= -tol) & (sx <= w - 1.0 + tol))
    syc = jnp.clip(sy, 0.0, h - 1.0)
    sxc = jnp.clip(sx, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(syc), 0.0, h - 2.0)
    x0 = jnp.clip(jnp.floor(sxc), 0.0, w - 2.0)
    wy = (syc - y0)[..., None]
    wx = (sxc - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather_one(img, yi, xi):
        return img[yi, xi]  # [H,W] int maps -> [H,W,C] gather

    def corner(dy_, dx_):
        return jax.vmap(gather_one)(x, y0i + dy_, x0i + dx_)

    v00, v01 = corner(0, 0), corner(0, 1)
    v10, v11 = corner(1, 0), corner(1, 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return jnp.where(valid[..., None], out, jnp.asarray(fill, dt))


class SpatialResult(NamedTuple):
    x_adv: jnp.ndarray    # [B,H,W,C] in [0,1] — the worst transform's image
    success: jnp.ndarray  # [B] bool — some in-budget transform fooled it
    params: jnp.ndarray   # [B,3] the chosen (angle_deg, tx_px, ty_px)


def _grid_axis(n: int, bound: float, dtype) -> jnp.ndarray:
    """n grid values in [-bound, bound]; n=1 is the identity (0), matching
    the paper's odd grids that always include the untransformed image.

    The bound multiplies a unit linspace as a SCALAR literal (not folded
    into an array constant) so the budget is visible in the traced program
    — the resume-fingerprint knob map is verified against traced jaxprs
    (tests/test_knob_map.py)."""
    if n == 1:
        return jnp.zeros((1,), dtype=dtype)
    return jnp.linspace(-1.0, 1.0, int(n), dtype=dtype) * float(bound)


def spatial_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    max_rot: float = 30.0,
    max_trans: float = 0.1,
    candidates: int = 10,
    grid_rot: int = 0,
    grid_trans: int = 0,
    key: Optional[jax.Array] = None,
) -> SpatialResult:
    """Worst-case rotation/translation inside the budget.

    The search set is the UNION of the paper's two methods, each zeroable:
    ``candidates`` per-sample uniform draws (worst-of-k — every sample gets
    its own transforms, a strictly stronger adversary than one shared
    draw), plus an exhaustive ``grid_rot x grid_trans x grid_trans`` grid
    shared across the batch (used when both counts are > 0; odd counts
    include the identity, matching the paper's grid).  Defaults are the
    cheap standard, worst-of-10 random; the paper's strongest setting is
    ``candidates=0, grid_rot=31, grid_trans=5``.  ``max_trans`` is a
    fraction of each axis' extent.  Untargeted (the paper's setting):
    success = prediction leaves ``y_true``.
    """
    x0 = jnp.clip(x, 0.0, 1.0)
    b, h, w, _ = x0.shape
    dt = x0.dtype

    if (int(grid_rot) > 0) != (int(grid_trans) > 0):
        raise ValueError(
            "grid search needs BOTH grid_rot and grid_trans > 0 (got "
            f"grid_rot={int(grid_rot)}, grid_trans={int(grid_trans)}); "
            "setting only one would silently drop the grid and run the "
            "strictly weaker random-only search")
    parts = []
    if int(grid_rot) > 0 and int(grid_trans) > 0:
        rots = _grid_axis(int(grid_rot), max_rot, dt)
        txs = _grid_axis(int(grid_trans), max_trans * w, dt)
        tys = _grid_axis(int(grid_trans), max_trans * h, dt)
        rr, xx, yy = jnp.meshgrid(rots, txs, tys, indexing="ij")
        grid = jnp.stack([rr.ravel(), xx.ravel(), yy.ravel()], -1)  # [K,3]
        parts.append(jnp.broadcast_to(grid[:, None, :],
                                      (grid.shape[0], b, 3)))
    if int(candidates) > 0:
        if key is None:
            raise ValueError("random spatial search needs an explicit key")
        u = jax.random.uniform(key, (int(candidates), b, 3), dtype=dt,
                               minval=-1.0, maxval=1.0)
        # scalar-literal scales (see _grid_axis)
        parts.append(jnp.stack([u[..., 0] * float(max_rot),
                                u[..., 1] * float(max_trans * w),
                                u[..., 2] * float(max_trans * h)], -1))
    if not parts:
        raise ValueError(
            "empty spatial search: set candidates > 0 and/or both "
            "grid_rot and grid_trans > 0")
    cand = jnp.concatenate(parts, axis=0)

    def step(carry, p):  # p [B,3]
        best_x, best_loss, best_succ, best_p = carry
        xa = affine_warp(x0, p[:, 0], p[:, 1], p[:, 2])
        xa = jnp.clip(xa, 0.0, 1.0)
        logits = logits_fn(xa)
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, y_true[:, None], axis=-1)[:, 0]
        ce = ce.astype(dt)
        succ = jnp.argmax(logits, -1) != y_true
        # a first success always beats any failure; otherwise higher CE wins
        better = (succ & ~best_succ) | ((succ == best_succ) & (ce > best_loss))
        sel = better[:, None, None, None]
        best_x = jnp.where(sel, xa, best_x)
        best_loss = jnp.where(better, ce, best_loss)
        best_p = jnp.where(better[:, None], p, best_p)
        best_succ = best_succ | succ
        return (best_x, best_loss, best_succ, best_p), None

    init = (
        x0,
        jnp.full((b,), -jnp.inf, dtype=dt),
        jnp.zeros((b,), dtype=jnp.bool_),
        jnp.zeros((b, 3), dtype=dt),
    )
    (best_x, _, best_succ, best_p), _ = lax.scan(step, init, cand)
    return SpatialResult(x_adv=best_x, success=best_succ, params=best_p)
