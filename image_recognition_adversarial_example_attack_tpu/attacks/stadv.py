"""Spatially-transformed adversarial examples (stAdv; Xiao et al., ICLR 2018).

Instead of perturbing pixel *values* inside an Lp ball, stAdv perturbs pixel
*positions*: a per-pixel flow field ``f [B,H,W,2]`` warps the image through
differentiable bilinear sampling, and the attack minimizes

    L_adv(warp(x, f), y)  +  tau * L_flow(f)

where ``L_adv`` is the CW margin loss and ``L_flow`` the isotropic
neighbor-difference smoothness of the flow (paper eq. 4), so the result is
a *geometric* adversarial example — visually near-identical, yet outside
every Lp threat model the rest of the zoo covers (fgsm/pgd Linf, cw/fab L2,
ead L1).  The reference has no spatial attack (its zoo is
attack.py:37-140: FGSM/PGD/CW only) — beyond-reference; completes the
non-Lp axis next to the physical patch (attacks/patch.py).

TPU design — the paper solves each image with scipy L-BFGS on the host.
Here the whole attack is ONE XLA program: Adam on the flow field inside a
single ``lax.scan`` with static step count, the bilinear warp is a pair of
gathers the compiler vectorizes (no host round trips, batch dimension
shards untouched on the 'data' mesh axis), and per-sample best tracking
(smallest flow-smoothness among successful iterates, evaluated pre-update
exactly like attacks/cw.py) rides in the scan carry.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from .api import LogitsFn
from .cw import _margin_and_success


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Differentiable bilinear warp of ``x [B,H,W,C]`` by ``flow [B,H,W,2]``.

    ``flow[..., 0]`` is the row (dy) and ``flow[..., 1]`` the column (dx)
    displacement in pixel units: output pixel (i, j) samples input position
    (i + dy, j + dx), border-clamped (the paper's out-of-image handling).
    Zero flow is exactly the identity.  Gradients flow to BOTH the image
    and the flow field (the attack differentiates w.r.t. the flow; EOT /
    adaptive compositions differentiate w.r.t. the image).
    """
    b, h, w, _ = x.shape
    ii = jnp.arange(h, dtype=flow.dtype)[:, None]
    jj = jnp.arange(w, dtype=flow.dtype)[None, :]
    sy = jnp.clip(ii + flow[..., 0], 0.0, h - 1.0)
    sx = jnp.clip(jj + flow[..., 1], 0.0, w - 1.0)

    y0 = jnp.clip(jnp.floor(sy), 0.0, h - 2.0)
    x0 = jnp.clip(jnp.floor(sx), 0.0, w - 2.0)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather_one(img, yi, xi):
        return img[yi, xi]  # [H,W] int maps -> [H,W,C] gather

    def corner(dy, dx):
        return jax.vmap(gather_one)(x, y0i + dy, x0i + dx)

    v00, v01 = corner(0, 0), corner(0, 1)
    v10, v11 = corner(1, 0), corner(1, 1)
    wy = wy[..., None]
    wx = wx[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def flow_smoothness(flow: jnp.ndarray) -> jnp.ndarray:
    """Paper eq. 4 per image -> [B]: for each pixel, the root-sum-square
    of the (du, dv) difference to each in-image neighbor, summed.  Forward
    differences along H and W count every neighbor pair once per
    direction; 1e-12 keeps the sqrt's gradient defined at zero flow (the
    attack's own starting point — the VJP dy/sqrt(dy^2+eps) is bounded by
    1 for any eps>0, so this is a well-posed choice, not a fudge)."""
    dy = flow[:, 1:] - flow[:, :-1]
    dx = flow[:, :, 1:] - flow[:, :, :-1]
    sy = jnp.sum(jnp.sqrt(jnp.sum(dy * dy, -1) + 1e-12), axis=(1, 2))
    sx = jnp.sum(jnp.sqrt(jnp.sum(dx * dx, -1) + 1e-12), axis=(1, 2))
    return sy + sx


class StAdvResult(NamedTuple):
    x_adv: jnp.ndarray     # [B,H,W,C] in [0,1]
    success: jnp.ndarray   # [B] bool — ever-misclassified at some iterate
    flow: jnp.ndarray      # [B,H,W,2] the best (or final) flow field


def stadv_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    steps: int = 200,
    lr: float = 0.01,
    tau: float = 0.05,
    kappa: float = 0.0,
    y_target: Optional[jnp.ndarray] = None,
) -> StAdvResult:
    """Optimize a flow field so ``flow_warp(x, flow)`` fools the model.

    Untargeted by default (CW margin vs the true class); pass ``y_target``
    for the targeted variant (paper section 4).  Returns the warp under
    the best flow: the successful iterate with minimal ``flow_smoothness``
    (geometric analogue of CW's min-L2 tracking), else the final iterate.

    ``tau`` weights the smoothness penalty PER NEIGHBOR PAIR (the paper's
    raw eq.-4 sum divided by the pair count): the paper tuned its tau on
    28-32px images, where the sum has ~2k terms — at 224^2 the same sum
    has ~100k terms and a fixed tau would drown the one-scalar-per-image
    margin entirely.  Normalizing makes tau resolution-free, so one
    default serves the whole zoo (16px test models to 224px ImageNet).
    """
    targeted = y_target is not None
    y_cmp = y_target if targeted else y_true
    x0 = jnp.clip(x, 0.0, 1.0)
    b, h, w, _ = x0.shape

    flow0 = jnp.zeros((b, h, w, 2), dtype=x0.dtype)
    optimizer = optax.adam(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
    opt_state0 = optimizer.init(flow0)

    best_flow0 = flow0
    best_cost0 = jnp.full((b,), jnp.inf, dtype=x0.dtype)
    best_success0 = jnp.zeros((b,), dtype=jnp.bool_)

    n_pairs = float(h * (w - 1) + w * (h - 1))

    def objective(flow):
        x_adv = jnp.clip(flow_warp(x0, flow), 0.0, 1.0)
        logits = logits_fn(x_adv)
        f, success = _margin_and_success(logits, y_cmp, kappa, targeted, y_true)
        smooth = flow_smoothness(flow) / n_pairs
        return jnp.sum(f + tau * smooth), (f, success, smooth)

    grad_fn = jax.grad(objective, has_aux=True)

    def step(carry, _):
        flow, opt_state, best_flow, best_cost, best_success = carry
        g, (f, success, smooth) = grad_fn(flow)
        # pre-update best tracking (the cw.py convention): among successes
        # keep the smoothest flow; a first success always beats a failure
        cost = smooth
        better = success & ((cost < best_cost) | (~best_success))
        sel = better[:, None, None, None]
        best_flow = jnp.where(sel, flow, best_flow)
        best_cost = jnp.where(better, cost, best_cost)
        best_success = best_success | success
        updates, opt_state = optimizer.update(g, opt_state, flow)
        flow = optax.apply_updates(flow, updates)
        return (flow, opt_state, best_flow, best_cost, best_success), None

    (flow_fin, _, best_flow, _, best_success), _ = lax.scan(
        step, (flow0, opt_state0, best_flow0, best_cost0, best_success0),
        None, length=int(steps))

    # final iterate joins the pool (the EAD review fix generalized: a
    # sample first fooled by the last update must not be reported missed)
    _, (_, success_fin, smooth_fin) = objective(flow_fin)
    take_fin = success_fin & ~best_success
    sel = take_fin[:, None, None, None]
    flow_out = jnp.where(sel, flow_fin, best_flow)
    success = best_success | success_fin
    x_adv = jnp.clip(flow_warp(x0, flow_out), 0.0, 1.0)
    return StAdvResult(x_adv=x_adv, success=success, flow=flow_out)
