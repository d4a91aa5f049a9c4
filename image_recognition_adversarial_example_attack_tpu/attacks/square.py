"""Square Attack (L-inf): score-based BLACK-BOX random search
(Andriushchenko et al., ECCV 2020).

Beyond-reference capability class: the reference's "black-box" study is
transfer-only (white-box gradients on a surrogate); Square needs NO
gradients at all — one forward per iteration, accept a random square
perturbation when the margin loss improves.  This is the standard
query-efficient baseline for true black-box robustness.

TPU design: the whole random search is ONE ``lax.scan`` at one forward
per step (no backward — ~2x the step rate of PGD):

- the square-size schedule is data-independent -> precomputed host-side
  and fed as the scan ``xs`` (side length per step);
- the random square is applied with iota masks from traced offsets
  (static shapes, no dynamic slicing);
- accept/reject and per-sample bookkeeping are masked ``where`` updates;
  every sample in the batch searches independently under one program.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def square_schedule(steps: int, h: int, w: int, p_init: float = 0.1) -> np.ndarray:
    """Per-step square side lengths (the paper's piecewise p-schedule:
    p halves at fractions 0.001/0.005/0.02/0.05/0.1/0.2/0.4/0.6/0.8 of the
    query budget — the official implementation's i/n thresholds
    10/50/200/500/1000/2000/4000/6000/8000 out of 10000)."""
    breaks = np.array([0.001, 0.005, 0.02, 0.05, 0.1, 0.2, 0.4, 0.6, 0.8])
    sides = np.empty((steps,), np.int32)
    for i in range(steps):
        frac = i / max(1, steps)
        n_halvings = int(np.searchsorted(breaks, frac, side="right"))
        p = p_init / (2**n_halvings)
        side = int(round(np.sqrt(p * h * w)))
        sides[i] = int(np.clip(side, 1, min(h, w)))
    return sides


def _margin_loss(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """logit_y - max_{k != y} logit_k  (negative == misclassified)."""
    b, k = logits.shape
    correct = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    masked = logits - 1e9 * jax.nn.one_hot(y, k, dtype=logits.dtype)
    return correct - jnp.max(masked, axis=-1)


def square_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    steps: int = 1000,
    key: jax.Array,
    p_init: float = 0.1,
    return_history: bool = False,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1], gradient-free.

    Minimizes the margin loss by random square search inside the L-inf
    eps-ball; returns the best iterate found (misclassified where the
    margin went negative).  With ``return_history`` also returns the
    per-step success mask [steps, B] (margin < 0 after that step's
    query) — the query-efficiency curve's raw material, stacked by the
    scan at zero extra forwards.
    """
    b, h, w, c = x.shape
    x_orig = x

    def clip_ball(z):
        return jnp.clip(jnp.clip(z, x_orig - eps, x_orig + eps), 0.0, 1.0)

    # init: full-height vertical stripes of ±eps per (column, channel);
    # the clean point joins the comparison set so the attack can never
    # return an iterate WORSE than its input
    key, k0 = jax.random.split(key)
    stripes = jax.random.rademacher(k0, (b, 1, w, c), x.dtype) * eps
    x_init = clip_ball(x_orig + stripes)
    loss_init = _margin_loss(logits_fn(x_init), y_true)
    loss_clean = _margin_loss(logits_fn(x_orig), y_true)
    better = loss_init < loss_clean
    x_best = jnp.where(better[:, None, None, None], x_init, x_orig)
    loss_best = jnp.minimum(loss_init, loss_clean)

    rows = lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    sides = jnp.asarray(square_schedule(int(steps), h, w, p_init))

    def body(carry, side):
        x_best, loss_best, key = carry
        key, kr, kc, ks = jax.random.split(key, 4)
        r0 = jax.random.randint(kr, (b, 1, 1, 1), 0, h - side + 1)
        c0 = jax.random.randint(kc, (b, 1, 1, 1), 0, w - side + 1)
        mask = ((rows >= r0) & (rows < r0 + side)
                & (cols >= c0) & (cols < c0 + side))  # [B,H,W,1]
        sign = jax.random.rademacher(ks, (b, 1, 1, c), x.dtype) * eps

        # candidate: overwrite the square's delta with ±eps per channel
        cand = jnp.where(mask, clip_ball(x_orig + sign), x_best)
        loss_cand = _margin_loss(logits_fn(cand), y_true)
        accept = loss_cand < loss_best
        x_best = jnp.where(accept[:, None, None, None], cand, x_best)
        loss_best = jnp.minimum(loss_best, loss_cand)
        return (x_best, loss_best, key), loss_best < 0.0

    (x_best, _, _), succ_hist = lax.scan(
        body, (x_best, loss_best, key), sides)
    if return_history:
        return x_best, succ_hist
    return x_best


def _bump_window(rows, cols, r0, c0, side):
    """Unit-L2 'pseudo-Gaussian' bump on an [B,H,W,1] window.

    Concentric Chebyshev shells weighted 1/(k+1)^2 around the window
    center — the structural shape of the paper's eta perturbation
    (peaked center, decaying rings), built entirely from traced iota
    arithmetic so the window side can ride the scan as data.
    """
    center_r = r0 + (side - 1) / 2.0
    center_c = c0 + (side - 1) / 2.0
    cheb = jnp.maximum(jnp.abs(rows - center_r), jnp.abs(cols - center_c))
    ring = jnp.floor(cheb)  # 0 for the center cell(s), 1 for the next shell..
    mask = ((rows >= r0) & (rows < r0 + side)
            & (cols >= c0) & (cols < c0 + side))
    w = jnp.where(mask, 1.0 / jnp.square(1.0 + ring), 0.0)
    nrm = jnp.sqrt(jnp.sum(jnp.square(w), axis=(1, 2, 3), keepdims=True))
    return w / (nrm + 1e-12), mask


def square_l2_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    steps: int = 1000,
    key: jax.Array,
    p_init: float = 0.1,
    return_history: bool = False,
) -> jnp.ndarray:
    """Square Attack, L2 threat model — gradient-free random search that
    REDISTRIBUTES a fixed L2 mass between square windows (Andriushchenko
    et al. 2020, Alg. 3 structure).

    Per step: pick windows W1 and W2; free W2's mass; refill W1 with a
    pseudo-Gaussian bump (mixed with the old W1 direction, per-channel
    random sign) scaled to spend the freed + unused budget, so
    ``||delta||_2 <= eps`` holds by construction before the box clip;
    accept when the margin loss improves.  One ``lax.scan``, one forward
    per step, like the L-inf variant.  The bump profile and the
    bump-grid init are structural matches to the paper (air-gapped
    rebuild), not line-for-line transcriptions; the p-schedule and
    greedy accept rule are the paper's.
    """
    b, h, w, c = x.shape
    x_orig = x
    axes = (1, 2, 3)

    def clip01(z):
        return jnp.clip(z, 0.0, 1.0)

    rows = lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1).astype(x.dtype)
    cols = lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2).astype(x.dtype)

    # --- init: a grid of bumps with independent random signs, scaled to
    # the full eps budget (the paper tiles its eta over the image) ---
    key, k0 = jax.random.split(key)
    s0 = max(2, h // 5)
    n_gr = max(1, h // s0)
    n_gc = max(1, w // s0)
    sign0 = jax.random.rademacher(k0, (b, n_gr, n_gc, c), x.dtype)
    delta0 = jnp.zeros_like(x)
    for gi in range(n_gr):
        for gj in range(n_gc):
            bump, _ = _bump_window(rows, cols,
                                   jnp.asarray(gi * s0, x.dtype),
                                   jnp.asarray(gj * s0, x.dtype),
                                   jnp.asarray(s0, x.dtype))
            delta0 = delta0 + bump * sign0[:, gi, gj][:, None, None, :]
    d_nrm = jnp.sqrt(jnp.sum(jnp.square(delta0), axis=axes, keepdims=True))
    delta0 = delta0 * eps / (d_nrm + 1e-12)

    loss_clean = _margin_loss(logits_fn(x_orig), y_true)
    x_init = clip01(x_orig + delta0)
    loss_init = _margin_loss(logits_fn(x_init), y_true)
    better = loss_init < loss_clean
    delta = jnp.where(better[:, None, None, None], delta0,
                      jnp.zeros_like(delta0))
    loss_best = jnp.minimum(loss_init, loss_clean)

    sides = np.maximum(square_schedule(int(steps), h, w, p_init), 2)

    def body(carry, side):
        delta, loss_best, key = carry
        side_f = side.astype(x.dtype)
        key, kr1, kc1, kr2, kc2, ks = jax.random.split(key, 6)
        hi = (h - side + 1).astype(jnp.int32)
        wi = (w - side + 1).astype(jnp.int32)
        r1 = jax.random.randint(kr1, (b, 1, 1, 1), 0, hi).astype(x.dtype)
        c1 = jax.random.randint(kc1, (b, 1, 1, 1), 0, wi).astype(x.dtype)
        r2 = jax.random.randint(kr2, (b, 1, 1, 1), 0, hi).astype(x.dtype)
        c2 = jax.random.randint(kc2, (b, 1, 1, 1), 0, wi).astype(x.dtype)
        bump, m1 = _bump_window(rows, cols, r1, c1, side_f)
        _, m2 = _bump_window(rows, cols, r2, c2, side_f)
        m2_only = m2 & ~m1

        old1 = jnp.where(m1, delta, 0.0)
        old1_sq = jnp.sum(jnp.square(old1), axis=axes, keepdims=True)
        freed_sq = jnp.sum(jnp.square(jnp.where(m2_only, delta, 0.0)),
                           axis=axes, keepdims=True)
        total_sq = jnp.sum(jnp.square(delta), axis=axes, keepdims=True)
        unused_sq = jnp.maximum(eps * eps - total_sq, 0.0)

        sign = jax.random.rademacher(ks, (b, 1, 1, c), x.dtype)
        direction = jnp.where(
            m1, bump * sign + old1 / (jnp.sqrt(old1_sq) + 1e-10), 0.0)
        dir_nrm = jnp.sqrt(jnp.sum(jnp.square(direction), axis=axes,
                                   keepdims=True))
        budget = jnp.sqrt(old1_sq + freed_sq + unused_sq)
        new1 = direction / (dir_nrm + 1e-12) * budget

        cand_delta = jnp.where(m1, new1,
                               jnp.where(m2_only, 0.0, delta))
        cand = clip01(x_orig + cand_delta)
        loss_cand = _margin_loss(logits_fn(cand), y_true)
        accept = loss_cand < loss_best
        delta = jnp.where(accept[:, None, None, None], cand_delta, delta)
        loss_best = jnp.minimum(loss_best, loss_cand)
        return (delta, loss_best, key), loss_best < 0.0

    (delta, _, _), succ_hist = lax.scan(body, (delta, loss_best, key),
                                        jnp.asarray(sides))
    if return_history:
        return clip01(x_orig + delta), succ_hist
    return clip01(x_orig + delta)
