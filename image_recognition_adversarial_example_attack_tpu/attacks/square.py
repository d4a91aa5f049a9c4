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
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1], gradient-free.

    Minimizes the margin loss by random square search inside the L-inf
    eps-ball; returns the best iterate found (misclassified where the
    margin went negative).
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
        return (x_best, loss_best, key), None

    (x_best, _, _), _ = lax.scan(body, (x_best, loss_best, key), sides)
    return x_best
