"""JSMA: Jacobian-based Saliency Map Attack (Papernot et al., EuroS&P 2016).

The L0 threat model — change as FEW features as possible, each by a lot —
completing the zoo's norm coverage (Linf: fgsm/pgd/apgd, L2: cw/pgd_l2/
fab/square_l2, L1: ead, flow: stadv, patch: patch; the reference ships
Linf + L2 only, attack.py).

Greedy single-feature variant: each step scores every (pixel, channel)
feature by the Papernot saliency — the product of "helps the target
class" and "hurts the other classes" — in BOTH directions, flips the
single best feature to its bound (theta=1), bans it, and repeats up to
``steps`` times (the L0 budget).  The original's feature-PAIR search is
O(N^2) in the 150,528 input features at 224^2 and was only ever run on
MNIST; the single-feature greedy is the standard scalable form (as in
foolbox), documented deviation.

TPU design: the classic implementation is a Python loop with per-step
host argmaxes over a shrinking search domain.  Here the WHOLE greedy
search is one ``lax.scan``: per step two fused backwards (d z_target/dx
and d sum(z)/dx), batched saliency maps, a per-sample argmax over the
flat feature axis, and a one-hot scatter update; the ban list is a [B,N]
mask rides the carry; finished samples freeze via masked ``where``.  No
shrinking shapes, no host trips — batch-parallel greedy, which the
sequential original cannot do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def jsma_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    steps: int = 100,
    theta: float = 1.0,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch differing from x in at most
    ``steps`` features, each moved by ``theta`` (clipped to [0,1]).

    Targeted toward ``y_target``; default target is the clean runner-up
    class (the standard untargeted reduction — reaching the runner-up is
    the easiest misclassification).  A sample freezes as soon as the
    model predicts its target.
    """
    b = x.shape[0]
    n = x.shape[1] * x.shape[2] * x.shape[3]
    logits_clean = logits_fn(x)
    if y_target is None:
        # runner-up: top class that is not y_true
        masked = jnp.where(
            jax.nn.one_hot(y_true, logits_clean.shape[-1], dtype=bool),
            -jnp.inf, logits_clean)
        y_target = jnp.argmax(masked, axis=-1)

    def target_sum(xx):
        z = logits_fn(xx)
        return jnp.sum(jnp.take_along_axis(z, y_target[:, None], axis=-1))

    def all_sum(xx):
        return jnp.sum(logits_fn(xx))

    def body(carry, _):
        x_adv, banned, done = carry
        grad_t = jax.grad(target_sum)(x_adv).reshape(b, n)
        grad_all = jax.grad(all_sum)(x_adv).reshape(b, n)
        grad_o = grad_all - grad_t
        x_flat = x_adv.reshape(b, n)

        # Papernot saliency, both directions, with room-to-move checks
        can_up = x_flat < 1.0
        can_dn = x_flat > 0.0
        sal_up = jnp.where((grad_t > 0) & (grad_o < 0) & can_up & ~banned,
                           grad_t * (-grad_o), 0.0)
        sal_dn = jnp.where((grad_t < 0) & (grad_o > 0) & can_dn & ~banned,
                           (-grad_t) * grad_o, 0.0)

        best_up = jnp.argmax(sal_up, axis=-1)                      # [B]
        best_dn = jnp.argmax(sal_dn, axis=-1)
        val_up = jnp.take_along_axis(sal_up, best_up[:, None], -1)[:, 0]
        val_dn = jnp.take_along_axis(sal_dn, best_dn[:, None], -1)[:, 0]
        go_up = val_up >= val_dn
        idx = jnp.where(go_up, best_up, best_dn)                   # [B]
        delta = jnp.where(go_up, theta, -theta)
        # no admissible feature (both maxima zero) -> stall, change nothing
        viable = jnp.maximum(val_up, val_dn) > 0.0
        move = jnp.where(viable & ~done, delta, 0.0)

        x_new = jnp.clip(
            x_flat.at[jnp.arange(b), idx].add(move), 0.0, 1.0
        ).reshape(x_adv.shape)
        banned = banned.at[jnp.arange(b), idx].set(
            banned[jnp.arange(b), idx] | (viable & ~done))
        pred = jnp.argmax(logits_fn(x_new), axis=-1)
        return (x_new, banned, done | (pred == y_target)), None

    done0 = jnp.argmax(logits_clean, axis=-1) == y_target
    (x_adv, _, _), _ = lax.scan(
        body, (x, jnp.zeros((b, n), bool), done0), None, length=int(steps))
    return x_adv
