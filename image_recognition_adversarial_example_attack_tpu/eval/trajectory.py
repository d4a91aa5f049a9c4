"""Attack-trajectory capture as stacked scan outputs.

The reference replays PGD step-by-step from Python, logging the probability
of the original class and of class 805 plus the L2 perturbation after every
step (visualized_attacks.py:323-382).  Here the replay is a single
``lax.scan`` whose stacked outputs are the whole trajectory — one compile,
``steps+1`` probability rows out, zero per-step host syncs.

Known reference quirk (not reproduced): its loop records the random-start
point twice and never records the final iterate (the update happens after
the record inside the same iteration).  This implementation records
``x_start, x_1, ..., x_steps`` — one row per distinct iterate.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..attacks.api import LogitsFn, input_grad
from ..attacks.pgd import pgd_step


class Trajectory(NamedTuple):
    probs: jnp.ndarray  # [steps+1, n_tracked] probabilities of tracked classes
    l2: jnp.ndarray     # [steps+1] L2 norm of (x_adv - x_orig)
    x_adv: jnp.ndarray  # final adversarial batch


def pgd_trajectory(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    track_classes: Sequence[int] = (),
    random_start: bool = True,
) -> Trajectory:
    """Track class probabilities of image 0 along a PGD run.

    ``track_classes`` defaults to (y_true[0], 805) to match the reference's
    original-vs-soccer-ball plot (visualized_attacks.py:341).
    """
    x_orig = x
    if random_start:
        noise = jax.random.uniform(key, x.shape, x.dtype, minval=-eps, maxval=eps)
        x_adv0 = jnp.clip(x_orig + noise, 0.0, 1.0)
    else:
        x_adv0 = x_orig

    tracked = jnp.asarray(list(track_classes), jnp.int32) if track_classes else jnp.stack(
        [y_true[0].astype(jnp.int32), jnp.asarray(805, jnp.int32)]
    )

    def observe(x_adv):
        probs = jax.nn.softmax(logits_fn(x_adv), axis=-1)[0]
        l2 = jnp.sqrt(jnp.sum(jnp.square(x_adv - x_orig)))
        return probs[tracked], l2

    def body(x_adv, _):
        grad = input_grad(logits_fn, x_adv, y_true)
        x_next = pgd_step(x_adv, grad, x_orig, eps, alpha)
        return x_next, observe(x_next)

    first = observe(x_adv0)
    x_final, (probs_rest, l2_rest) = lax.scan(body, x_adv0, None, length=int(steps))
    probs = jnp.concatenate([first[0][None], probs_rest], axis=0)
    l2 = jnp.concatenate([first[1][None], l2_rest], axis=0)
    return Trajectory(probs=probs, l2=l2, x_adv=x_final)


def fgsm_trajectory(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    track_classes: Sequence[int] = (),
) -> Trajectory:
    """Two-point trajectory (clean, FGSM point), same record layout."""
    from ..attacks.fgsm import fgsm_attack

    tracked = jnp.asarray(list(track_classes), jnp.int32) if track_classes else jnp.stack(
        [y_true[0].astype(jnp.int32), jnp.asarray(805, jnp.int32)]
    )

    def observe(x_adv):
        probs = jax.nn.softmax(logits_fn(x_adv), axis=-1)[0]
        l2 = jnp.sqrt(jnp.sum(jnp.square(x_adv - x)))
        return probs[tracked], l2

    x_adv = fgsm_attack(logits_fn, x, y_true, eps=eps)
    p0, l0 = observe(x)
    p1, l1 = observe(x_adv)
    return Trajectory(
        probs=jnp.stack([p0, p1]),
        l2=jnp.stack([l0, l1]),
        x_adv=x_adv,
    )
