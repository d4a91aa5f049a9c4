"""Detector-aware adaptive attack: fool the classifier AND stay under the
detector's threshold.

Beyond-reference capability.  The reference evaluates its feature-
statistics detector (defense_experiments.py:221-285) only against
detector-OBLIVIOUS attacks, so its reported ``detector_attack_success``
("bypass") rates measure an attacker that does not know a detector
exists.  The standard of evidence for detectors (Carlini & Wagner,
AISec 2017, "Adversarial Examples Are Not Easily Detected") is the
adaptive attacker that optimizes the joint objective

    maximize   CE(f(x_adv), y)  -  lam * relu(score(x_adv) - margin * tau)

i.e. gradient ascent on misclassification with a hinge penalty that
activates as soon as the detector score approaches its calibrated
threshold ``tau`` (``margin < 1`` keeps a safety gap below it).  All of
this framework's detector scores (feature statistics, feature squeezing
via the STE-differentiable squeezers, Mahalanobis) are differentiable,
so no surrogate is needed.

TPU design: identical fused-scan shape as attacks/pgd.py — the combined
forward (model + detector tap) + backward + sign step + ball projection +
clip is ONE ``lax.scan`` inside one XLA program; the detector threshold
is a TRACED scalar, so the same compiled program serves every calibration.
With ``lam == 0`` the trace degenerates to exactly ``pgd_linf_attack``
(bitwise — guarded by tests/test_detector_aware.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn, cross_entropy_sum, input_grad
from .pgd import pgd_step

# x01 [B,H,W,C] -> [B] detector score (higher = more adversarial-looking)
ScoreFn = Callable[[jnp.ndarray], jnp.ndarray]


def detector_aware_pgd(
    logits_fn: LogitsFn,
    score_fn: ScoreFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps,
    alpha: float,
    steps: int,
    key: jax.Array,
    threshold,
    lam: float = 1.0,
    margin: float = 0.9,
    random_start: bool = True,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1], L-inf eps-ball.

    Sign-gradient ascent on ``CE - lam * relu(score - margin*threshold)``.
    ``threshold`` may be a traced scalar (the calibrated detector
    threshold); ``lam``/``margin`` are static.  ``lam == 0`` short-circuits
    to the plain CE gradient, making the program identical to
    ``pgd_linf_attack`` (same key consumption, same update arithmetic).
    """
    x_orig = x
    if random_start:
        noise = jax.random.uniform(key, x.shape, x.dtype, minval=-eps, maxval=eps)
        x_adv = jnp.clip(x_orig + noise, 0.0, 1.0)
    else:
        x_adv = x_orig

    thr = jnp.asarray(threshold, jnp.float32) * jnp.float32(margin)

    if lam == 0.0:
        def grad_fn(xx):
            return input_grad(logits_fn, xx, y_true)
    else:
        def objective(xx):
            ce = cross_entropy_sum(logits_fn(xx), y_true)
            pen = jnp.sum(jax.nn.relu(score_fn(xx) - thr))
            return ce - jnp.float32(lam) * pen

        grad_fn = jax.grad(objective)

    def body(x_adv, _):
        return pgd_step(x_adv, grad_fn(x_adv), x_orig, eps, alpha), None

    x_adv, _ = lax.scan(body, x_adv, None, length=int(steps))
    return x_adv


def detector_aware_fgsm(
    logits_fn: LogitsFn,
    score_fn: ScoreFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps,
    threshold,
    lam: float = 1.0,
    margin: float = 0.9,
) -> jnp.ndarray:
    """Single full-eps sign step on the joint objective (the FGSM cell of a
    detector-aware grid; reference FGSM semantics at attack.py:20-34 with
    the detector hinge added)."""
    return detector_aware_pgd(
        logits_fn, score_fn, x, y_true,
        eps=eps, alpha=eps, steps=1,
        key=jax.random.PRNGKey(0),  # unused
        threshold=threshold, lam=lam, margin=margin, random_start=False,
    )
