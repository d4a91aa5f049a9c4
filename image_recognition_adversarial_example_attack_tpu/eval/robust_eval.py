"""AutoAttack-lite: worst-case robust accuracy over complementary attacks.

Beyond-reference capability: the standard robust-accuracy protocol
(AutoAttack, Croce & Hein 2020) ensembles attacks with different failure
modes — a strong white-box attack, a gradient-free one (which
penetrates gradient masking), and a minimal-norm one whose examples count
only when they land INSIDE the eps ball (AutoAttack uses FAB there).
This is its TPU-shaped core: APGD-CE (attacks/apgd.py) + Square
(attacks/square.py) + DeepFool-in-ball (attacks/deepfool.py), composed
INSIDE one traceable function, with per-sample worst-case selection as
masked ``where`` updates.

Note a deliberate static-shape trade-off: Square runs on the full batch
rather than only on APGD's survivors (data-dependent batch shapes cannot
compile); at typical survivor rates the wasted forwards are a small price
for keeping the whole evaluation one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..attacks.api import LogitsFn
from ..attacks.apgd import apgd_ce_attack
from ..attacks.square import square_attack


class RobustEvalResult(NamedTuple):
    x_adv: jnp.ndarray        # per-sample worst-case adversarial example
    success: jnp.ndarray      # [B] bool: misclassified by any attack
    success_apgd: jnp.ndarray
    success_square: jnp.ndarray
    success_deepfool: jnp.ndarray  # fooled AND the iterate is in the eps ball


def autoattack_lite(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    key: jax.Array,
    apgd_steps: int = 100,
    square_steps: int = 1000,
    deepfool_steps: int = 30,
) -> RobustEvalResult:
    """[B,H,W,C] in [0,1] -> worst-case adversarial batch + success masks.

    Per sample, returns the first successful attack's iterate (APGD
    preferred, then Square, then in-ball DeepFool), else APGD's best-loss
    iterate.  Robust accuracy = ``1 - mean(success)`` over
    correctly-classified clean samples.  DeepFool is unconstrained
    minimal-norm: its success counts only when the found iterate lies in
    the L-inf eps ball (the role FAB plays in full AutoAttack).
    """
    from ..attacks.deepfool import deepfool_attack

    k_apgd, k_square = jax.random.split(key)

    x_apgd = apgd_ce_attack(logits_fn, x, y_true, eps=eps, steps=apgd_steps,
                            key=k_apgd)
    succ_apgd = jnp.argmax(logits_fn(x_apgd), -1) != y_true

    x_square = square_attack(logits_fn, x, y_true, eps=eps, steps=square_steps,
                             key=k_square)
    succ_square = jnp.argmax(logits_fn(x_square), -1) != y_true

    x_df = deepfool_attack(logits_fn, x, steps=deepfool_steps)
    in_ball = jnp.max(jnp.abs(x_df - x), axis=(1, 2, 3)) <= eps + 1e-6
    succ_df = (jnp.argmax(logits_fn(x_df), -1) != y_true) & in_ball

    pick_square = (~succ_apgd) & succ_square
    x_adv = jnp.where(pick_square[:, None, None, None], x_square, x_apgd)
    pick_df = (~succ_apgd) & (~succ_square) & succ_df
    x_adv = jnp.where(pick_df[:, None, None, None], x_df, x_adv)
    return RobustEvalResult(
        x_adv=x_adv,
        success=succ_apgd | succ_square | succ_df,
        success_apgd=succ_apgd,
        success_square=succ_square,
        success_deepfool=succ_df,
    )


def robust_accuracy(result: RobustEvalResult, clean_correct: jnp.ndarray) -> float:
    """Fraction of clean-correct samples that resist EVERY attack.

    NaN when no sample is clean-correct (0/0 is undefined — returning 0
    would be indistinguishable from 'every clean-correct sample broke')."""
    cc = jnp.asarray(clean_correct, bool)
    n = int(jnp.sum(cc))
    if n == 0:
        return float("nan")
    return float(jnp.sum(cc & ~result.success) / n)
