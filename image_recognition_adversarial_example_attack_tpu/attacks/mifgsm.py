"""MI-FGSM: momentum iterative FGSM (Dong et al., CVPR 2018).

Beyond-reference capability: the reference's black-box studies
(blackbox_transfer.py, transferability_attack.py) use plain FGSM/PGD/CW;
momentum-accumulated gradients are the standard transferability booster for
exactly those sweeps.  Update rule per step:

    g_t = mu * g_{t-1} + grad / ||grad||_1
    x_t = clip01( project_eps( x_{t-1} + alpha * sign(g_t) ) )

TPU design: like PGD, the whole loop is one ``lax.scan`` inside a single
compiled program; the momentum buffer rides the scan carry.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .api import LogitsFn, input_grad
from .pgd import pgd_step


def mifgsm_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    mu: float = 1.0,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1].

    With ``y_target`` the momentum accumulates the DESCENT direction of the
    target class's CE (targeted MI-FGSM).
    """
    x_orig = x
    g0 = jnp.zeros_like(x)
    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0

    def body(carry, _):
        x_adv, g = carry
        grad = direction * input_grad(logits_fn, x_adv, y_grad)
        # per-sample L1 normalization (batch dims decoupled)
        l1 = jnp.sum(jnp.abs(grad), axis=(1, 2, 3), keepdims=True)
        g = mu * g + grad / jnp.maximum(l1, 1e-12)
        x_next = pgd_step(x_adv, g, x_orig, eps, alpha)
        return (x_next, g), None

    (x_adv, _), _ = lax.scan(body, (x, g0), None, length=int(steps))
    return x_adv
