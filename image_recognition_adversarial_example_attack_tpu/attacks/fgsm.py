"""FGSM: single-step sign-gradient attack.

Semantics parity with reference attack.py:20-34:
``x_adv = clip01(x + eps * sign(d CE/dx))``.

TPU design: forward, backward, sign step and clip are one XLA program; the
sign step fuses into the conv backward epilogue under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from .api import LogitsFn, input_grad


def fgsm_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1].

    With ``y_target`` the step DESCENDS the target class's CE (targeted
    mode, a beyond-reference extension; the reference only targets CW).
    """
    if y_target is not None:
        grad = input_grad(logits_fn, x, y_target)
        x_adv = x - eps * jnp.sign(grad).astype(x.dtype)
    else:
        grad = input_grad(logits_fn, x, y_true)
        x_adv = x + eps * jnp.sign(grad).astype(x.dtype)
    return jnp.clip(x_adv, 0.0, 1.0)
