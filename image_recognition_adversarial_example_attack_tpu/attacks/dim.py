"""DI-FGSM: diverse-input momentum iterative FGSM (Xie et al., CVPR 2019).

Beyond-reference capability for the black-box transfer studies
(reference blackbox_transfer.py / transferability_attack.py use plain
FGSM/PGD/CW): at every step the gradient is taken at a RANDOMLY
resized-and-padded copy of the current iterate (with probability ``p``),
which regularizes the perturbation against the source model's exact input
geometry and is the standard transferability booster alongside momentum
(MI-FGSM, attacks/mifgsm.py).

TPU design: the classic "resize to a random size then pad back" transform
has a data-dependent intermediate SHAPE, which XLA cannot compile.  It is
re-expressed statically with ``jax.image.scale_and_translate``: the output
shape stays [B,H,W,C] while the (traced) scale and translation place a
randomly shrunken copy at a random offset on a zero canvas — the same
transform, one fixed-shape program.  The whole attack is one ``lax.scan``
with the momentum buffer and PRNG key in the carry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn, input_grad
from .pgd import pgd_step


def diverse_input(x: jnp.ndarray, key: jax.Array, *, p: float = 0.5,
                  min_scale: float = 0.875) -> jnp.ndarray:
    """Random resize-and-pad with static output shape.

    With probability ``p``: scale the image by s ~ U[min_scale, 1) and
    place it at a uniform-random offset on a zero canvas of the original
    size (min_scale=0.875 matches the paper's 299->[299*0.875, 299) range
    rescaled to any resolution).  Otherwise: identity.  Differentiable in
    ``x`` (linear resample), so gradients chain back to the iterate.
    """
    b, h, w, c = x.shape
    k_apply, k_scale, k_tx, k_ty = jax.random.split(key, 4)
    s = jax.random.uniform(k_scale, (), jnp.float32, min_scale, 1.0)
    # random placement of the shrunken copy inside the canvas
    tx = jax.random.uniform(k_tx, (), jnp.float32, 0.0, 1.0) * (w * (1.0 - s))
    ty = jax.random.uniform(k_ty, (), jnp.float32, 0.0, 1.0) * (h * (1.0 - s))

    def transform(img):  # [H,W,C] -> [H,W,C]
        return jax.image.scale_and_translate(
            img, (h, w, c), (0, 1),
            jnp.array([s, s], jnp.float32),
            jnp.array([ty, tx], jnp.float32),
            method="linear",
        )

    transformed = jax.vmap(transform)(x)
    apply = jax.random.uniform(k_apply, (), jnp.float32) < p
    return jnp.where(apply, transformed, x)


def dim_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    mu: float = 1.0,
    diversity_prob: float = 0.5,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1].

    MI-FGSM update with the gradient evaluated at ``diverse_input`` of the
    iterate each step.  ``mu=0`` recovers plain DI-FGSM without momentum.
    """
    x_orig = x
    g0 = jnp.zeros_like(x)
    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0

    def body(carry, _):
        x_adv, g, k = carry
        k, k_div = jax.random.split(k)

        # gradient THROUGH the diversity transform back to the iterate
        # (the resample is linear, so this chains cleanly)
        def diversified_logits(z):
            return logits_fn(diverse_input(z, k_div, p=diversity_prob))

        grad = direction * input_grad(diversified_logits, x_adv, y_grad)
        l1 = jnp.sum(jnp.abs(grad), axis=(1, 2, 3), keepdims=True)
        g = mu * g + grad / jnp.maximum(l1, 1e-12)
        x_next = pgd_step(x_adv, g, x_orig, eps, alpha)
        return (x_next, g, k), None

    (x_adv, _, _), _ = lax.scan(body, (x, g0, key), None, length=int(steps))
    return x_adv
