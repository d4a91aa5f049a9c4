"""TI-FGSM: translation-invariant momentum iterative FGSM (Dong et al.,
CVPR 2019).

Beyond-reference capability completing the standard transfer family
(MI-FGSM: attacks/mifgsm.py, DI-FGSM: attacks/dim.py): instead of
attacking a set of translated images, the gradient is convolved with a
Gaussian kernel — mathematically equivalent to averaging gradients over
translations under a linearity assumption, and far cheaper.

TPU design: the kernel smoothing is ONE depthwise conv
(``feature_group_count = C``) fused by XLA into the attack's backward
epilogue; the whole attack stays a single ``lax.scan`` program like
PGD/MI-FGSM.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from .api import LogitsFn, input_grad
from .pgd import pgd_step


def gaussian_kernel(size: int = 7, sigma: float | None = None) -> np.ndarray:
    """Normalized [size, size] Gaussian (host-side, becomes a constant)."""
    if size < 1 or size % 2 == 0:
        raise ValueError(f"kernel size must be odd and >= 1, got {size}")
    if sigma is None:
        sigma = size / 3.0
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2.0 * sigma**2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def smooth_gradient(grad: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise-convolve a [B,H,W,C] gradient with a [k,k] kernel (SAME)."""
    c = grad.shape[-1]
    k = jnp.asarray(kernel, grad.dtype)
    weights = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 per group
    return lax.conv_general_dilated(
        grad, weights,
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def tim_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    mu: float = 1.0,
    kernel_size: int = 7,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1].

    MI-FGSM update with the per-step gradient smoothed by a Gaussian
    kernel before momentum accumulation.  ``mu=0`` gives plain TI-FGSM.
    """
    x_orig = x
    g0 = jnp.zeros_like(x)
    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0
    kernel = gaussian_kernel(kernel_size)

    def body(carry, _):
        x_adv, g = carry
        grad = direction * input_grad(logits_fn, x_adv, y_grad)
        grad = smooth_gradient(grad, kernel)
        l1 = jnp.sum(jnp.abs(grad), axis=(1, 2, 3), keepdims=True)
        g = mu * g + grad / jnp.maximum(l1, 1e-12)
        x_next = pgd_step(x_adv, g, x_orig, eps, alpha)
        return (x_next, g), None

    (x_adv, _), _ = lax.scan(body, (x, g0), None, length=int(steps))
    return x_adv
