"""Total-variation minimization defense (Guo et al., ICLR 2018).

"Countering Adversarial Images using Input Transformations" reconstructs
each input as the solution of the (optionally pixel-masked) ROF problem

    min_z  0.5 * || M (z - x) ||_2^2  +  w * TV(z)

so the classifier sees a piecewise-smooth reconstruction that keeps edges
but discards the high-frequency adversarial texture.  This completes the
classic input-transformation family next to smoothing / quantization /
JPEG (defenses/preprocess.py, defenses/jpeg*.py) and the resize-pad
randomization (defenses/randomization.py).  The reference's defense chain
(defense_experiments.py:170-217) has no TV arm — beyond-reference.

TPU design — the original uses an off-device split-Bregman solver inside
a per-image Python loop.  Here the solver is Chambolle–Pock primal–dual
with a STATIC step count inside one ``lax.scan``: every update is a local
stencil op (forward differences / divergence) plus pointwise proxes, so
the whole solve fuses into the surrounding program, the batch dimension
shards untouched over the 'data' mesh axis, and — because every step is
smooth except benign projections — the defense is differentiable
end-to-end: adaptive attacks (``--adaptive``) backprop through the actual
solver, no BPDA approximation needed.

The randomized variant (the paper's pixel dropout, keep probability p)
is exposed as an EOT transform like the randomization defense:
``tv_transform(keep_prob=0.5)`` plugged into ``make_eot_logits_fn`` is
the deployed randomized defense at n_samples=1 and the adaptive
expectation attack at n_samples>=8 (Athalye et al. 2018).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..attacks.eot import TransformFn

TV_WEIGHT = 0.03   # the paper's lambda_TV
TV_STEPS = 30      # Chambolle-Pock iterations (static; O(1/k) gap)


def _forward_diff(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward differences with Neumann boundary on [B,H,W,C]."""
    dy = jnp.pad(z[:, 1:] - z[:, :-1], ((0, 0), (0, 1), (0, 0), (0, 0)))
    dx = jnp.pad(z[:, :, 1:] - z[:, :, :-1], ((0, 0), (0, 0), (0, 1), (0, 0)))
    return dy, dx


def _divergence(py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Negative adjoint of ``_forward_diff``: div = -D^T, so that
    <D z, p> = -<z, div p> exactly (the discrete integration by parts the
    primal-dual updates rely on)."""
    dy = jnp.pad(py[:, :-1], ((0, 0), (0, 1), (0, 0), (0, 0)))
    dy = dy - jnp.pad(py[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    dx = jnp.pad(px[:, :, :-1], ((0, 0), (0, 0), (0, 1), (0, 0)))
    dx = dx - jnp.pad(px[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    return dy + dx


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """Isotropic per-image TV value, summed over channels -> [B]."""
    dy, dx = _forward_diff(x)
    return jnp.sum(jnp.sqrt(dy * dy + dx * dx + 1e-12), axis=(1, 2, 3))


def tv_minimize(
    x: jnp.ndarray,
    *,
    weight: float = TV_WEIGHT,
    steps: int = TV_STEPS,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Solve the (masked) ROF problem for a batch ``x [B,H,W,C]``.

    ``mask`` (broadcastable to x, values in {0,1}) selects the pixels the
    data term sees; dropped pixels are inpainted purely by the TV prior
    (the paper's dropout variant).  ``None`` = deterministic full-data
    ROF.  Returns the reconstruction in x's dtype (solved in f32: the
    dual accumulation underflows in bf16).
    """
    dtype = x.dtype
    if weight <= 0.0:
        # the dual prox divides by w; w<=0 means "no prior" — the masked
        # data term alone is minimized by x itself, so short-circuit
        return jnp.clip(x, 0.0, 1.0)
    x32 = x.astype(jnp.float32)
    m = (jnp.ones_like(x32) if mask is None
         else jnp.broadcast_to(mask, x32.shape).astype(jnp.float32))
    w = jnp.float32(weight)
    # ||D||^2 <= 8 for the forward-difference stencil; sigma*tau*L^2 = 1.
    tau = jnp.float32(1.0 / jnp.sqrt(8.0))
    sigma = tau

    def step(carry, _):
        z, zbar, py, px = carry
        gy, gx = _forward_diff(zbar)
        py, px = py + sigma * gy, px + sigma * gx
        # prox of the conjugate of w*||.||_{2,1}: project each (py,px)
        # 2-vector onto the radius-w ball.  Safe sqrt: at an exactly-flat
        # pixel (clipped/saturated image regions) py=px=0 and the raw
        # sqrt VJP is 0/0=NaN — the maximum() clamp zeroes the branch's
        # cotangent there instead, keeping adaptive attacks finite.
        nrm = jnp.sqrt(jnp.maximum(py * py + px * px, 1e-24))
        scale = 1.0 / jnp.maximum(1.0, nrm / w)
        py, px = py * scale, px * scale
        v = z + tau * _divergence(py, px)
        z_new = (v + tau * m * x32) / (1.0 + tau * m)
        return (z_new, 2.0 * z_new - z, py, px), None

    z0 = x32
    p0 = jnp.zeros_like(x32)
    (z, _, _, _), _ = lax.scan(step, (z0, z0, p0, p0), None,
                               length=int(steps))
    return jnp.clip(z, 0.0, 1.0).astype(dtype)


def rof_energy(
    z: jnp.ndarray,
    x: jnp.ndarray,
    *,
    weight: float = TV_WEIGHT,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The objective ``tv_minimize`` minimizes, per image -> [B] (tests)."""
    m = jnp.ones_like(x) if mask is None else jnp.broadcast_to(mask, x.shape)
    data = 0.5 * jnp.sum(m * (z - x) ** 2, axis=(1, 2, 3))
    return data + weight * total_variation(z)


def tv_transform(
    weight: float = TV_WEIGHT,
    steps: int = TV_STEPS,
    keep_prob: float = 0.5,
) -> TransformFn:
    """The randomized (pixel-dropout) TV defense as an EOT transform.

    Per draw: a Bernoulli(keep_prob) mask per pixel (shared across
    channels, per the paper) gates the data term; dropped pixels are
    TV-inpainted.  n_samples=1 in ``make_eot_logits_fn`` = the deployed
    defense; n_samples>=8 = the adaptive expectation attack.
    """

    def transform(key, x):
        keep = jax.random.bernoulli(
            key, p=keep_prob, shape=(x.shape[0], x.shape[1], x.shape[2], 1))
        return tv_minimize(x, weight=weight, steps=steps,
                           mask=keep.astype(x.dtype))

    return transform
