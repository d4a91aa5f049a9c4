"""PGD-L-inf: iterated sign-gradient with epsilon-ball projection.

Semantics parity with reference attack.py:37-65: optional uniform random
start in the eps-ball, ``steps`` iterations of ``alpha * sign(grad)``,
projection to ``[x0-eps, x0+eps]`` via min/max, clip to [0,1].

TPU design (the difference that matters): the reference relaunches a
forward+backward from Python every step (attack.py:55-63).  Here the whole
loop is a ``lax.scan`` inside one jitted program — zero host round-trips,
static step count, and XLA fuses step+project+clip into the backward's
epilogue.  The random start consumes an explicit PRNG key (the reference's
is unseeded, attack.py:51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn, input_grad


def pgd_step(x_adv, grad, x_orig, eps: float, alpha: float):
    """One fused PGD update: sign step + eps-ball projection + [0,1] clip."""
    x_new = x_adv + alpha * jnp.sign(grad).astype(x_adv.dtype)
    x_new = jnp.clip(x_new, x_orig - eps, x_orig + eps)
    return jnp.clip(x_new, 0.0, 1.0)


def pgd_linf_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    random_start: bool = True,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1].

    With ``y_target`` each step DESCENDS the target class's CE (targeted
    mode, a beyond-reference extension; the reference only targets CW).
    """
    x_orig = x
    if random_start:
        noise = jax.random.uniform(key, x.shape, x.dtype, minval=-eps, maxval=eps)
        x_adv = jnp.clip(x_orig + noise, 0.0, 1.0)
    else:
        x_adv = x_orig

    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0

    def body(x_adv, _):
        grad = input_grad(logits_fn, x_adv, y_grad)
        return pgd_step(x_adv, direction * grad, x_orig, eps, alpha), None

    x_adv, _ = lax.scan(body, x_adv, None, length=int(steps))
    return x_adv


def _l2_normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2, 3), keepdims=True))
    return v / jnp.maximum(norm, eps)


def pgd_l2_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    random_start: bool = True,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PGD in the L2 ball (beyond-reference; the reference covers L-inf PGD
    and L2 via CW only).  Steps move along the L2-normalized gradient and
    project back onto the eps-radius L2 ball around x, then clip to [0,1].
    Same fused-scan structure as the L-inf attack.
    """
    x_orig = x
    if random_start:
        noise = jax.random.normal(key, x.shape, x.dtype)
        noise = _l2_normalize(noise) * eps * jax.random.uniform(
            jax.random.fold_in(key, 1), (x.shape[0], 1, 1, 1), x.dtype
        )
        x_adv = jnp.clip(x_orig + noise, 0.0, 1.0)
    else:
        x_adv = x_orig

    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0

    def project(x_new):
        delta = x_new - x_orig
        norm = jnp.sqrt(jnp.sum(jnp.square(delta), axis=(1, 2, 3), keepdims=True))
        scale = jnp.minimum(1.0, eps / jnp.maximum(norm, 1e-12))
        return jnp.clip(x_orig + delta * scale, 0.0, 1.0)

    def body(x_adv, _):
        grad = input_grad(logits_fn, x_adv, y_grad)
        x_new = x_adv + alpha * direction * _l2_normalize(grad).astype(x_adv.dtype)
        return project(x_new), None

    x_adv, _ = lax.scan(body, x_adv, None, length=int(steps))
    return x_adv


def project_l1_ball(delta: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Euclidean projection of each sample's delta onto the L1 ball of
    radius ``eps`` (Duchi et al., ICML 2008: soft-threshold at the theta
    found from the sorted-cumsum condition).  [B,...] -> [B,...]."""
    b = delta.shape[0]
    flat = delta.reshape(b, -1)
    n = flat.shape[1]
    a = jnp.abs(flat)
    inside = jnp.sum(a, axis=-1) <= eps
    mu = jnp.sort(a, axis=-1)[:, ::-1]                  # descending
    cum = jnp.cumsum(mu, axis=-1)
    ar = jnp.arange(1, n + 1, dtype=flat.dtype)
    rho = jnp.sum((mu * ar > cum - eps).astype(jnp.int32), axis=-1)  # >=1
    theta = (jnp.take_along_axis(cum, (rho - 1)[:, None], -1)[:, 0]
             - eps) / rho.astype(flat.dtype)
    proj = jnp.sign(flat) * jnp.maximum(a - theta[:, None], 0.0)
    out = jnp.where(inside[:, None], flat, proj)
    return out.reshape(delta.shape)


def pgd_l1_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    sparsity: float = 0.01,
    random_start: bool = True,
    y_target: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PGD in the L1 ball — the SLIDE attack (Tramèr & Boneh, NeurIPS
    2019), completing the zoo's Lp-ball family (L0 budget: jsma; L1
    ball: here; L2/L∞ balls: pgd_l2/pgd).

    Steps move along the k-SPARSE steepest-descent direction for the L1
    geometry: sign(g) on the top ``sparsity`` fraction of |g| coordinates,
    normalized to unit L1 norm so ``alpha`` is an L1 step length; iterates
    project back onto the eps-radius L1 ball (Duchi) and clip to [0,1]
    (the clip never grows |delta|, so the ball survives it).  Note the
    scale: L1 radii are O(10), not O(8/255) — at 224² an L1 budget of 12
    averages under 4e-4 per pixel.
    """
    x_orig = x
    b = x.shape[0]
    n = x[0].size

    if random_start:
        noise = jax.random.uniform(key, x.shape, x.dtype, minval=-1.0,
                                   maxval=1.0)
        scale = jax.random.uniform(jax.random.fold_in(key, 1),
                                   (b, 1, 1, 1), x.dtype)
        delta0 = project_l1_ball(noise, eps) * scale
        x_adv = jnp.clip(x_orig + delta0, 0.0, 1.0)
    else:
        x_adv = x_orig

    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0
    k = max(1, int(round(sparsity * n)))

    def body(x_adv, _):
        g = input_grad(logits_fn, x_adv, y_grad)
        gf = jnp.abs(g.reshape(b, -1))
        thr = jnp.sort(gf, axis=-1)[:, n - k][:, None]  # k-th largest
        e = jnp.sign(g.reshape(b, -1)) * (gf >= thr)
        e = e / jnp.maximum(jnp.sum(jnp.abs(e), -1, keepdims=True), 1.0)
        x_new = x_adv + alpha * direction * e.reshape(x.shape).astype(x.dtype)
        x_new = x_orig + project_l1_ball(x_new - x_orig, eps)
        return jnp.clip(x_new, 0.0, 1.0), None

    x_adv, _ = lax.scan(body, x_adv, None, length=int(steps))
    return x_adv


def pgd_multi_restart(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    restarts: int = 5,
) -> jnp.ndarray:
    """Worst-case-over-restarts PGD (beyond-reference; standard for robust
    evaluation).  TPU-native shape: the R restarts are ``vmap``-ed so the
    device sees one [R*B, H, W, C] attack — R times the arithmetic intensity
    of looping restarts from the host, zero extra compile.

    Returns, per sample, the restart iterate with the highest CE loss.
    """
    from .api import cross_entropy_sum  # noqa: PLC0415 — avoid cycle at import

    keys = jax.random.split(key, restarts)

    def one(k):
        x_adv = pgd_linf_attack(
            logits_fn, x, y_true, eps=eps, alpha=alpha, steps=steps, key=k
        )
        logp = jax.nn.log_softmax(logits_fn(x_adv), axis=-1)
        ce = -jnp.take_along_axis(logp, y_true[:, None], axis=-1)[:, 0]  # [B]
        return x_adv, ce

    advs, ces = jax.vmap(one)(keys)           # [R, B, ...], [R, B]
    best = jnp.argmax(ces, axis=0)            # [B]
    return jnp.take_along_axis(
        advs, best[None, :, None, None, None], axis=0
    )[0]
