"""APGD-CE: Auto-PGD with cross-entropy loss (Croce & Hein, ICML 2020).

Beyond-reference capability: the reference evaluates its robust arm with
fixed-step PGD only; APGD is the standard-of-practice robust-evaluation
attack (the core of AutoAttack) — momentum updates with an ADAPTIVE step
size that halves when progress stalls, restarting from the best iterate.

TPU design: the classic implementation is control-flow-heavy Python
(per-checkpoint branching, per-sample step halving).  Here the entire
attack is ONE ``lax.scan``:

- per-sample state (iterate, previous iterate, step size, best loss, best
  iterate, improvement counter, checkpoint snapshots) rides the carry;
- the checkpoint schedule is data-independent, so it is precomputed
  host-side as a boolean vector and fed to the scan as ``xs`` — the
  halving decisions become masked ``jnp.where`` updates, no ``lax.cond``;
- halving is per-sample (a [B] step-size vector), exactly like the paper.

Returns the best-loss iterate, like the original.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def apgd_checkpoints(steps: int) -> np.ndarray:
    """Boolean [steps] vector, True at the paper's checkpoint iterations.

    p_0=0, p_1=0.22, p_{j+1} = p_j + max(p_j - p_{j-1} - 0.03, 0.06);
    w_j = ceil(p_j * steps).
    """
    ps = [0.0, 0.22]
    while ps[-1] < 1.0:
        ps.append(ps[-1] + max(ps[-1] - ps[-2] - 0.03, 0.06))
    ws = sorted({int(np.ceil(p * steps)) for p in ps if 0 < p < 1.0})
    flags = np.zeros((steps,), bool)
    for w in ws:
        if w < steps:
            flags[w] = True
    return flags


def _ce(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]  # [B]


def apgd_ce_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    steps: int = 100,
    key: jax.Array,
    rho: float = 0.75,
    alpha_momentum: float = 0.75,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> best-loss adversarial batch in [0,1].

    L-inf APGD maximizing the untargeted CE loss inside the eps-ball.
    """
    b = x.shape[0]
    x_orig = x
    expand = (slice(None), None, None, None)  # [B] -> [B,1,1,1]

    def clip_ball(z):
        return jnp.clip(jnp.clip(z, x_orig - eps, x_orig + eps), 0.0, 1.0)

    def loss_and_grad(z):
        def f(zz):
            l = _ce(logits_fn(zz), y_true)
            return jnp.sum(l), l

        (_, loss), grad = jax.value_and_grad(f, has_aux=True)(z)
        return loss, grad

    # --- init: random start + one plain step at eta0 = 2*eps ---
    noise = jax.random.uniform(key, x.shape, x.dtype, minval=-eps, maxval=eps)
    x0 = clip_ball(x_orig + noise)
    loss0, grad0 = loss_and_grad(x0)
    eta0 = jnp.full((b,), 2.0 * eps, x.dtype)
    x1 = clip_ball(x0 + eta0[expand] * jnp.sign(grad0))
    loss1, grad1 = loss_and_grad(x1)

    better1 = loss1 > loss0
    x_best = jnp.where(better1[expand], x1, x0)
    loss_best = jnp.maximum(loss0, loss1)

    carry = dict(
        x_k=x1, x_prev=x0, grad=grad1, loss_k=loss1,
        eta=eta0,
        x_best=x_best, loss_best=loss_best,
        improved=better1.astype(jnp.int32),  # improvements since last ckpt
        since=jnp.ones((b,), jnp.int32),     # iterations since last ckpt
        # AutoAttack's reduced_last_check / loss at the last checkpoint:
        halved_prev=jnp.zeros((b,), bool), ckpt_best=loss_best,
    )

    # the pre-scan plain step IS iteration 1 of the paper's budget, so the
    # scan covers iterations 1..steps-1 — `steps` gradient evaluations
    # total (+ the random-start probe), checkpoints at absolute w_j
    flags = jnp.asarray(apgd_checkpoints(int(steps)))[1:]

    def body(c, is_ckpt):
        # momentum step (paper eq. 2-3) with the current per-sample eta
        z = clip_ball(c["x_k"] + c["eta"][expand] * jnp.sign(c["grad"]))
        x_new = clip_ball(
            c["x_k"]
            + alpha_momentum * (z - c["x_k"])
            + (1.0 - alpha_momentum) * (c["x_k"] - c["x_prev"])
        )
        loss_new, grad_new = loss_and_grad(x_new)

        improved = loss_new > c["loss_k"]
        x_best = jnp.where((loss_new > c["loss_best"])[expand], x_new, c["x_best"])
        loss_best = jnp.maximum(c["loss_best"], loss_new)
        improved_cnt = c["improved"] + improved.astype(jnp.int32)
        since = c["since"] + 1

        # checkpoint: halve eta (and restart from the best iterate) when
        #   (1) too few improvements since the last checkpoint, or
        #   (2) eta was NOT halved at the previous checkpoint AND the best
        #       loss has not improved since (AutoAttack's ~reduced_last_check)
        cond1 = improved_cnt < jnp.ceil(rho * since).astype(jnp.int32)
        cond2 = (~c["halved_prev"]) & (c["ckpt_best"] >= loss_best)
        halve = is_ckpt & (cond1 | cond2)

        eta = jnp.where(halve, c["eta"] / 2.0, c["eta"])
        x_k = jnp.where(halve[expand], x_best, x_new)
        x_prev = jnp.where(halve[expand], x_best, c["x_k"])
        loss_k = jnp.where(halve, loss_best, loss_new)
        # one grad per step: the carry holds grad(x_new).  When a restart
        # jumps to an OLDER best iterate, that gradient is one step stale
        # for the first post-restart update (documented deviation — avoids
        # a second fwd+bwd inside checkpoint steps; x_best == x_new in the
        # common case, where it is exact).

        new_c = dict(
            x_k=x_k, x_prev=x_prev, grad=grad_new, loss_k=loss_k, eta=eta,
            x_best=x_best, loss_best=loss_best,
            improved=jnp.where(is_ckpt, 0, improved_cnt),
            since=jnp.where(is_ckpt, 0, since),
            halved_prev=jnp.where(is_ckpt, halve, c["halved_prev"]),
            ckpt_best=jnp.where(is_ckpt, loss_best, c["ckpt_best"]),
        )
        return new_c, None

    carry, _ = lax.scan(body, carry, flags)
    return carry["x_best"]
