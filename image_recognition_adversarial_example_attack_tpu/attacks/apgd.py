"""APGD: Auto-PGD with CE / DLR / targeted-DLR losses (Croce & Hein, ICML 2020).

Beyond-reference capability: the reference evaluates its robust arm with
fixed-step PGD only; APGD is the standard-of-practice robust-evaluation
attack (the core of AutoAttack) — momentum updates with an ADAPTIVE step
size that halves when progress stalls, restarting from the best iterate.
This module provides all three AutoAttack gradient arms: APGD-CE,
APGD-DLR, and APGD-T (targeted DLR over the top-K runner-up classes).

TPU design: the classic implementation is control-flow-heavy Python
(per-checkpoint branching, per-sample step halving).  Here the entire
attack is ONE ``lax.scan``:

- per-sample state (iterate, previous iterate, step size, best loss, best
  iterate, improvement counter, checkpoint snapshots) rides the carry;
- the checkpoint schedule is data-independent, so it is precomputed
  host-side as a boolean vector and fed to the scan as ``xs`` — the
  halving decisions become masked ``jnp.where`` updates, no ``lax.cond``;
- halving is per-sample (a [B] step-size vector), exactly like the paper;
- APGD-T is an OUTER ``lax.scan`` over the [K,B] target-class matrix
  around the same engine — one compiled program for all K restarts, with
  per-sample worst-case selection as masked ``where`` updates (the
  classic implementation reruns a Python attack loop per target).

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


def dlr_loss(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Untargeted Difference-of-Logits-Ratio (Croce & Hein 2020, eq. 6):

        -(z_y - max_{i != y} z_i) / (z_pi1 - z_pi3 + 1e-12)

    Scale-invariant in the logits, which defeats the gradient masking
    that saturated-CE suffers from.  Maximizing it drives z_y below the
    runner-up.  [B,C] logits -> [B] loss.
    """
    if logits.shape[-1] < 3:
        raise ValueError(
            f"DLR needs >= 3 classes (got {logits.shape[-1]}): the "
            "normalizer is z_pi1 - z_pi3")
    z_sorted = jnp.sort(logits, axis=-1)  # ascending
    z_y = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(y, logits.shape[-1], dtype=bool)
    z_other = jnp.max(jnp.where(onehot, -jnp.inf, logits), axis=-1)
    denom = z_sorted[:, -1] - z_sorted[:, -3] + 1e-12
    return -(z_y - z_other) / denom


def dlr_loss_targeted(logits: jnp.ndarray, y: jnp.ndarray,
                      y_target: jnp.ndarray) -> jnp.ndarray:
    """Targeted DLR (Croce & Hein 2020, eq. 7):

        -(z_y - z_t) / (z_pi1 - (z_pi3 + z_pi4) / 2 + 1e-12)

    Maximizing it pushes the target class above the true one.
    """
    if logits.shape[-1] < 4:
        raise ValueError(
            f"targeted DLR needs >= 4 classes (got {logits.shape[-1]}): the "
            "normalizer is z_pi1 - (z_pi3 + z_pi4)/2")
    z_sorted = jnp.sort(logits, axis=-1)
    z_y = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    z_t = jnp.take_along_axis(logits, y_target[:, None], axis=-1)[:, 0]
    denom = z_sorted[:, -1] - 0.5 * (z_sorted[:, -3] + z_sorted[:, -4]) + 1e-12
    return -(z_y - z_t) / denom


def _make_loss(loss: str, y_true, y_target=None):
    """name -> logits-space [B] loss the engine MAXIMIZES."""
    if loss == "ce":
        return lambda logits: _ce(logits, y_true)
    if loss == "dlr":
        return lambda logits: dlr_loss(logits, y_true)
    if loss == "dlr-targeted":
        if y_target is None:
            raise ValueError("dlr-targeted needs y_target")
        return lambda logits: dlr_loss_targeted(logits, y_true, y_target)
    raise ValueError(f"unknown APGD loss '{loss}'")


def apgd_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    steps: int = 100,
    key: jax.Array,
    loss: str = "ce",
    y_target: jnp.ndarray | None = None,
    rho: float = 0.75,
    alpha_momentum: float = 0.75,
    norm: str = "linf",
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> best-loss adversarial batch in [0,1].

    APGD maximizing the chosen loss ('ce' | 'dlr' | 'dlr-targeted')
    inside the eps-ball of the chosen ``norm`` ('linf' | 'l2').  L2 mode
    follows the paper's recipe: sphere-surface random start, per-sample
    L2-normalized gradient steps, projection = radial rescale of the
    delta then box clip.
    """
    if norm not in ("linf", "l2"):
        raise ValueError(f"unknown APGD norm '{norm}'")
    b = x.shape[0]
    x_orig = x
    expand = (slice(None), None, None, None)  # [B] -> [B,1,1,1]
    axes = tuple(range(1, x.ndim))
    loss_vec = _make_loss(loss, y_true, y_target)

    def clip_ball(z):
        if norm == "linf":
            return jnp.clip(jnp.clip(z, x_orig - eps, x_orig + eps), 0.0, 1.0)
        delta = z - x_orig
        nrm = jnp.sqrt(jnp.sum(jnp.square(delta), axis=axes, keepdims=True))
        delta = delta * jnp.minimum(1.0, eps / (nrm + 1e-12))
        return jnp.clip(x_orig + delta, 0.0, 1.0)

    def step_dir(grad):
        """ascent direction scaled so eta means 'distance moved'."""
        if norm == "linf":
            return jnp.sign(grad)
        nrm = jnp.sqrt(jnp.sum(jnp.square(grad), axis=axes, keepdims=True))
        return grad / (nrm + 1e-12)

    def loss_and_grad(z):
        def f(zz):
            l = loss_vec(logits_fn(zz))
            return jnp.sum(l), l

        (_, loss), grad = jax.value_and_grad(f, has_aux=True)(z)
        return loss, grad

    # --- init: random start + one plain step at eta0 = 2*eps ---
    if norm == "linf":
        noise = jax.random.uniform(key, x.shape, x.dtype,
                                   minval=-eps, maxval=eps)
    else:
        g = jax.random.normal(key, x.shape, x.dtype)
        g_nrm = jnp.sqrt(jnp.sum(jnp.square(g), axis=axes, keepdims=True))
        noise = eps * g / (g_nrm + 1e-12)  # sphere surface, like the paper
    x0 = clip_ball(x_orig + noise)
    loss0, grad0 = loss_and_grad(x0)
    eta0 = jnp.full((b,), 2.0 * eps, x.dtype)
    x1 = clip_ball(x0 + eta0[expand] * step_dir(grad0))
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
        z = clip_ball(c["x_k"] + c["eta"][expand] * step_dir(c["grad"]))
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


def apgd_ce_attack(logits_fn, x, y_true, *, eps, steps: int = 100, key,
                   rho: float = 0.75, alpha_momentum: float = 0.75,
                   norm: str = "linf"):
    """APGD maximizing untargeted cross-entropy (AutoAttack arm 1)."""
    return apgd_attack(logits_fn, x, y_true, eps=eps, steps=steps, key=key,
                       loss="ce", rho=rho, alpha_momentum=alpha_momentum,
                       norm=norm)


def apgd_dlr_attack(logits_fn, x, y_true, *, eps, steps: int = 100, key,
                    rho: float = 0.75, alpha_momentum: float = 0.75,
                    norm: str = "linf"):
    """APGD maximizing untargeted DLR (gradient-masking-resistant arm)."""
    return apgd_attack(logits_fn, x, y_true, eps=eps, steps=steps, key=key,
                       loss="dlr", rho=rho, alpha_momentum=alpha_momentum,
                       norm=norm)


def apgd_targeted_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    steps: int = 100,
    n_targets: int = 9,
    key: jax.Array,
    rho: float = 0.75,
    alpha_momentum: float = 0.75,
    norm: str = "linf",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """APGD-T: targeted-DLR restarts over the top-``n_targets`` runner-up
    classes of the clean logits (AutoAttack's strongest white-box arm).

    Returns ``(x_adv, success)``: per sample, the first restart's iterate
    that flips the prediction (success = pred != y_true, the robust-
    accuracy criterion), else the last restart's best-loss iterate.

    TPU design: the K restarts are an outer ``lax.scan`` over the [K,B]
    target matrix around the same single-program engine — the whole
    multi-target attack compiles once; the classic implementation loops
    targets in Python re-launching the attack each time.
    """
    logits_clean = logits_fn(x)
    n_classes = logits_clean.shape[-1]
    n_targets = int(min(n_targets, n_classes - 1))
    # descending class ranking by clean logit; ranks 2..K+1 are the targets
    order = jnp.argsort(-logits_clean, axis=-1)  # [B,C]
    targets = jnp.transpose(order[:, 1:1 + n_targets])  # [K,B]
    keys = jax.random.split(key, n_targets)  # [K,2]

    def one_target(carry, inp):
        x_adv, success = carry
        y_t, k = inp
        x_try = apgd_attack(logits_fn, x, y_true, eps=eps, steps=steps,
                            key=k, loss="dlr-targeted", y_target=y_t,
                            rho=rho, alpha_momentum=alpha_momentum,
                            norm=norm)
        fooled = jnp.argmax(logits_fn(x_try), -1) != y_true
        # a sample that already succeeded keeps its first winning iterate;
        # everyone else takes the latest try (so unsuccessful samples end
        # with a real best-loss iterate rather than the clean image, and a
        # first success this round is captured by the same update)
        x_adv = jnp.where((~success)[:, None, None, None], x_try, x_adv)
        return (x_adv, success | fooled), None

    (x_adv, success), _ = lax.scan(one_target, (x, jnp.zeros(x.shape[:1], bool)),
                                   (targets, keys))
    return x_adv, success
