"""Bandits-TD: black-box attack with time and data priors.

Ilyas, Engstrom & Madry, ICLR 2019 ("Prior Convictions: Black-Box
Adversarial Attacks with Bandits and Priors").  Plain finite-difference
estimators (NES/SPSA, attacks/grad_est.py) treat every step's gradient as
independent; Bandits-TD exploits two priors to cut the query cost by an
order of magnitude:

- **time prior** — successive gradients are correlated, so a latent
  gradient estimate ``v`` is CARRIED across steps and only nudged by each
  round's two queries, instead of re-estimated from scratch;
- **data prior** — image gradients are locally smooth, so ``v`` lives on a
  downsampled [B, h/f, w/f, C] lattice and is bilinearly upsampled into
  pixel space (f = ``prior_factor``), shrinking the exploration dimension
  by f².

Per step (L∞ variant, the paper's Algorithm 2 with the exponentiated-
gradients update of §4.2): sample a spherical exploration direction ``u``
in latent space, evaluate the CE loss at the two antithetic image-space
probes ``x ± fd_eta * g(v ± delta*u)`` (ONE [2B] batched forward), form the
one-dimensional directional derivative estimate, take an exponentiated-
gradients step on ``v`` (kept in (-1,1), the bandit's action set), then a
signed image step ``x += alpha * sign(upsample(v))`` projected to the
eps-ball and [0,1].  2 queries per step — the same budget bookkeeping as
the other query attacks (eval/query_curves.py counts it).

Beyond-reference extension (the reference's black-box story is transfer
only, blackbox_transfer.py); cited as the prior-guided member of the
query-based family next to NES/SPSA/Square/SimBA.

TPU design: the latent prior is scan-carried state — the whole
``steps × 2`` query schedule compiles to ONE XLA program; the bilinear
upsample is a static-shape ``jax.image.resize`` that XLA fuses with the
probe batch assembly; no host round-trips.  bf16 caveat: like all
finite-difference estimators, probe deltas can sink below bf16 forward
noise — see the note in attacks/grad_est.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn
from .grad_est import _per_sample_ce


def _upsample(v: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Latent [B,h',w',C] -> pixel [B,H,W,C] bilinear (the data prior)."""
    return jax.image.resize(v, (v.shape[0], height, width, v.shape[3]),
                            "bilinear")


def _eg_step(v: jnp.ndarray, grad: jnp.ndarray, lr: float) -> jnp.ndarray:
    """Exponentiated-gradients ascent keeping v in (-1, 1) (paper §4.2):
    map to (0,1), multiplicative-weights update, map back."""
    # the multiplicative-weights update p' = p*e^{lr g} / (p*e^{lr g} +
    # (1-p)*e^{-lr g}) is a logit shift: logit(p') = logit(p) + 2*lr*g.
    # The sigmoid form never overflows (e^{±lr g} does at |lr g| > 88 in
    # f32), and the clip keeps coordinates off exactly ±1, where the
    # update would otherwise pin forever (zero weight on the other side).
    pos = jnp.clip((v + 1.0) * 0.5, 1e-6, 1.0 - 1e-6)
    z = jnp.log(pos) - jnp.log1p(-pos) + 2.0 * lr * grad
    pos = jnp.clip(jax.nn.sigmoid(z), 1e-6, 1.0 - 1e-6)
    return 2.0 * pos - 1.0


def bandits_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    prior_factor: int = 8,
    fd_eta: float = 0.1,
    delta: float = 0.1,
    prior_lr: float = 1.0,
    y_target: jnp.ndarray | None = None,
    return_history: bool = False,
) -> jnp.ndarray:
    """Bandits-TD L∞ attack: [B,H,W,C] in [0,1] -> adversarial batch.

    2 forward queries per step.  ``prior_factor`` sets the data prior's
    downsampling (latent lattice H/f × W/f); ``fd_eta``/``delta`` are the
    image/latent exploration radii; ``prior_lr`` the exponentiated-
    gradients rate.  With ``return_history`` also returns the per-step
    success mask [steps, B] (one extra forward per step) for
    query-efficiency curves.
    """
    if int(prior_factor) < 1:
        raise ValueError(f"bandits_prior_factor must be >= 1, got {prior_factor}")
    if not (fd_eta > 0.0 and delta > 0.0):
        # est divides by fd_eta*delta — zero would silently NaN the prior
        raise ValueError(
            f"bandits_fd_eta and bandits_delta must be > 0, got "
            f"{fd_eta}/{delta}")
    b, height, width, chans = x.shape
    hp = max(1, height // int(prior_factor))
    wp = max(1, width // int(prior_factor))
    latent_dim = hp * wp * chans

    x_orig = x
    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0

    def body(carry, k):
        x_adv, v = carry
        u = jax.random.normal(k, (b, hp, wp, chans), x.dtype)
        u = u / jnp.sqrt(jnp.asarray(latent_dim, x.dtype))  # spherical scale

        g_plus = _upsample(v + delta * u, height, width)
        g_minus = _upsample(v - delta * u, height, width)
        both = jnp.concatenate(
            [jnp.clip(x_adv + fd_eta * g_plus, 0.0, 1.0),
             jnp.clip(x_adv + fd_eta * g_minus, 0.0, 1.0)], axis=0)
        losses = _per_sample_ce(logits_fn, both,
                                jnp.concatenate([y_grad, y_grad], axis=0))
        # directional derivative of the loss along u, in latent space
        est = (losses[:b] - losses[b:]) / (fd_eta * delta)  # [B]
        grad_v = est[:, None, None, None] * u

        # targeted mode folds its sign into the prior (v tracks the
        # DESCENT direction of the target-class CE), so the image step
        # below is always +alpha*sign(v)
        v_new = _eg_step(v, direction * grad_v, prior_lr)
        step_dir = jnp.sign(_upsample(v_new, height, width))
        x_new = x_adv + alpha * step_dir
        x_new = jnp.clip(x_new, x_orig - eps, x_orig + eps)
        x_new = jnp.clip(x_new, 0.0, 1.0)
        if not return_history:
            return (x_new, v_new), None
        succ = jnp.argmax(logits_fn(x_new), -1) != y_true
        return (x_new, v_new), succ

    v0 = jnp.zeros((b, hp, wp, chans), x.dtype)
    (x_adv, _), succ_hist = lax.scan(body, (x, v0),
                                     jax.random.split(key, int(steps)))
    if return_history:
        return x_adv, succ_hist
    return x_adv
