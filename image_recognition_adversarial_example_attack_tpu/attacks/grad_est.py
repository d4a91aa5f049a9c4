"""Gradient-estimation black-box attacks: NES and SPSA.

NES  — Ilyas et al., ICML 2018: antithetic Gaussian sampling estimates the
       CE-loss gradient from 2n forward queries per step.
SPSA — Uesato et al., ICML 2018: simultaneous-perturbation finite
       differences with Rademacher (±1) probes.

Beyond-reference extensions: the reference's black-box story is transfer
only (blackbox_transfer.py — attack a surrogate, move examples over); these
two attack the target model DIRECTLY through its forward pass with zero
gradient access, completing the query-based side of the black-box family
(Square, attacks/square.py, is the score-based random-search member).

Estimator (antithetic pair, loss L = per-sample CE):

    g_hat = 1/(2 n c) * sum_i [L(x + c v_i) - L(x - c v_i)] * d(v_i)

with v_i ~ N(0, I), d(v) = v for NES (smoothed-loss gradient) and
v_i ~ Rademacher, d(v) = v (= 1/v elementwise) for SPSA.  The iterate then
takes PGD-style sign steps with L-inf projection — the update used by both
papers' robust-evaluation setups.

TPU design: each probe evaluates BOTH antithetic sides as one [2B] batched
forward (big, static-shape batches for the MXU), the n probes ride a
``lax.scan`` carrying the gradient accumulator (memory stays O(B), not
O(nB)), and the outer step loop is a second scan — the entire
``steps x n x 2`` query schedule compiles to ONE XLA program with zero host
round-trips, where eager implementations pay a Python round-trip per query
batch.

bf16 caveat (same mechanism as the DeepFool finding, docs/EXPERIMENTS.md):
finite differences subtract two nearly-equal losses, so with a bfloat16
model the per-probe deltas at the default radii (sigma=1e-3 / delta=1e-2)
can fall below bf16 forward noise and the estimate degrades toward random
search.  On bf16 models either run the target in float32 for these attacks
or raise ``sigma``/``delta`` (1e-2 / 5e-2 are reasonable starting points);
the antithetic pairing cancels shared noise only when both sides run in
the same compiled program, which this implementation guarantees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def _per_sample_ce(logits_fn: LogitsFn, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits_fn(x), axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]  # [B]


def _estimated_grad(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    *,
    n_samples: int,
    c: float,
    sampler: str,
) -> jnp.ndarray:
    """Antithetic finite-difference gradient estimate (NES or SPSA probes)."""
    b = x.shape[0]

    def probe(g_acc, k):
        if sampler == "gaussian":
            v = jax.random.normal(k, x.shape, x.dtype)
        else:  # rademacher
            v = jax.random.rademacher(k, x.shape, x.dtype)
        both = jnp.concatenate([x + c * v, x - c * v], axis=0)  # one [2B] forward
        losses = _per_sample_ce(logits_fn, both, jnp.concatenate([y, y], axis=0))
        diff = losses[:b] - losses[b:]  # [B]
        return g_acc + diff[:, None, None, None] * v, None

    keys = jax.random.split(key, n_samples)
    g, _ = lax.scan(probe, jnp.zeros_like(x), keys)
    return g / (2.0 * c * n_samples)


def _grad_est_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    n_samples: int,
    c: float,
    sampler: str,
    y_target: jnp.ndarray | None,
    return_history: bool = False,
) -> jnp.ndarray:
    x_orig = x
    y_grad = y_true if y_target is None else y_target
    direction = 1.0 if y_target is None else -1.0

    def body(x_adv, k):
        g = _estimated_grad(
            logits_fn, x_adv, y_grad, k, n_samples=n_samples, c=c, sampler=sampler
        )
        x_new = x_adv + alpha * direction * jnp.sign(g).astype(x_adv.dtype)
        x_new = jnp.clip(x_new, x_orig - eps, x_orig + eps)
        x_new = jnp.clip(x_new, 0.0, 1.0)
        if not return_history:
            return x_new, None
        # +1 forward per step, only when curves are requested (untargeted
        # success convention; the estimator itself never needs this)
        succ = jnp.argmax(logits_fn(x_new), -1) != y_true
        return x_new, succ

    x_adv, succ_hist = lax.scan(body, x, jax.random.split(key, int(steps)))
    if return_history:
        return x_adv, succ_hist
    return x_adv


def nes_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    n_samples: int = 32,
    sigma: float = 1e-3,
    y_target: jnp.ndarray | None = None,
    return_history: bool = False,
) -> jnp.ndarray:
    """NES black-box attack: [B,H,W,C] in [0,1] -> adversarial batch.

    ``n_samples`` antithetic Gaussian probe pairs per step (2*n_samples
    forward queries), smoothing radius ``sigma`` in [0,1] pixel units.
    With ``return_history`` also returns the per-step success mask
    [steps, B] (one extra forward per step) for query-efficiency curves.
    """
    return _grad_est_attack(
        logits_fn, x, y_true, eps=eps, alpha=alpha, steps=steps, key=key,
        n_samples=n_samples, c=sigma, sampler="gaussian", y_target=y_target,
        return_history=return_history,
    )


def spsa_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    n_samples: int = 32,
    delta: float = 1e-2,
    y_target: jnp.ndarray | None = None,
    return_history: bool = False,
) -> jnp.ndarray:
    """SPSA black-box attack: Rademacher probes, perturbation size ``delta``.

    With ±1 probes the SPSA estimator's elementwise 1/v_i equals v_i, so it
    shares the antithetic finite-difference core with NES.
    """
    return _grad_est_attack(
        logits_fn, x, y_true, eps=eps, alpha=alpha, steps=steps, key=key,
        n_samples=n_samples, c=delta, sampler="rademacher", y_target=y_target,
        return_history=return_history,
    )
