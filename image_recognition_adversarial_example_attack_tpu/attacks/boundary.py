"""Boundary attack: the original decision-based black-box attack.

Brendel, Rauber & Bethge, ICLR 2018.  Beyond-reference extension that
completes the decision-based pair next to HopSkipJump (attacks/hsja.py):
HSJA estimates boundary normals with Monte-Carlo decision probes; the
Boundary attack is the estimation-free random walk it superseded — still
the standard baseline every decision-based evaluation reports, and the
stronger choice when the decision surface is too irregular for HSJA's
normal estimate (e.g. heavily quantized or randomized deployments).

Walk (per step, per sample, all static):

  1. *spherical step*: a Gaussian draw orthogonalized against the
     direction to the original, then projected back onto the sphere of
     current radius ``d = ||x - x_adv||`` around the original — moves
     ALONG the boundary at constant distance;
  2. *source step*: contract toward the original by a small fraction;
  3. two hard-label queries decide acceptance; per-sample step sizes
     adapt multiplicatively (success -> grow, failure -> shrink, factors
     chosen so the walk settles at the paper's ~50% acceptance target).

The attack keeps the CLOSEST adversarial iterate (L2) per sample — the
best-tracking convention of attacks/cw.py and attacks/hsja.py.

TPU design: the whole walk is ONE ``lax.scan`` of ``steps`` iterations,
each a fixed pair of batched forwards plus vector arithmetic — an eager
port would pay a ~150 ms host round trip per query (the relay tax) times
thousands of queries.  Per-sample adaptive state (step sizes, best
distance) rides in the scan carry; randomness is an explicit key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn
from .hsja import _l2


def boundary_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    steps: int = 500,
    spherical_step: float = 0.01,
    source_step: float = 0.01,
    init_trials: int = 12,
    key: jax.Array,
    x_init: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1] (untargeted L2).

    ``steps`` walk iterations (2 decision queries each); the step sizes
    are per-sample initial values that self-adapt.  Initialization and
    the ``x_init`` warm start follow attacks/hsja.py: samples with no
    adversarial starting point are returned unchanged.
    """
    k_init, k_walk = jax.random.split(key)

    def is_adv(xq):
        return jnp.argmax(logits_fn(xq), axis=-1) != y_true  # [B] bool

    # --- initialization (the hsja schedule: noise blends at falling alpha) ---
    def init_body(carry, trial):
        x_adv, found = carry
        kk, alpha = trial
        u = jax.random.uniform(kk, x.shape, x.dtype)
        cand = jnp.clip((1.0 - alpha)[None] * x + alpha[None] * u, 0.0, 1.0)
        adv = is_adv(cand)
        take = adv & ~found
        x_adv = jnp.where(take[:, None, None, None], cand, x_adv)
        return (x_adv, found | adv), None

    if x_init is not None:
        initialized = is_adv(x_init)
        x_adv0 = jnp.where(initialized[:, None, None, None], x_init, x)
    else:
        alphas = jnp.asarray(
            [1.0, 0.5, 0.25, 0.1] * (int(init_trials) // 4 + 1),
            x.dtype)[: int(init_trials)]
        (x_adv0, initialized), _ = lax.scan(
            init_body, (x, jnp.zeros(x.shape[:1], bool)),
            (jax.random.split(k_init, int(init_trials)), alphas))

    b = x.shape[0]
    sph0 = jnp.full((b,), spherical_step, x.dtype)
    src0 = jnp.full((b,), source_step, x.dtype)
    best0 = jnp.where(initialized, _l2(x_adv0 - x), jnp.inf)

    def expand(v):  # [B] -> [B,1,1,1]
        return v[:, None, None, None]

    def step(carry, kk):
        x_adv, best_adv, best_d, sph, src = carry
        diff = x - x_adv
        d = _l2(diff)
        safe_d = jnp.maximum(d, 1e-12)
        u = diff / expand(safe_d)  # unit vector toward the original

        # 1. spherical candidate: orthogonal jitter, re-projected to the
        # d-sphere around x (constant-distance boundary walk)
        eta = jax.random.normal(kk, x.shape, x.dtype)
        eta = eta - expand(jnp.sum(eta * u, axis=(1, 2, 3))) * u
        eta_n = jnp.maximum(_l2(eta), 1e-12)
        cand_s = x_adv + expand(sph * safe_d / eta_n) * eta
        away = cand_s - x
        cand_s = x + expand(safe_d / jnp.maximum(_l2(away), 1e-12)) * away
        cand_s = jnp.clip(cand_s, 0.0, 1.0)

        # 2. source step: contract toward the original
        cand = jnp.clip(cand_s + expand(src) * (x - cand_s), 0.0, 1.0)

        # 3. two decisions; accept the full candidate only if both hold
        ok_s = is_adv(cand_s)
        ok_full = ok_s & is_adv(cand)
        accept = ok_full & initialized
        x_adv = jnp.where(expand(accept), cand, x_adv)

        # 4. multiplicative adaptation toward ~50% acceptance
        # (1.04 * 0.96 ≈ 1: balanced success/failure leaves steps fixed).
        # The source step adapts only on steps whose SPHERICAL candidate
        # succeeded (the paper's conditional statistic) — otherwise a hard
        # stretch of boundary would decay src to its floor for failures
        # the contraction had no part in.
        sph = jnp.clip(sph * jnp.where(ok_s, 1.04, 0.96), 1e-5, 1.0)
        src_factor = jnp.where(ok_s, jnp.where(ok_full, 1.04, 0.96), 1.0)
        src = jnp.clip(src * src_factor, 1e-6, 1.0)

        # 5. closest-adversarial best tracking
        d_new = _l2(x_adv - x)
        better = accept & (d_new < best_d)
        best_adv = jnp.where(expand(better), x_adv, best_adv)
        best_d = jnp.where(better, d_new, best_d)
        return (x_adv, best_adv, best_d, sph, src), None

    (x_fin, best_adv, best_d, _, _), _ = lax.scan(
        step, (x_adv0, x_adv0, best0, sph0, src0),
        jax.random.split(k_walk, int(steps)))

    out = jnp.where(jnp.isfinite(best_d)[:, None, None, None], best_adv, x_fin)
    return jnp.where(initialized[:, None, None, None], out, x)
