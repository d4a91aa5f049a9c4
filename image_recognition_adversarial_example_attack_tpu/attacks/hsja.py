"""HopSkipJump: decision-based (hard-label) black-box attack.

Chen, Jordan & Wainwright, IEEE S&P 2020.  Beyond-reference extension that
completes the black-box taxonomy alongside transfer attacks
(cli/blackbox_transfer.py), score-based search (attacks/square.py) and
gradient estimation (attacks/grad_est.py): HSJA sees ONLY the decision
``argmax f(x') != y`` — no logits, no scores — the threat model of a
deployed classifier that returns a label.

Per iteration (all loop counts static):

  1. binary-search the segment [x, x_adv] to a boundary point x_b;
  2. estimate the boundary normal from n Bernoulli decisions at
     ``x_b + delta*u_i`` (Monte-Carlo gradient of the decision indicator,
     with the paper's baseline subtraction  phi_i - mean(phi));
  3. geometric step search: try ``d/sqrt(t)`` along the normal, halving
     until the iterate is adversarial again (masked select, fixed trials).

The attack keeps, per sample, the CLOSEST adversarial iterate seen (L2),
mirroring the best-tracking convention of attacks/cw.py.

TPU design: every decision is a batched forward; the three inner loops
(binary search, probes, step halving) are ``lax.scan``s with per-sample
masks, so the whole ``iterations x (search + probes + halvings)`` query
schedule compiles to ONE XLA program — an eager implementation pays a host
round-trip per query batch (hundreds per image).  Randomness (init blends,
probe directions) uses explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def _l2(v: jnp.ndarray) -> jnp.ndarray:
    """Per-sample L2 over feature axes: [B,H,W,C] -> [B]."""
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2, 3)))


def hsja_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    steps: int = 10,
    n_probes: int = 32,
    bs_steps: int = 10,
    halvings: int = 10,
    init_trials: int = 12,
    theta: float = 0.01,
    key: jax.Array,
    x_init: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1] (untargeted L2).

    ``steps`` outer iterations; ``n_probes`` decision queries per gradient
    estimate; ``bs_steps`` bisections per boundary projection; ``halvings``
    geometric step trials.  Initialization tries ``init_trials`` fresh
    uniform-noise images at cycling blend weights (pure noise, then 1/2,
    1/4, 1/10 blends — the smaller blends rescue models whose decision
    regions swallow the noise distribution); ``x_init`` (same shape as x) seeds the search with
    known-misclassified points instead (the standard warm start).  Samples
    with no adversarial initialization are returned unchanged — a
    decision-based attack needs SOME misclassified point to walk from.
    """
    k_init, k_probe = jax.random.split(key)

    def is_adv(xq):
        return jnp.argmax(logits_fn(xq), axis=-1) != y_true  # [B] bool

    # --- initialization ---
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
        x_adv = jnp.where(initialized[:, None, None, None], x_init, x)
    else:
        alphas = jnp.asarray(
            [1.0, 0.5, 0.25, 0.1] * (int(init_trials) // 4 + 1),
            x.dtype)[: int(init_trials)]
        (x_adv, initialized), _ = lax.scan(
            init_body, (x, jnp.zeros(x.shape[:1], bool)),
            (jax.random.split(k_init, int(init_trials)), alphas))

    def binary_search(x_adv):
        """Bisect [x, x_adv] keeping the adversarial endpoint."""
        def body(carry, _):
            lo, hi = carry  # lo: original side, hi: adversarial side
            mid = 0.5 * (lo + hi)
            adv = is_adv(mid)[:, None, None, None]
            return (jnp.where(adv, lo, mid), jnp.where(adv, mid, hi)), None

        (_, hi), _ = lax.scan(body, (x, x_adv), None, length=int(bs_steps))
        return hi

    def estimate_normal(x_b, delta, k):
        """Monte-Carlo boundary normal: sum (phi_i - mean(phi)) u_i."""
        def probe(carry, kk):
            g_sum, phi_sum, u_sum = carry
            v = jax.random.normal(kk, x.shape, x.dtype)
            v = v / jnp.maximum(_l2(v), 1e-12)[:, None, None, None]
            cand = jnp.clip(x_b + delta[:, None, None, None] * v, 0.0, 1.0)
            phi = 2.0 * is_adv(cand).astype(x.dtype) - 1.0  # ±1
            return (g_sum + phi[:, None, None, None] * v,
                    phi_sum + phi, u_sum + v), None

        zeros = jnp.zeros_like(x)
        (g_sum, phi_sum, u_sum), _ = lax.scan(
            probe, (zeros, jnp.zeros(x.shape[:1], x.dtype), zeros),
            jax.random.split(k, int(n_probes)))
        g = g_sum - (phi_sum / n_probes)[:, None, None, None] * u_sum
        return g / jnp.maximum(_l2(g), 1e-12)[:, None, None, None]

    def step_search(x_b, v, d, t):
        """Largest eps in {d/sqrt(t), d/(2 sqrt t), ...} that stays adversarial."""
        eps0 = d / jnp.sqrt(t)

        def body(carry, i):
            chosen_eps, found = carry
            eps = eps0 / (2.0 ** i)
            cand = jnp.clip(x_b + eps[:, None, None, None] * v, 0.0, 1.0)
            adv = is_adv(cand)
            take = adv & ~found
            return (jnp.where(take, eps, chosen_eps), found | adv), None

        (eps_sel, found), _ = lax.scan(
            body, (jnp.zeros(x.shape[:1], x.dtype), jnp.zeros(x.shape[:1], bool)),
            jnp.arange(int(halvings), dtype=x.dtype))
        out = jnp.clip(x_b + eps_sel[:, None, None, None] * v, 0.0, 1.0)
        return jnp.where(found[:, None, None, None], out, x_b)

    # --- main loop: project -> estimate -> jump ---
    def outer(carry, tk):
        x_adv, best, best_d = carry
        t, kk = tk
        x_b = binary_search(x_adv)
        d = _l2(x_b - x)
        delta = theta * jnp.maximum(d, 1e-6)
        v = estimate_normal(x_b, delta, kk)
        x_new = step_search(x_b, v, d, t)
        # never adopt a non-adversarial iterate (estimator can misfire)
        x_adv = jnp.where(is_adv(x_new)[:, None, None, None], x_new, x_b)
        # best-so-far tracking (closest adversarial point).  x_adv is
        # adversarial by construction for every initialized sample (x_b
        # keeps the binary search's adversarial endpoint and x_new is
        # adopted only when adversarial), so no extra decision query is
        # spent here; uninitialized samples are masked out at return.
        d_now = _l2(x_adv - x)
        better = d_now < best_d
        best = jnp.where(better[:, None, None, None], x_adv, best)
        best_d = jnp.where(better, d_now, best_d)
        return (x_adv, best, best_d), None

    ts = jnp.arange(1, int(steps) + 1, dtype=x.dtype)
    keys = jax.random.split(k_probe, int(steps))
    init_best_d = jnp.where(initialized, _l2(x_adv - x), jnp.inf)
    (x_adv, best, _), _ = lax.scan(outer, (x_adv, x_adv, init_best_d), (ts, keys))

    # un-initialized samples return unchanged
    return jnp.where(initialized[:, None, None, None], best, x)
