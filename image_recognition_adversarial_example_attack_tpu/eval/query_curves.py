"""Query-efficiency curves for the black-box attacks.

The standard comparison artifact of the black-box literature (Ilyas et
al. 2018, Guo et al. 2019, Andriushchenko et al. 2020): attack-success
rate as a function of the model-query budget.  The reference has no
black-box query evaluation at all (its black-box story is transfer
only).

TPU design: a naive budget sweep reruns the attack at every checkpoint
(O(sum of budgets) forwards).  Here every supported attack's scan emits
its per-step success mask (``return_history=True`` — stacked by the scan
at zero or one extra forward per step), so ONE run at the maximum budget
yields the exact full curve: ASR-at-step is the cummax of the mask, and
steps convert to queries by each attack's per-step query cost.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks.api import LogitsFn

CURVE_ATTACKS = ("square", "square_l2", "simba", "nes", "spsa", "bandits")


def _runner(attack: str, logits_fn: LogitsFn, *, eps: float, steps: int,
            est_samples: int, nes_sigma: float, spsa_delta: float,
            alpha: float, simba_eps: float, simba_mode: str) -> tuple[Callable, int, int]:
    """(fn(x, y, key) -> (x_adv, succ_hist [steps,B]), queries_per_step,
    init_queries)."""
    if attack == "square":
        from ..attacks.square import square_attack

        return (lambda x, y, k: square_attack(
            logits_fn, x, y, eps=eps, steps=steps, key=k,
            return_history=True)), 1, 2
    if attack == "square_l2":
        from ..attacks.square import square_l2_attack

        return (lambda x, y, k: square_l2_attack(
            logits_fn, x, y, eps=eps, steps=steps, key=k,
            return_history=True)), 1, 2
    if attack == "simba":
        from ..attacks.simba import simba_attack

        return (lambda x, y, k: simba_attack(
            logits_fn, x, y, steps=steps, eps=simba_eps, mode=simba_mode,
            key=k, return_history=True)), 2, 1
    if attack in ("nes", "spsa"):
        from ..attacks.grad_est import nes_attack, spsa_attack

        fn = nes_attack if attack == "nes" else spsa_attack
        kw = ({"sigma": nes_sigma} if attack == "nes"
              else {"delta": spsa_delta})
        return (lambda x, y, k: fn(
            logits_fn, x, y, eps=eps, alpha=alpha, steps=steps, key=k,
            n_samples=est_samples, return_history=True, **kw)), \
            2 * est_samples, 0
    if attack == "bandits":
        from ..attacks.bandits import bandits_attack

        return (lambda x, y, k: bandits_attack(
            logits_fn, x, y, eps=eps, alpha=alpha, steps=steps, key=k,
            return_history=True)), 2, 0
    raise ValueError(f"no query-curve support for attack '{attack}'")


def query_curve(
    attack: str,
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    eps: float,
    max_queries: int,
    key: jax.Array,
    est_samples: int = 32,
    nes_sigma: float = 1e-3,
    spsa_delta: float = 1e-2,
    alpha: float = 2 / 255,
    simba_eps: float = 0.2,
    simba_mode: str = "dct",
) -> dict:
    """ONE attack run at the max budget -> the exact ASR-vs-queries curve.

    Returns {"queries": [int], "asr": [float], "final_asr": float,
    "median_queries_to_success": float|None} where queries[i] is the
    cumulative query count after step i+1 and asr[i] the fraction of the
    batch fooled within that budget (cummax of the per-step mask —
    success is never un-counted by a later step).
    """
    steps = budget_to_steps(attack, max_queries, est_samples)
    fn, per_step, init_q = _runner(
        attack, logits_fn, eps=eps, steps=steps, est_samples=est_samples,
        nes_sigma=nes_sigma, spsa_delta=spsa_delta, alpha=alpha,
        simba_eps=simba_eps, simba_mode=simba_mode)
    _, hist = jax.jit(fn)(x, y, key)
    hist = np.asarray(jax.device_get(hist))          # [steps, B] bool
    ever = np.maximum.accumulate(hist, axis=0)       # success is sticky
    first = np.where(ever.any(axis=0), ever.argmax(axis=0), -1)  # [B]
    return assemble_curve(attack, ever.sum(axis=1), hist.shape[1], first,
                          per_step=per_step, init_q=init_q, steps=steps)


def budget_to_steps(attack: str, max_queries: int,
                    est_samples: int = 32) -> int:
    """Scan length from the query budget (at least 1) via each attack's
    per-step probe cost and init cost."""
    probe_cost = {"square": 1, "square_l2": 1, "simba": 2, "bandits": 2,
                  "nes": 2 * est_samples, "spsa": 2 * est_samples}[attack]
    init_q = {"square": 2, "square_l2": 2, "simba": 1, "bandits": 0,
              "nes": 0, "spsa": 0}[attack]
    return max(1, (int(max_queries) - init_q) // probe_cost)


def assemble_curve(attack: str, ever_count: np.ndarray, count: int,
                   first: np.ndarray, *, per_step: int, init_q: int,
                   steps: int) -> dict:
    """Curve dict from the two streamable reductions: the per-step
    ever-succeeded count ([steps] — the ASR numerator) and each sample's
    first-success step ([N], -1 = never).  Shared by the one-batch path
    and eval/streaming.py::stream_query_curve_hist, so the two assemble
    byte-identical JSON for the same statistics."""
    asr = np.asarray(ever_count, np.float64) / max(int(count), 1)
    queries = init_q + per_step * np.arange(1, steps + 1)
    first = np.asarray(first)
    solved = first >= 0
    median_q = (float(np.median(init_q + per_step * (first[solved] + 1)))
                if solved.any() else None)
    return {
        "attack": attack,
        "queries": [int(q) for q in queries],
        "asr": [float(a) for a in asr],
        "final_asr": float(asr[-1]),
        "median_queries_to_success": median_q,
    }


def curve_at_checkpoints(curve: dict, checkpoints) -> list[tuple[int, float]]:
    """Sample the full curve at ascending query checkpoints (ASR at the
    largest computed budget <= checkpoint; 0.0 before the first)."""
    qs = np.asarray(curve["queries"])
    asr = np.asarray(curve["asr"])
    out = []
    for cp in checkpoints:
        idx = np.searchsorted(qs, cp, side="right") - 1
        out.append((int(cp), float(asr[idx]) if idx >= 0 else 0.0))
    return out
