"""Universal adversarial perturbations (UAP): ONE delta that fools many images.

Threat model: the attacker trains a single image-shaped perturbation
``delta`` (L-inf bounded) offline on a set of images, then applies the SAME
delta to any future input — no per-sample optimization at deploy time.
Classic formulation: Moosavi-Dezfooli et al., "Universal adversarial
perturbations" (CVPR 2017).  That original algorithm is inherently
sequential (per-image DeepFool inner solves, host-driven aggregation) and
maps terribly onto a systolic-array accelerator, so this module implements
the stochastic-gradient formulation instead (Shafahi et al., "Universal
adversarial training", AAAI 2020): sign-gradient ascent on the mean batch
loss with an eps-ball projection — the same math PGD uses, lifted from a
per-sample delta to a shared one.

TPU design:

- The ENTIRE optimization (epochs x batches x forward+backward + projection)
  is one ``lax.scan``-nested jitted program: zero host round-trips, static
  shapes throughout.  Per-epoch shuffling happens inside the trace via
  ``jax.random.permutation`` on an explicit key.
- The gradient w.r.t. the shared delta is the SUM of per-sample input
  gradients — under a batch-sharded ('data') mesh XLA lowers that reduction
  to a single ``psum`` over ICI, so UAP training data-parallelizes with no
  extra code (tests/test_sharding.py::test_uap_sharded_equals_single_device).
- ``batch_size`` trades HBM for arithmetic intensity exactly like training;
  a remainder tail would force a second program shape, so the tail is
  dropped (documented; shuffle re-draws it every epoch).

Beyond-reference extension: the reference repo has no universal-perturbation
capability (its attacks are all per-sample, defense_experiments.py:534-576).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn, cross_entropy_sum


class UAPResult(NamedTuple):
    """delta: [H,W,C] universal perturbation (|delta| <= eps, x+delta may
    still be clipped to [0,1] at apply time); loss_per_epoch: [epochs] mean
    surrogate objective on each epoch's LAST mini-batch (pre-update),
    sign-normalized so INCREASING means the attack is improving — a free
    ascent diagnostic (reuses the training forward, costs nothing)."""

    delta: jnp.ndarray
    loss_per_epoch: jnp.ndarray


def apply_uap(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """clip(x + delta, 0, 1) — delta broadcasts over the batch axis."""
    return jnp.clip(x + delta, 0.0, 1.0)


def uap_attack(
    logits_fn: LogitsFn,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    *,
    eps: float,
    alpha: float | None = None,
    epochs: int = 10,
    batch_size: int | None = None,
    key: jax.Array,
    y_target: int | None = None,
    random_start: bool = False,
) -> UAPResult:
    """Train a universal L-inf perturbation on ``xs [N,H,W,C] / ys [N]``.

    Untargeted: ascend the mean cross-entropy of the true labels (any
    misclassification counts).  With ``y_target`` (a single class index —
    the perturbation is universal, so the target is too): descend the
    target's cross-entropy.

    ``alpha`` defaults to ``eps/10`` (the PGD-style heuristic); ``batch_size``
    defaults to full-batch.  N must be >= batch_size; the per-epoch
    remainder (N mod batch_size) is dropped after shuffling.
    ``random_start`` initializes delta uniform in the eps ball instead of
    zeros (the per-sample-PGD convention; zeros is the UAP-paper default).
    """
    init_key, loop_key = jax.random.split(key)
    n = int(xs.shape[0])
    if batch_size is None:
        batch_size = n
    batch_size = int(batch_size)
    if not 0 < batch_size <= n:
        raise ValueError(f"batch_size {batch_size} must be in [1, {n}]")
    if alpha is None:
        alpha = float(eps) / 10.0
    n_batches = n // batch_size

    if y_target is None:
        y_all = ys
        direction = 1.0
    else:
        y_all = jnp.full_like(ys, int(y_target))
        direction = -1.0

    def batch_loss(delta, xb, yb):
        logits = logits_fn(apply_uap(xb, delta))
        return cross_entropy_sum(logits, yb) / xb.shape[0]

    grad_fn = jax.value_and_grad(batch_loss)
    full_batch = n_batches == 1 and batch_size == n

    def epoch_body(delta, epoch_key):
        if full_batch:
            # shuffling a single full batch is a mathematical no-op on the
            # summed gradient — skip the permutation + gather entirely
            idx = jnp.arange(n)[None]
        else:
            perm = jax.random.permutation(epoch_key, n)
            idx = perm[: n_batches * batch_size].reshape(n_batches, batch_size)

        def batch_body(delta, bidx):
            if full_batch:  # static: the gather would be an identity
                xb, yb = xs, y_all
            else:
                xb = jnp.take(xs, bidx, axis=0)
                yb = jnp.take(y_all, bidx, axis=0)
            loss, g = grad_fn(delta, xb, yb)
            delta = delta + alpha * direction * jnp.sign(g).astype(delta.dtype)
            return jnp.clip(delta, -eps, eps), loss

        delta, losses = lax.scan(batch_body, delta, idx)
        return delta, direction * losses[-1]

    if random_start:
        delta0 = jax.random.uniform(
            init_key, xs.shape[1:], xs.dtype, minval=-eps, maxval=eps
        )
    else:
        delta0 = jnp.zeros(xs.shape[1:], xs.dtype)
    keys = jax.random.split(loop_key, int(epochs))
    delta, losses = lax.scan(epoch_body, delta0, keys)
    return UAPResult(delta=delta, loss_per_epoch=losses)


def uap_fooling_rate(
    logits_fn: LogitsFn, xs: jnp.ndarray, delta: jnp.ndarray
) -> jnp.ndarray:
    """Fraction of samples whose PREDICTION flips under x -> x+delta (the
    UAP paper's metric — measured against the model's own clean prediction,
    not ground truth, so it is label-free)."""
    clean = jnp.argmax(logits_fn(xs), axis=-1)
    adv = jnp.argmax(logits_fn(apply_uap(xs, delta)), axis=-1)
    return jnp.mean((clean != adv).astype(jnp.float32))
