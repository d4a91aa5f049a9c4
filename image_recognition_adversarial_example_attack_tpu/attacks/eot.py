"""EOT (expectation over transformation) and universal perturbations.

Two beyond-reference extensions that compose with the whole attack zoo:

``make_eot_logits_fn`` — Athalye et al., ICML 2018: wraps a logits fn so
every forward averages the SOFTMAX over n random transforms of the input.
Attacking the wrapped fn optimizes the expected loss under the transform
distribution — the standard way to break randomized defenses.  With the
default Gaussian-noise transform the wrapper is a differentiable Monte-
Carlo estimate of the randomized-smoothing classifier
(defenses/smoothing.py), i.e. the SmoothAdv setting (Salman et al.,
NeurIPS 2019): PGD on the wrapped fn attacks the smoothed model directly.

``universal_perturbation`` — one SHARED [H,W,C] delta maximizing the mean
CE over a whole batch (the PGD formulation of Moosavi-Dezfooli et al.'s
universal adversarial perturbations, CVPR 2017).  The delta broadcasts
over the batch inside one fused program, so the "dataset loop" of the
original algorithm becomes a single batched backward per step.

TPU design: the EOT samples evaluate as ONE [n*B] batched forward (the
transform keys are drawn from a fold-in counter so each attack-loop call
sees fresh draws while staying inside a single compiled program), and
jax differentiates straight through the average — no per-sample Python.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .api import LogitsFn

# transform: (key, x [B,H,W,C]) -> x' [B,H,W,C]
TransformFn = Callable[[jax.Array, jnp.ndarray], jnp.ndarray]


def gaussian_noise_transform(sigma: float) -> TransformFn:
    """The randomized-smoothing transform: x + N(0, sigma^2) (unclipped,
    matching defenses/smoothing.py's convention)."""

    def transform(key, x):
        return x + sigma * jax.random.normal(key, x.shape, x.dtype)

    return transform


def make_eot_logits_fn(
    logits_fn: LogitsFn,
    key: jax.Array,
    n_samples: int = 8,
    transform: TransformFn | None = None,
    sigma: float = 0.25,
) -> LogitsFn:
    """Wrap ``logits_fn`` so each call returns log(mean softmax) over
    ``n_samples`` random transforms — a drop-in logits fn for ANY attack
    in the zoo (the log of the smoothed classifier's class probabilities,
    so CE losses and argmax behave exactly as for a plain model).

    Stateless randomness: each wrapped call folds a counter derived from
    the input into ``key``, so successive attack steps see fresh transform
    draws while the whole attack still compiles to one program.
    """
    if transform is None:
        transform = gaussian_noise_transform(sigma)

    def eot_fn(x01: jnp.ndarray) -> jnp.ndarray:
        b = x01.shape[0]
        # fresh-but-traceable draws: mix the data into the key so each
        # attack iterate (a different x) sees different transforms.  The
        # mix is a wrapping int32 sum of the float BITS — sensitive to any
        # pixel change at any input scale (a scaled float sum saturates
        # int32 for realistic 224^2 batches and froze the draws)
        bits = jax.lax.bitcast_convert_type(x01.astype(jnp.float32), jnp.int32)
        mix = jnp.sum(bits)  # int32 addition wraps (two's complement)
        k = jax.random.fold_in(key, jax.lax.stop_gradient(mix))
        keys = jax.random.split(k, n_samples)
        stacked = jnp.concatenate(
            [transform(kk, x01) for kk in keys], axis=0)  # one [n*B] forward
        probs = jax.nn.softmax(logits_fn(stacked), axis=-1)
        probs = probs.reshape(n_samples, b, -1).mean(axis=0)
        return jnp.log(jnp.maximum(probs, 1e-12))

    return eot_fn


def universal_perturbation(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    eps: float,
    alpha: float,
    steps: int,
    key: jax.Array,
    random_start: bool = True,
) -> jnp.ndarray:
    """One L-inf-bounded delta [H,W,C] fooling as much of the batch as
    possible: PGD ascent on the batch-mean CE of ``x + delta``.

    Returns the DELTA (add it to any [0,1] image and clip).  The whole
    optimization is one fused scan; applying the shared delta broadcasts
    on-device, so batch size only changes the compiled program's batch
    dimension, not the host-side structure.

    This is the full-batch convenience form; the canonical trainer (epochs,
    mini-batch shuffling, targeted mode, loss history, fooling-rate metric)
    lives in ``attacks/uap.py`` — ``steps`` full-batch updates are exactly
    ``steps`` one-batch epochs there.
    """
    from .uap import uap_attack

    return uap_attack(
        logits_fn, x, y_true,
        eps=eps, alpha=alpha, epochs=steps, key=key, random_start=random_start,
    ).delta
