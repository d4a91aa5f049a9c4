"""Randomized smoothing: certified L2 robustness via Gaussian noise.

Cohen, Rosenfeld & Kolter, ICML 2019.  Beyond-reference extension: the
reference's defenses are empirical preprocessing + a feature detector
(defense_experiments.py:170-345) with no certification story; randomized
smoothing adds the standard *provable* counterpart — the smoothed
classifier g(x) = argmax_c P(f(x + N(0, sigma^2 I)) = c) is certifiably
constant within an L2 ball of radius

    R = sigma * Phi^{-1}(p_lower)

around x whenever the top class's lower confidence bound p_lower > 1/2.

TPU design: the whole Monte-Carlo estimate is the hot path — ``n`` noisy
copies of every image pushed through the base classifier.  Here the noise
draws, the forwards and the per-class vote histogram run as ONE jitted
program per chunk: a ``lax.scan`` over ``n/chunk`` rounds, each evaluating
a [chunk*B, H, W, C] batch (big static MXU batches) and accumulating
one-hot votes into a [B, num_classes] int32 carry.  Only the final counts
cross to the host, where the statistical tests run (exact binomial /
Clopper-Pearson via scipy — O(B) scalars, not device work).  Eager
per-sample noise loops (the usual torch implementation shape) would pay a
host round-trip per noise batch.

Following the original, noisy inputs are NOT clipped to [0,1]: the base
classifier sees x + noise exactly as sampled (certification assumes the
classifier is queried at the Gaussian's actual samples).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..attacks.api import LogitsFn

ABSTAIN = -1


@dataclass(frozen=True)
class SmoothingConfig:
    """Static configuration of the smoothed classifier.

    sigma  — Gaussian noise scale in [0,1] pixel units.
    n0     — selection samples (certify's class guess).
    n      — estimation samples (the certified bound's sample size).
    chunk  — noisy copies per compiled step; n0 and n round UP to full
             chunks (more samples never weakens the bound).
    alpha  — failure probability of the certificate / abstention test.
    max_batch — images per compiled program.  Each scan step evaluates a
             [chunk * min(B, max_batch)] batch; without this cap a large
             image directory would scale the device batch as chunk * B and
             blow HBM (v5e roofline batch for ResNet-50 @224 is 128, see
             benchmarks/ROOFLINE.md).  Larger inputs are processed in
             padded max_batch slices through the SAME compiled program.
    """

    sigma: float = 0.25
    n0: int = 32
    n: int = 512
    chunk: int = 32
    alpha: float = 0.001
    max_batch: int = 4


def _n_chunks(n: int, chunk: int) -> int:
    return max(1, -(-int(n) // int(chunk)))


def make_counts_fn(logits_fn: LogitsFn, chunk: int):
    """Returns ``counts(x, key, sigma, n_chunks) -> [B, K] int32`` votes.

    One jitted program; ``n_chunks`` is static (one compile per distinct
    sample budget) while ``sigma`` is a TRACED scalar — it only scales the
    noise arithmetic, so ONE compiled program serves a whole sigma sweep
    (the same dynamic-eps trick as eval/defense_eval.py; remote TPU
    compiles dominate sweep wall-clock).  Each scan step draws
    [chunk, B, H, W, C] Gaussian noise on-device, evaluates the base
    classifier on the flattened [chunk*B] batch, and scatter-adds one-hot
    argmax votes.
    """

    @partial(jax.jit, static_argnames=("n_chunks",))
    def counts(x: jnp.ndarray, key: jax.Array, sigma: jnp.ndarray,
               n_chunks: int) -> jnp.ndarray:
        b = x.shape[0]
        k_cls = logits_fn(x[:1]).shape[-1]
        sigma = jnp.asarray(sigma, x.dtype)

        def body(acc, k):
            noise = sigma * jax.random.normal(k, (chunk,) + x.shape, x.dtype)
            noisy = (x[None] + noise).reshape((chunk * b,) + x.shape[1:])
            preds = jnp.argmax(logits_fn(noisy), axis=-1).reshape(chunk, b)
            votes = jnp.sum(jax.nn.one_hot(preds, k_cls, dtype=jnp.int32), axis=0)
            return acc + votes, None

        keys = jax.random.split(key, n_chunks)
        acc0 = jnp.zeros((b, k_cls), jnp.int32)
        acc, _ = lax.scan(body, acc0, keys)
        return acc

    counts.chunk = int(chunk)  # consumers verify against their config
    return counts


def _binom_p_lower(successes: int, trials: int, alpha: float) -> float:
    """One-sided (1-alpha) Clopper-Pearson lower confidence bound."""
    from scipy.stats import beta

    if successes == 0:
        return 0.0
    return float(beta.ppf(alpha, successes, trials - successes + 1))


def _binom_two_sided_p(k: int, n: int) -> float:
    """Two-sided exact binomial test p-value against p=0.5."""
    from scipy.stats import binomtest

    return float(binomtest(k, n, 0.5).pvalue)


class SmoothedClassifier:
    """Cohen et al.'s PREDICT / CERTIFY over a jitted Monte-Carlo core."""

    def __init__(self, logits_fn: LogitsFn, config: SmoothingConfig = SmoothingConfig(),
                 counts_fn=None):
        """``counts_fn`` lets several classifiers (e.g. a sigma sweep) share
        ONE compiled voting program — build it with ``make_counts_fn``.  Its
        chunk must equal ``config.chunk``: the sample-count statistics
        (n_chunks * chunk votes) are computed from the config, and a
        mismatched program would silently draw a different number of votes
        than the binomial bounds assume."""
        self.config = config
        if counts_fn is not None:
            fn_chunk = getattr(counts_fn, "chunk", None)
            if fn_chunk is not None and int(fn_chunk) != int(config.chunk):
                raise ValueError(
                    f"counts_fn was built with chunk={fn_chunk} but the "
                    f"config says chunk={config.chunk}; the certificate's "
                    "vote count would be wrong")
        self._counts = counts_fn or make_counts_fn(logits_fn, config.chunk)

    def _sample(self, x: jnp.ndarray, key: jax.Array, n: int) -> np.ndarray:
        """Vote counts for every image, sliced to ``max_batch`` images per
        device program (the tail slice is zero-padded so every call hits the
        same compiled program; padded rows are dropped)."""
        n_chunks = _n_chunks(n, self.config.chunk)
        b = x.shape[0]
        mb = max(1, min(int(self.config.max_batch), b))
        out = []
        for i in range(0, b, mb):
            part = x[i:i + mb]
            valid = part.shape[0]
            if valid < mb:
                pad = jnp.zeros((mb - valid,) + x.shape[1:], x.dtype)
                part = jnp.concatenate([part, pad], axis=0)
            counts = self._counts(part, jax.random.fold_in(key, i),
                                  jnp.float32(self.config.sigma), n_chunks)
            out.append(np.asarray(jax.device_get(counts))[:valid])
        return np.concatenate(out, axis=0)

    def predict(self, x: jnp.ndarray, key: jax.Array) -> np.ndarray:
        """PREDICT (paper alg. 2): [B,H,W,C] -> [B] classes, ABSTAIN when the
        top-two vote split is not significant at level alpha."""
        counts = self._sample(x, key, self.config.n)
        out = np.full((counts.shape[0],), ABSTAIN, np.int64)
        for i, row in enumerate(counts):
            top2 = np.argsort(-row)[:2]
            na, nb = int(row[top2[0]]), int(row[top2[1]])
            if na + nb > 0 and _binom_two_sided_p(na, na + nb) <= self.config.alpha:
                out[i] = int(top2[0])
        return out

    def certify(self, x: jnp.ndarray, key: jax.Array) -> tuple[np.ndarray, np.ndarray]:
        """CERTIFY (paper alg. 1): [B,H,W,C] -> ([B] classes, [B] L2 radii).

        Abstentions get class ABSTAIN and radius 0.  The class guess uses n0
        fresh samples; the bound uses n independent samples (independence is
        what makes the certificate valid)."""
        from scipy.stats import norm

        k0, k1 = jax.random.split(jnp.asarray(key))
        counts0 = self._sample(x, k0, self.config.n0)
        counts = self._sample(x, k1, self.config.n)
        n_total = _n_chunks(self.config.n, self.config.chunk) * self.config.chunk

        classes = np.full((counts.shape[0],), ABSTAIN, np.int64)
        radii = np.zeros((counts.shape[0],), np.float64)
        for i in range(counts.shape[0]):
            c_hat = int(np.argmax(counts0[i]))
            p_lower = _binom_p_lower(int(counts[i, c_hat]), n_total, self.config.alpha)
            if p_lower > 0.5:
                classes[i] = c_hat
                radii[i] = self.config.sigma * float(norm.ppf(p_lower))
        return classes, radii
