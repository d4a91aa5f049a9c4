"""Mahalanobis-distance adversarial detector (Lee et al., NeurIPS 2018).

"A Simple Unified Framework for Detecting Out-of-Distribution Samples and
Adversarial Attacks": fit class-conditional Gaussians with a TIED
covariance on a feature layer; a sample's score is its Mahalanobis
distance to the NEAREST class centroid.  Clean inputs sit close to their
class's Gaussian; adversarial inputs land in the low-density no-man's-land
between centroids, so the min-distance score separates them.  Third
detector choice next to the reference's feature-statistics score
(defenses/detector.py, defense_experiments.py:245-270) and feature
squeezing — beyond-reference.

TPU design: fitting is three batched reductions (segment-sum class means,
one centered Gram matrix, a Cholesky inverse) — no per-class Python loop;
scoring is ONE ``[B,K,C] x [C,C]`` einsum against all K centroids at once,
fused into the cell program like every other detector.  The paper's
per-layer logistic-regression ensemble and input pre-processing step are
deliberately out of scope: the single-layer min-distance score is the
standard deployment and keeps the detector a pure function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .detector import FeaturesFn


class MahalanobisParams(NamedTuple):
    mean: jnp.ndarray       # [K, C] class centroids
    precision: jnp.ndarray  # [C, C] shared inverse covariance


def pool_features(feats: jnp.ndarray) -> jnp.ndarray:
    """Feature map -> one vector per sample: NHWC maps are spatially
    mean-pooled (the paper's reduction); [B,K] vectors pass through."""
    if feats.ndim == 4:
        return jnp.mean(feats, axis=(1, 2))
    return feats.reshape(feats.shape[0], -1)


def fit_mahalanobis(
    feats: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    shrinkage: float = 0.05,
) -> MahalanobisParams:
    """Fit tied-covariance class Gaussians from pooled features [N, C].

    ``shrinkage`` ridges the covariance toward its scaled identity
    (``S + shrink * tr(S)/C * I``) so the fit stays well-posed when the
    calibration set is smaller than the feature width — the N < C regime
    every 100-image calibration run on a 1024-channel stage-3 map is in.
    Empty classes inherit the GLOBAL centroid: their distance then equals
    the distance to the data mean instead of NaN-poisoning every score.
    """
    # HIGHEST precision throughout: the Gram accumulation and the solve
    # are exactly the bf16-on-TPU-sensitive reductions CLAUDE.md calls
    # out (an ill-conditioned N<C covariance amplifies accumulation error
    # through the Cholesky inverse)
    hp = jax.lax.Precision.HIGHEST
    feats = feats.astype(jnp.float32)
    n, c = feats.shape
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # [N,K]
    counts = jnp.sum(onehot, axis=0)                                  # [K]
    sums = jnp.matmul(onehot.T, feats, precision=hp)                  # [K,C]
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    global_mean = jnp.mean(feats, axis=0)
    mean = jnp.where((counts > 0)[:, None], mean, global_mean[None, :])

    centered = feats - mean[labels]                                   # [N,C]
    cov = jnp.matmul(centered.T, centered,
                     precision=hp) / jnp.maximum(float(n), 1.0)
    ridge = shrinkage * (jnp.trace(cov) / c + 1e-6)
    cov = cov + ridge * jnp.eye(c, dtype=jnp.float32)
    # precision via Cholesky: solve L L^T P = I (stable vs direct inv)
    chol = jax.scipy.linalg.cho_factor(cov, lower=True)
    precision = jax.scipy.linalg.cho_solve(chol, jnp.eye(c, dtype=jnp.float32))
    return MahalanobisParams(mean=mean, precision=precision)


def mahalanobis_score_from_features(
    feats: jnp.ndarray, params: MahalanobisParams
) -> jnp.ndarray:
    """[B,...] features -> [B] distance to the nearest class centroid."""
    z = pool_features(feats)                                   # [B,C]
    diff = z[:, None, :] - params.mean[None, :, :]             # [B,K,C]
    d = jnp.einsum("bkc,cd,bkd->bk", diff, params.precision, diff,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.min(jnp.maximum(d, 0.0), axis=-1)


def mahalanobis_score(
    features_fn: FeaturesFn, x: jnp.ndarray, params: MahalanobisParams
) -> jnp.ndarray:
    return mahalanobis_score_from_features(features_fn(x), params)


def is_adversarial_by_mahalanobis(
    features_fn: FeaturesFn,
    x: jnp.ndarray,
    params: MahalanobisParams,
    threshold,
) -> jnp.ndarray:
    """[B] bool — True means flagged as adversarial."""
    return mahalanobis_score(features_fn, x, params) > jnp.asarray(
        threshold, jnp.float32)


def calibrate_mahalanobis(
    features_fn: FeaturesFn,
    x_clean: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    n: int = 100,
    quantile: float = 0.95,
    shrinkage: float = 0.05,
) -> tuple[MahalanobisParams, float]:
    """Fit on (up to n of) a clean batch + its labels (the grid CLI passes
    clean-prediction pseudo-labels, its standing convention — reference
    defense_experiments.py:818-819), then threshold at the q-quantile of
    the clean scores.  One fused program: features, fit, and scores."""
    num = min(int(n), x_clean.shape[0])
    if num <= 0:
        raise ValueError("no calibration images available")

    @jax.jit
    def fit_and_score(xx, yy):
        z = pool_features(features_fn(xx))
        params = fit_mahalanobis(z, yy, num_classes, shrinkage)
        return params, mahalanobis_score_from_features(z, params)

    params, scores = fit_and_score(x_clean[:num], labels[:num])
    return params, float(jnp.quantile(scores, quantile))
