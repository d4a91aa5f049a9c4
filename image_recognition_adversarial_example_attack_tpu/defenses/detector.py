"""Feature-statistics adversarial detector + quantile calibration.

Score semantics parity with reference defense_experiments.py:221-270, on the
ResNet stage-3 ("layer3") feature map:

  score = sqrt(sum_{C,H,W} f^2) / C  +  0.1 * mean_C( var_{H,W}(f) )
  clipped to [0, 100]

(torch ``.var`` default is the unbiased estimator; matched here with
``ddof=1``.)  Flag rule: ``score > threshold``.  Calibration: score <= n
clean images, take the q-quantile (linear interpolation, like
torch.quantile), halve if > 50, floor at 1.0
(defense_experiments.py:288-345).

TPU design: features come from applying the model's ``features_stage3``
method — XLA dead-code-eliminates stage 4 + the head — and the whole
detector is one jitted batched program; calibration is a single
``jnp.quantile`` over a score vector that can be gathered across chips with
a mesh ``all_gather`` rather than a Python loop over images.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

FeaturesFn = Callable[[jnp.ndarray], jnp.ndarray]  # x01 [B,H,W,3] -> [B,h,w,C]


def make_features_fn(module: Any, variables: dict, mean, std, input_dtype=None) -> FeaturesFn:
    """x in [0,1] -> stage-3 feature map [B,h,w,C] (float32).

    Falls back to the module's plain ``__call__`` when it has no
    ``features_stage3`` (reference fallback branches
    defense_experiments.py:259-270 cover non-ResNet models the same way;
    score_from_features handles both output ranks).
    """
    from ..attacks.api import make_logits_fn

    method = getattr(type(module), "features_stage3", None)
    return make_logits_fn(module, variables, mean, std,
                          input_dtype=input_dtype, method=method)


def score_from_features(feats: jnp.ndarray) -> jnp.ndarray:
    """Detector score per sample; accepts NHWC maps or [B,K] logits."""
    batch = feats.shape[0]
    if feats.ndim == 4:  # [B, H, W, C]
        channels = feats.shape[-1]
        feat_l2 = jnp.sqrt(jnp.sum(jnp.square(feats), axis=(1, 2, 3))) / channels
        # variance over spatial dims per channel (unbiased, torch default),
        # then mean over channels
        feat_var = jnp.mean(jnp.var(feats, axis=(1, 2), ddof=1), axis=-1)
        score = feat_l2 + 0.1 * feat_var
    elif feats.ndim == 2:
        score = jnp.linalg.norm(feats, axis=-1)
    else:
        score = jnp.linalg.norm(feats.reshape(batch, -1), axis=-1)
    return jnp.clip(score, 0.0, 100.0)


def feature_score(features_fn: FeaturesFn, x: jnp.ndarray) -> jnp.ndarray:
    return score_from_features(features_fn(x))


def is_adversarial_by_feature(
    features_fn: FeaturesFn,
    x: jnp.ndarray,
    threshold,
) -> jnp.ndarray:
    """[B] bool — True means flagged as adversarial."""
    return feature_score(features_fn, x) > jnp.asarray(threshold, jnp.float32)


def threshold_from_scores(scores: jnp.ndarray, quantile: float = 0.95) -> float:
    """Quantile + the reference's sanity rails (halve >50, floor 1.0)."""
    thr = float(jnp.quantile(scores, quantile))
    if thr > 50.0:
        return thr * 0.5
    return max(thr, 1.0)


def squeezing_score(logits_fn, x: jnp.ndarray, quant_levels: int = 16) -> jnp.ndarray:
    """Feature-squeezing detector score (Xu, Evans & Qi, NDSS 2018 —
    beyond-reference extension; the reference ships the feature-statistics
    detector above only).

    Score = max over squeezers of the L1 distance between the model's
    softmax on the raw input and on the squeezed input, squeezers being the
    framework's own preprocessing defenses (bit-depth quantization and 3x3
    mean smoothing, defenses/preprocess.py).  Adversarial inputs rely on
    high-frequency / low-amplitude structure the squeezers destroy, so
    their prediction moves much further than a clean input's.

    One jitted program: three model forwards + two squeezers, no host trips.
    """
    from .preprocess import defense_quantization, defense_smoothing

    p_raw = jax.nn.softmax(logits_fn(x), axis=-1)
    p_quant = jax.nn.softmax(logits_fn(defense_quantization(x, quant_levels)), axis=-1)
    p_smooth = jax.nn.softmax(logits_fn(defense_smoothing(x)), axis=-1)
    d_quant = jnp.sum(jnp.abs(p_raw - p_quant), axis=-1)
    d_smooth = jnp.sum(jnp.abs(p_raw - p_smooth), axis=-1)
    return jnp.maximum(d_quant, d_smooth)


def is_adversarial_by_squeezing(
    logits_fn,
    x: jnp.ndarray,
    threshold,
    quant_levels: int = 16,
) -> jnp.ndarray:
    """[B] bool — True means flagged as adversarial."""
    return squeezing_score(logits_fn, x, quant_levels) > jnp.asarray(
        threshold, jnp.float32
    )


def calibrate_squeezing_threshold(
    logits_fn,
    x_clean: jnp.ndarray,
    n: int = 100,
    quantile: float = 0.95,
    quant_levels: int = 16,
) -> float:
    """q-quantile of clean squeezing scores (the paper picks the threshold
    for a target clean false-positive rate the same way).  One batched
    program, mirroring calibrate_feature_threshold."""
    num = min(int(n), x_clean.shape[0])
    if num <= 0:
        raise ValueError("no calibration images available")
    scores = jax.jit(
        lambda xx: squeezing_score(logits_fn, xx, quant_levels)
    )(x_clean[:num])
    return float(jnp.quantile(scores, quantile))


def calibrate_feature_threshold(
    features_fn: FeaturesFn,
    x_clean: jnp.ndarray,
    n: int = 100,
    quantile: float = 0.95,
    verbose: bool = True,
) -> float:
    """Calibrate on (up to n of) a clean batch. One batched program, not a
    per-image loop (cf. defense_experiments.py:309-317)."""
    num = min(int(n), x_clean.shape[0])
    if num <= 0:
        raise ValueError("no calibration images available")
    scores = jax.jit(lambda xx: feature_score(features_fn, xx))(x_clean[:num])
    if verbose:
        print(f"Calibrating detector threshold on {num} clean images...")
        print("Calibration stats:")
        print(f"  score range: {float(scores.min()):.4f} ~ {float(scores.max()):.4f}")
        print(f"  mean: {float(scores.mean()):.4f}")
        print(f"  median: {float(jnp.median(scores)):.4f}")
    thr = threshold_from_scores(scores, quantile)
    if verbose:
        print(f"  {quantile * 100:.0f}% quantile (threshold): {thr:.4f}")
    return thr
