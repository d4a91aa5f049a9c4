"""Perturbation quality metrics, all in jnp (device-resident, jit-safe).

Parity with reference visualized_attacks.py:228-262 (which used
torchmetrics SSIM + numpy):

- L-inf / L2 / L1 norms of the perturbation (whole-batch norms, matching
  ``torch.norm`` over the full tensor),
- SSIM (gaussian 11x11, sigma 1.5, k1=0.01, k2=0.03, data_range=1.0 — the
  torchmetrics defaults),
- PSNR = 20*log10(1/sqrt(MSE)),
- perturbed-pixel percentage (|delta| > 1/255),
- high-frequency FFT ratio (share of spectrum bins above the mean magnitude).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2d_per_channel(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID 2-D filter on [B,H,W,C]."""
    c = x.shape[-1]
    kern = jnp.tile(kernel2d[:, :, None, None], (1, 1, 1, c))  # HWIO, feature_group_count=C
    return lax.conv_general_dilated(
        x,
        kern.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # TPU executes f32 convs in bf16 at default precision; the
        # E[x^2]-E[x]^2 cancellation in SSIM then produces garbage (>1
        # scores). Force full precision — this op is microscopic.
        precision=lax.Precision.HIGHEST,
    )


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over a [B,H,W,C] pair (scalar), torchmetrics-default recipe.

    Exactly the batch mean of ``ssim_per_sample`` (equal element counts per
    sample, so mean-of-per-sample-means == global mean) — one SSIM body."""
    return jnp.mean(ssim_per_sample(
        a, b, data_range=data_range, kernel_size=kernel_size, sigma=sigma,
        k1=k1, k2=k2))


def ssim_per_sample(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-sample SSIM over a [B,H,W,C] pair -> [B].

    The streaming harnesses (eval/streaming.py) accumulate this vector
    across fixed-shape chunks; its host-side mean equals ``ssim`` on the
    one-batch path up to float summation order (every sample's SSIM map
    has the same element count, so mean-of-means == global mean)."""
    kernel = _gaussian_kernel(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _filter2d_per_channel(a, kernel)
    mu_b = _filter2d_per_channel(b, kernel)
    sigma_aa = _filter2d_per_channel(a * a, kernel) - mu_a * mu_a
    sigma_bb = _filter2d_per_channel(b * b, kernel) - mu_b * mu_b
    sigma_ab = _filter2d_per_channel(a * b, kernel) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sigma_ab + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (sigma_aa + sigma_bb + c2)
    return jnp.mean((num / den).reshape(a.shape[0], -1), axis=-1)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(a - b))
    return jnp.where(
        mse > 1e-10,
        20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(mse),
        jnp.array(100.0, a.dtype),
    )


def high_freq_ratio(diff: jnp.ndarray) -> jnp.ndarray:
    """% of FFT bins above mean |FFT| for the first image's per-channel
    spectrum (reference computed fft2 of the CHW diff of image 0,
    visualized_attacks.py:251-252; here HWC — fft over H,W per channel)."""
    d0 = diff[0]  # [H, W, C]
    fft = jnp.fft.fft2(d0, axes=(0, 1))
    mag = jnp.abs(fft)
    return jnp.mean((mag > jnp.mean(mag)).astype(jnp.float32)) * 100.0


def attack_metrics(x_clean: jnp.ndarray, x_adv: jnp.ndarray) -> dict:
    """The reference's 7-metric dict (visualized_attacks.py:254-262),
    computed in one jit-able pass.  Keys preserved verbatim."""
    diff = x_adv - x_clean
    out = {
        "L∞ (pixel)": jnp.max(jnp.abs(diff)),
        "L2": jnp.sqrt(jnp.sum(jnp.square(diff))),
        "L1": jnp.sum(jnp.abs(diff)),
        "SSIM": ssim(x_clean, x_adv),
        "PSNR": psnr(x_clean, x_adv),
        "Perturbed Pixels %": jnp.mean((jnp.abs(diff) > 1.0 / 255.0).astype(jnp.float32)) * 100.0,
        "High Freq Ratio %": high_freq_ratio(diff),
    }
    return out


def metrics_to_python(metrics: dict) -> dict:
    return {k: float(np.asarray(v)) for k, v in metrics.items()}


def expected_calibration_error(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    n_bins: int = 15,
) -> jnp.ndarray:
    """ECE (Guo et al. 2017): confidence-vs-accuracy gap, equal-width bins.

    ``probs`` [B,K] softmax outputs, ``labels`` [B] int — returns a scalar
    in [0,1].  Beyond-reference extension: adversarial examples don't just
    flip predictions, they destroy calibration (a model can stay "accurate
    enough" under small eps while becoming wildly over-confident);
    comparing clean vs adversarial ECE quantifies that axis.

    TPU design: bin membership as a one-hot [B, n_bins] mask matmul —
    no sorting, no segment_sum with dynamic shapes; jits and shards over
    the batch like every other counter.
    """
    conf = jnp.max(probs, axis=-1)                       # [B]
    correct = (jnp.argmax(probs, axis=-1) == labels).astype(jnp.float32)
    return ece_from_conf_correct(conf, correct, n_bins=n_bins)


def ece_from_conf_correct(
    conf: jnp.ndarray,
    correct: jnp.ndarray,
    n_bins: int = 15,
) -> jnp.ndarray:
    """ECE from the per-sample (confidence, correctness) vectors.

    The decomposition point the streaming harnesses rely on: ECE is a
    function of per-bin sums only, so concatenating per-chunk ``conf`` /
    ``correct`` vectors on the host and calling this once reproduces the
    one-batch value exactly (same one-hot matmul binning)."""
    conf = jnp.asarray(conf, jnp.float32)
    correct = jnp.asarray(correct, jnp.float32)
    # bin index in [0, n_bins-1]; conf=1.0 lands in the last bin
    idx = jnp.minimum((conf * n_bins).astype(jnp.int32), n_bins - 1)
    onehot = jax.nn.one_hot(idx, n_bins, dtype=jnp.float32)  # [B, n_bins]
    count = jnp.sum(onehot, axis=0)                      # [n_bins]
    acc_sum = correct @ onehot                           # [n_bins]
    conf_sum = conf @ onehot                             # [n_bins]
    gap = jnp.abs(acc_sum - conf_sum) / jnp.maximum(count, 1.0)
    return jnp.sum(gap * count) / jnp.maximum(jnp.sum(count), 1.0)
