"""Common-corruption robustness bank (ImageNet-C family), TPU-native.

Beyond-reference subsystem: the reference evaluates *adversarial*
robustness only; the standard companion axis in the robustness literature
is accuracy under common corruptions (Hendrycks & Dietterich,
"Benchmarking Neural Network Robustness to Common Corruptions and
Perturbations", ICLR 2019 — the ImageNet-C benchmark).  This module
re-derives that corruption bank as pure-jnp batch transforms so the whole
evaluation runs on device:

- every corruption is a pure function ``fn(x, row, key)`` over a batched
  ``[B,H,W,C]`` image tensor in [0,1] (NHWC, the house convention) —
  jit/vmap/pjit-safe, no host round-trips, no PIL/scipy/OpenCV;
- **severity is a TRACED parameter**: per-severity constants live in a
  5-row table indexed by a traced ``severity`` scalar, so ONE compiled
  program serves the whole severity sweep (the same dynamic-eps
  convention as eval/defense_eval.py).  This matters on TPU, where each
  additional program costs a 20s+ remote compile;
- randomness comes from explicit PRNG keys (deterministic corruptions
  ignore the key), per the A2 determinism policy.

Fidelity notes vs the original ImageNet-C implementation (which is
host-side numpy/PIL/Wand — per-image, unbatchable, and shape-dynamic):

- ``frost`` and ``spatter`` are NOT implemented: frost composites five
  bundled frost photographs (asset-dependent; this container is
  air-gapped) and spatter is similarly texture-based.  That leaves 14 of
  the 15 standard ImageNet-C corruptions, plus the "extra" set's
  speckle_noise / gaussian_blur / saturate — 17 in total, all below.
- ``brightness``/``saturate`` operate in RGB (additive value shift /
  gray-axis scaling) rather than an HSV round-trip; ``glass_blur`` uses
  two vectorized jitter-gather passes instead of the serial per-pixel
  swap loop; ``pixelate`` point-samples block centers rather than
  box-averaging; ``motion_blur`` draws one random line angle per image
  (the original draws one per call); ``elastic_transform``'s displacement
  field is std-normalized so severity maps to pixels of displacement.
  Severity constants follow the original tables where the semantics
  carry over, and are re-tuned to comparable visual strength elsewhere.

Use ``apply_corruption(name, x, severity, key)`` or build a jitted
accuracy cell with ``make_corruption_run(logits_fn, name)``
(cli/corruption_eval.py is the CLI surface).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates

from ..defenses.jpeg_dct import jpeg_dct_roundtrip

# ---------------------------------------------------------------------------
# helpers


def _luminance(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H,W,1] Rec.601 luma (mean for non-RGB channel counts)."""
    if x.shape[-1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
        return jnp.sum(x * w, axis=-1, keepdims=True)
    return jnp.mean(x, axis=-1, keepdims=True)


def _depthwise2d(x: jnp.ndarray, k2d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D convolution with edge padding (no darkened borders).

    ``x`` [B,H,W,C]; ``k2d`` [kh,kw] shared across channels (values may be
    traced; the shape is static).  Odd kh/kw assumed.
    """
    kh, kw = k2d.shape
    c = x.shape[-1]
    pad_h, pad_w = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                 mode="edge")
    kernel = jnp.broadcast_to(k2d[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _depthwise2d_per_image(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-image kernels: ``x`` [B,H,W,C], ``kernels`` [B,kh,kw]."""
    return jax.vmap(lambda img, k: _depthwise2d(img[None], k)[0])(x, kernels)


def _gauss1d(sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * jnp.square(t / jnp.maximum(sigma, 1e-3)))
    return k / jnp.sum(k)


def _gauss_blur(x: jnp.ndarray, sigma, radius: int) -> jnp.ndarray:
    """Separable Gaussian blur; ``sigma`` may be traced, ``radius`` static."""
    k = _gauss1d(jnp.asarray(sigma, jnp.float32), radius)
    x = _depthwise2d(x, k[:, None])
    return _depthwise2d(x, k[None, :])


def _resample(x: jnp.ndarray, rr: jnp.ndarray, cc: jnp.ndarray,
              order: int = 1) -> jnp.ndarray:
    """Sample ``x`` [B,H,W,C] at row/col coordinate maps.

    ``rr``/``cc`` are [H,W] (shared) or [B,H,W] (per-image); edge-clamped
    ('nearest' mode).  The gather maps to one XLA gather per channel.
    """

    def one(img: jnp.ndarray, r2: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(
            lambda ch: map_coordinates(ch, [r2, c2], order=order,
                                       mode="nearest"),
            in_axes=2, out_axes=2)(img)

    if rr.ndim == 3:
        return jax.vmap(one)(x, rr, cc)
    return jax.vmap(one, in_axes=(0, None, None))(x, rr, cc)


def _grid(h: int, w: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")


def _zoom_coords(h: int, w: int, factor) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Center-anchored zoom-in sampling coordinates (traced factor)."""
    rr, cc = _grid(h, w)
    cr, ccn = (h - 1) / 2.0, (w - 1) / 2.0
    f = jnp.maximum(jnp.asarray(factor, jnp.float32), 1e-3)
    return cr + (rr - cr) / f, ccn + (cc - ccn) / f


def _clip01(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0)


# ---------------------------------------------------------------------------
# corruption implementations — fn(x, row, key); row = per-severity constants

_GAUSSIAN_NOISE = [[0.08], [0.12], [0.18], [0.26], [0.38]]


def _c_gaussian_noise(x, row, key):
    return _clip01(x + row[0] * jax.random.normal(key, x.shape, x.dtype))


_SHOT_NOISE = [[60.0], [25.0], [12.0], [5.0], [3.0]]


def _c_shot_noise(x, row, key):
    lam = x * row[0]
    return _clip01(jax.random.poisson(key, lam).astype(x.dtype) / row[0])


_IMPULSE_NOISE = [[0.03], [0.06], [0.09], [0.17], [0.27]]


def _c_impulse_noise(x, row, key):
    u = jax.random.uniform(key, x.shape, x.dtype)
    p = row[0]
    x = jnp.where(u < p / 2, 0.0, x)
    return jnp.where(u > 1.0 - p / 2, 1.0, x)


_SPECKLE_NOISE = [[0.15], [0.20], [0.35], [0.45], [0.60]]


def _c_speckle_noise(x, row, key):
    return _clip01(x + x * row[0] * jax.random.normal(key, x.shape, x.dtype))


_GAUSSIAN_BLUR = [[1.0], [2.0], [3.0], [4.0], [6.0]]
_GAUSS_BLUR_RADIUS = 12  # static grid covering 2*sigma_max


def _c_gaussian_blur(x, row, key):
    del key
    return _clip01(_gauss_blur(x, row[0], _GAUSS_BLUR_RADIUS))


# (disk radius px, edge softness px) — ImageNet-C pairs (radius, alias blur)
_DEFOCUS_BLUR = [[3.0, 0.1], [4.0, 0.5], [6.0, 0.5], [8.0, 0.5], [10.0, 0.5]]
_DEFOCUS_RADIUS = 10


def _c_defocus_blur(x, row, key):
    del key
    r = _DEFOCUS_RADIUS
    yy, xx = _grid(2 * r + 1, 2 * r + 1)
    dist = jnp.sqrt(jnp.square(yy - r) + jnp.square(xx - r))
    edge = jnp.maximum(row[1] * 2.0, 0.5)
    disk = jnp.clip((row[0] + 0.5 - dist) / edge, 0.0, 1.0)
    disk = disk / jnp.sum(disk)
    return _clip01(_depthwise2d(x, disk))


# (line length px, along-line Gaussian sigma) — angle ~ U(-45°, 45°) per image
_MOTION_BLUR = [[10.0, 3.0], [15.0, 5.0], [15.0, 8.0], [15.0, 12.0],
                [20.0, 15.0]]
_MOTION_RADIUS = 20


def _line_kernel(length, sigma_par, theta, radius: int) -> jnp.ndarray:
    """Gaussian-profiled line kernel on a static (2r+1)² grid; all three
    scalars may be traced (this is what makes per-image random angles and
    a traced severity possible in ONE compiled program)."""
    yy, xx = _grid(2 * radius + 1, 2 * radius + 1)
    yy, xx = yy - radius, xx - radius
    d_par = xx * jnp.cos(theta) + yy * jnp.sin(theta)
    d_perp = -xx * jnp.sin(theta) + yy * jnp.cos(theta)
    profile = jnp.exp(-0.5 * jnp.square(d_par / jnp.maximum(sigma_par, 1e-3)))
    mask = jnp.clip(length / 2.0 + 0.5 - jnp.abs(d_par), 0.0, 1.0)
    width = jnp.exp(-0.5 * jnp.square(d_perp / 0.7))
    k = profile * mask * width
    return k / jnp.maximum(jnp.sum(k), 1e-8)


def _c_motion_blur(x, row, key):
    b = x.shape[0]
    theta = jax.random.uniform(key, (b,), minval=-jnp.pi / 4,
                               maxval=jnp.pi / 4)
    kernels = jax.vmap(
        lambda t: _line_kernel(row[0], row[1], t, _MOTION_RADIUS))(theta)
    return _clip01(_depthwise2d_per_image(x, kernels))


_ZOOM_BLUR = [[1.11], [1.16], [1.21], [1.26], [1.31]]
_ZOOM_STEPS = 10


def _c_zoom_blur(x, row, key):
    del key
    h, w = x.shape[1], x.shape[2]
    acc = jnp.zeros_like(x)
    for i in range(_ZOOM_STEPS):
        f = 1.0 + (i / (_ZOOM_STEPS - 1)) * (row[0] - 1.0)
        rr, cc = _zoom_coords(h, w, f)
        acc = acc + _resample(x, rr, cc, order=1)
    return _clip01(acc / _ZOOM_STEPS)


# (pre-blur sigma, jitter radius px) — two vectorized jitter passes
_GLASS_BLUR = [[0.7, 1.0], [0.9, 2.0], [1.0, 2.0], [1.1, 3.0], [1.5, 4.0]]


def _c_glass_blur(x, row, key):
    h, w = x.shape[1], x.shape[2]
    x = _gauss_blur(x, row[0], 4)
    rr, cc = _grid(h, w)
    for i in range(2):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        dr = jnp.round(jax.random.uniform(
            k1, (x.shape[0], h, w), minval=-row[1], maxval=row[1]))
        dc = jnp.round(jax.random.uniform(
            k2, (x.shape[0], h, w), minval=-row[1], maxval=row[1]))
        x = _resample(x, rr[None] + dr, cc[None] + dc, order=0)
    return _clip01(_gauss_blur(x, row[0] / 2.0, 4))


# (layer mean, layer std, zoom, threshold, streak length, whiten mix)
_SNOW = [[0.1, 0.3, 1.25, 0.50, 8.0, 0.70],
         [0.2, 0.3, 1.35, 0.55, 10.0, 0.65],
         [0.55, 0.3, 1.50, 0.55, 12.0, 0.57],
         [0.55, 0.3, 1.75, 0.60, 14.0, 0.55],
         [0.55, 0.3, 2.00, 0.65, 16.0, 0.50]]


def _c_snow(x, row, key):
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    k_layer, k_angle = jax.random.split(key)
    layer = row[0] + row[1] * jax.random.normal(k_layer, (b, h, w, 1), x.dtype)
    rr, cc = _zoom_coords(h, w, row[2])
    layer = _resample(layer, rr, cc, order=1)
    layer = jnp.where(layer < row[3], 0.0, layer)
    # streaks: motion-blur the flake field steeply downward (-45°..-135°)
    theta = jax.random.uniform(k_angle, (b,), minval=-3 * jnp.pi / 4,
                               maxval=-jnp.pi / 4)
    kernels = jax.vmap(
        lambda t: _line_kernel(row[4], row[4] / 2.0, t, _MOTION_RADIUS))(theta)
    layer = jnp.clip(_depthwise2d_per_image(layer, kernels), 0.0, 1.0)
    gray = _luminance(x)
    whitened = row[5] * x + (1.0 - row[5]) * jnp.maximum(
        x, gray * 1.5 + 0.5)
    return _clip01(whitened + layer + jnp.flip(layer, axis=(1, 2)))


# (fog amount, octave decay) — plasma approximated by octave noise
_FOG = [[1.5, 2.0], [2.0, 2.0], [2.5, 1.7], [2.5, 1.5], [3.0, 1.4]]


def _c_fog(x, row, key):
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    n_oct = max(1, int(np.log2(max(min(h, w) // 4, 1))) + 1)
    plasma = jnp.zeros((b, h, w), x.dtype)
    for o in range(n_oct):
        s = 4 * (2 ** o)
        u = jax.random.uniform(jax.random.fold_in(key, o), (b, s, s), x.dtype)
        u = jax.image.resize(u, (b, h, w), method="linear")
        plasma = plasma + u * jnp.power(row[1], -jnp.float32(o))
    lo = jnp.min(plasma, axis=(1, 2), keepdims=True)
    hi = jnp.max(plasma, axis=(1, 2), keepdims=True)
    plasma = (plasma - lo) / jnp.maximum(hi - lo, 1e-8)
    max_val = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    fogged = x + row[0] * plasma[..., None]
    return _clip01(fogged * max_val / (max_val + row[0]))


_BRIGHTNESS = [[0.1], [0.2], [0.3], [0.4], [0.5]]


def _c_brightness(x, row, key):
    del key
    return _clip01(x + row[0])


_CONTRAST = [[0.4], [0.3], [0.2], [0.1], [0.05]]


def _c_contrast(x, row, key):
    del key
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    return _clip01((x - mean) * row[0] + mean)


# (gray-axis scale, value offset) — severities 1-2 desaturate, 3-5 oversaturate
# (the ImageNet-C "saturate" severity schedule is deliberately non-monotone)
_SATURATE = [[0.3, 0.0], [0.1, 0.0], [2.0, 0.0], [5.0, 0.1], [20.0, 0.2]]


def _c_saturate(x, row, key):
    del key
    gray = _luminance(x)
    return _clip01(gray + row[0] * (x - gray) + row[1])


# (displacement amplitude px, field smoothness as fraction of min(H,W))
_ELASTIC = [[1.5, 0.080], [3.0, 0.065], [5.0, 0.050], [7.0, 0.040],
            [10.0, 0.035]]


def _c_elastic_transform(x, row, key):
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    radius = max(3, min(h, w) // 8)  # static blur support for the field
    d = jax.random.uniform(key, (b, h, w, 2), x.dtype, -1.0, 1.0)
    d = _gauss_blur(d, row[1] * min(h, w), radius)
    std = jnp.std(d, axis=(1, 2), keepdims=True)
    d = d / jnp.maximum(std, 1e-8) * row[0]
    rr, cc = _grid(h, w)
    return _resample(x, rr[None] + d[..., 0], cc[None] + d[..., 1], order=1)


_PIXELATE = [[0.6], [0.5], [0.4], [0.3], [0.25]]


def _c_pixelate(x, row, key):
    del key
    h, w = x.shape[1], x.shape[2]
    block = 1.0 / jnp.maximum(row[0], 1e-3)
    rr, cc = _grid(h, w)
    rr = (jnp.floor(rr / block) + 0.5) * block
    cc = (jnp.floor(cc / block) + 0.5) * block
    return _resample(x, rr, cc, order=0)


_JPEG = [[25.0], [18.0], [15.0], [10.0], [7.0]]


def _c_jpeg_compression(x, row, key):
    del key
    if x.shape[-1] != 3:
        raise ValueError("jpeg_compression requires RGB inputs")
    return jpeg_dct_roundtrip(x, quality=row[0])


# ---------------------------------------------------------------------------
# registry / dispatch

_REGISTRY: dict[str, tuple[Callable, np.ndarray]] = {
    "gaussian_noise": (_c_gaussian_noise, np.asarray(_GAUSSIAN_NOISE)),
    "shot_noise": (_c_shot_noise, np.asarray(_SHOT_NOISE)),
    "impulse_noise": (_c_impulse_noise, np.asarray(_IMPULSE_NOISE)),
    "defocus_blur": (_c_defocus_blur, np.asarray(_DEFOCUS_BLUR)),
    "glass_blur": (_c_glass_blur, np.asarray(_GLASS_BLUR)),
    "motion_blur": (_c_motion_blur, np.asarray(_MOTION_BLUR)),
    "zoom_blur": (_c_zoom_blur, np.asarray(_ZOOM_BLUR)),
    "snow": (_c_snow, np.asarray(_SNOW)),
    "fog": (_c_fog, np.asarray(_FOG)),
    "brightness": (_c_brightness, np.asarray(_BRIGHTNESS)),
    "contrast": (_c_contrast, np.asarray(_CONTRAST)),
    "elastic_transform": (_c_elastic_transform, np.asarray(_ELASTIC)),
    "pixelate": (_c_pixelate, np.asarray(_PIXELATE)),
    "jpeg_compression": (_c_jpeg_compression, np.asarray(_JPEG)),
    # ImageNet-C "extra" set
    "speckle_noise": (_c_speckle_noise, np.asarray(_SPECKLE_NOISE)),
    "gaussian_blur": (_c_gaussian_blur, np.asarray(_GAUSSIAN_BLUR)),
    "saturate": (_c_saturate, np.asarray(_SATURATE)),
}

CORRUPTION_NAMES: tuple[str, ...] = tuple(_REGISTRY)

#: corruptions whose output is a deterministic function of (x, severity)
DETERMINISTIC: frozenset[str] = frozenset({
    "defocus_blur", "zoom_blur", "brightness", "contrast", "saturate",
    "pixelate", "jpeg_compression", "gaussian_blur",
})


def severity_row(name: str, severity) -> jnp.ndarray:
    """Per-severity constant row; ``severity`` in 1..5, static or traced."""
    _, table = _REGISTRY[name]
    idx = jnp.clip(jnp.asarray(severity, jnp.int32), 1, 5) - 1
    return jnp.asarray(table, jnp.float32)[idx]


def apply_corruption(name: str, x: jnp.ndarray, severity,
                     key: jax.Array | None = None) -> jnp.ndarray:
    """Corrupt a [B,H,W,C] batch in [0,1] at ``severity`` (1..5, traced OK).

    ``key`` is required for the stochastic corruptions and ignored by the
    deterministic ones (pass any key when sweeping a mixed list).
    """
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown corruption {name!r}; choose from {CORRUPTION_NAMES}")
    if key is None:
        if name not in DETERMINISTIC:
            raise ValueError(f"corruption {name!r} is stochastic: pass a key")
        key = jax.random.PRNGKey(0)
    fn, _ = _REGISTRY[name]
    x = jnp.asarray(x, jnp.float32)
    return fn(x, severity_row(name, severity), key)


def make_corruption_run(logits_fn, name: str):
    """``run(x, y, severity, key) -> bool[B]`` correctness mask under the
    corruption — one jittable cell per corruption; severity and key are
    traced so the 5-severity sweep reuses the compiled program."""

    def run(x, y, severity, key):
        xc = apply_corruption(name, x, severity, key)
        pred = jnp.argmax(logits_fn(xc), axis=-1)
        return pred == y

    return run
