"""Device-side JPEG: the baseline DCT codec as pure jnp (differentiable).

The reference's JPEG defense is a per-image PIL round-trip on the host
(defense_experiments.py:188-207); our parity path keeps that codec behind
``io_callback`` (defenses/jpeg.py).  This module is the TPU-NATIVE
alternative: the baseline JPEG transform chain — RGB->YCbCr, 4:2:0 chroma
subsampling, 8x8 blockwise orthonormal DCT-II, Annex-K quantization
tables with libjpeg quality scaling, dequantize, IDCT, upsample,
YCbCr->RGB — entirely inside the XLA program.  Entropy coding is
irrelevant to the DEFENSE (it is lossless; all information loss happens
at quantization), so this reproduces the semantically meaningful part of
the codec on device:

- zero host round-trips: JPEG cells stay fused into the attack/eval
  program and remain SPMD-shardable (no split-program path needed);
- DIFFERENTIABLE: quantization rounds through a straight-through
  estimator (exact rounded values forward, identity gradient backward),
  so adaptive attacks can differentiate THROUGH the defense — the
  evaluation standard for preprocessing defenses (Athalye et al. 2018:
  non-differentiable preprocessing must be attacked adaptively, not
  declared robust);
- deviations from libjpeg, documented: float DCT (libjpeg uses integer
  DCT approximations) and no entropy-coding rounding of DC prediction;
  chroma upsampling DOES match libjpeg's triangular "fancy" default —
  measured ~1.2/255 MAE against PIL at matched quality
  (tests/test_jpeg_dct.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# ITU-T T.81 Annex K base quantization tables (quality 50).
_LUMA_BASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_CHROMA_BASE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


@lru_cache(maxsize=None)
def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling: s=5000/q (q<50) else 200-2q; clamp 1..255."""
    q = int(np.clip(quality, 1, 100))
    s = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    def scale(base):
        return np.clip(np.floor((base * s + 50.0) / 100.0), 1.0, 255.0)
    return scale(_LUMA_BASE).astype(np.float32), \
        scale(_CHROMA_BASE).astype(np.float32)


def _quant_tables_traced(quality: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The same libjpeg quality scaling with a TRACED quality scalar, so one
    compiled program can serve a quality sweep (the dynamic-eps convention;
    used by eval/corruptions.py's jpeg_compression severity sweep)."""
    q = jnp.clip(jnp.asarray(quality, jnp.float32), 1.0, 100.0)
    s = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)

    def scale(base):
        return jnp.clip(jnp.floor((jnp.asarray(base) * s + 50.0) / 100.0),
                        1.0, 255.0)

    return scale(_LUMA_BASE), scale(_CHROMA_BASE)


@lru_cache(maxsize=None)
def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D (DCT = D X D^T)."""
    n = np.arange(8)
    k = n[:, None]
    d = np.cos((2 * n[None, :] + 1) * k * np.pi / 16.0)
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return (d * np.sqrt(2.0 / 8.0)).astype(np.float32)


def _ste_round(v: jnp.ndarray) -> jnp.ndarray:
    """Exact rounding forward, identity gradient backward."""
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


def _blockwise(channel: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W] centered channel -> DCT -> quant/dequant -> IDCT."""
    b, h, w = channel.shape
    d = jnp.asarray(_dct_matrix())
    x5 = channel.reshape(b, h // 8, 8, w // 8, 8)
    # HIGHEST precision: TPU matmuls run bf16 by default; centered blocks
    # reach |128| and coefficients ~1000, so bf16's ~2^-8 relative error
    # crosses rounding boundaries of the small quant-table entries
    # (CLAUDE.md precision rule for numerically sensitive reductions)
    coef = jnp.einsum("ij,bajck,lk->baicl", d, x5, d,
                      precision=jax.lax.Precision.HIGHEST)
    t = table[None, None, :, None, :]  # block dims sit at axes 2 and 4
    coef = _ste_round(coef / t) * t
    x5 = jnp.einsum("ij,baicl,lk->bajck", d, coef, d,
                    precision=jax.lax.Precision.HIGHEST)
    return x5.reshape(b, h, w)


def _down2(c: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pool (4:2:0 chroma subsampling)."""
    b, h, w = c.shape
    return c.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def _up2(c: jnp.ndarray) -> jnp.ndarray:
    """Triangular 2x upsample (matches libjpeg's default 'fancy'
    upsampling, which is linear interpolation with 3/4-1/4 weights)."""
    b, h, w = c.shape
    return jax.image.resize(c, (b, 2 * h, 2 * w), method="linear")


def jpeg_dct_roundtrip(x: jnp.ndarray, quality=75) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] -> baseline-JPEG-compressed batch in [0,1].

    Pure jnp, jit/vmap/pjit-safe, differentiable (STE rounding).
    ``quality`` may be a static Python int (tables precomputed on the host)
    or a TRACED scalar (tables computed in-graph via the same libjpeg
    formula, so a quality sweep shares one compiled program).
    Arbitrary H,W: edge-padded to a multiple of 16, cropped after.
    """
    if x.ndim != 4 or x.shape[-1] != 3:
        raise ValueError(f"expected [B,H,W,3], got {x.shape}")
    b, h, w, _ = x.shape
    ph = (-h) % 16
    pw = (-w) % 16
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")

    r, g, bl = [x[..., i] * 255.0 for i in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * bl
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl

    if isinstance(quality, (jnp.ndarray, jax.Array)):
        luma_t, chroma_t = _quant_tables_traced(quality)
    else:
        luma_t, chroma_t = map(jnp.asarray, _quant_tables(int(quality)))
    y = _blockwise(y - 128.0, luma_t) + 128.0
    cb = _up2(_blockwise(_down2(cb) - 128.0, chroma_t) + 128.0)
    cr = _up2(_blockwise(_down2(cr) - 128.0, chroma_t) + 128.0)

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    out = jnp.stack([r, g, bl], axis=-1) / 255.0
    out = jnp.clip(out, 0.0, 1.0)
    return out[:, :h, :w, :]
