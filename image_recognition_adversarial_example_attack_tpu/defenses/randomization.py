"""Randomization defense: random resize + pad at inference time.

Xie et al., "Mitigating adversarial effects through randomization"
(ICLR 2018): before classification, rescale the image by a random factor
and place it at a random offset on the original canvas.  The attacker's
perturbation was optimized for one geometry; a fresh random geometry at
test time misaligns it.  (Like all pure randomization defenses it is
breakable by EOT — and because this implementation is differentiable,
this repo can mount exactly that adaptive attack against itself; see below.)

TPU design — the paper's formulation is shape-dynamic (resize to a random
size in [299, 331), then zero-pad), which cannot live under ``jit``:
every draw would trigger a recompile.  Here the geometry is continuous
instead: ``jax.image.scale_and_translate`` resamples onto the FIXED
[H, W] canvas with a traced per-sample scale and offset, so one compiled
program serves every draw, the batch dimension shards untouched over the
'data' mesh axis, and the op is differentiable (plain bilinear weights) —
no BPDA approximation needed for adaptive evaluation.

Composition with the attack zoo: the defended model is
``make_eot_logits_fn(logits_fn, key, n_samples=1,
transform=resize_pad_transform(...))`` — and the ADAPTIVE attacker is the
same wrapper with n_samples >= 8 (expectation over the defense's own
randomness, Athalye et al. 2018).  No new attack plumbing required.

Beyond-reference extension: the reference's defense chain
(defense_experiments.py:170-217) is fully deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..attacks.eot import TransformFn


def resize_pad(
    x: jnp.ndarray,
    scales: jnp.ndarray,
    off_y: jnp.ndarray,
    off_x: jnp.ndarray,
    *,
    pad_value: float = 0.5,
) -> jnp.ndarray:
    """Deterministic core: per-sample scale + offset on the fixed canvas.

    ``x [B,H,W,C]``; ``scales/off_y/off_x [B]`` — sample i is shrunk by
    ``scales[i]`` and its top-left corner placed at (off_y, off_x) in
    output pixels; the uncovered canvas reads ``pad_value``.  Offsets must
    lie in [0, (1-scale)*H/W] for the image to stay fully on-canvas.

    scale_and_translate fills off-image area with zeros, so the pad value
    is folded in linearly: st(x - pv) + pv == x resampled inside, pv
    outside (st is linear in the image).
    """
    _, h, w, c = x.shape
    pv = jnp.asarray(pad_value, x.dtype)

    def one(img, s, ty, tx):
        out = jax.image.scale_and_translate(
            img - pv,
            shape=(h, w, c),
            spatial_dims=(0, 1),
            scale=jnp.stack([s, s]),
            translation=jnp.stack([ty, tx]),
            method="linear",
        )
        return out + pv

    return jax.vmap(one)(x, scales.astype(x.dtype),
                         off_y.astype(x.dtype), off_x.astype(x.dtype))


def random_resize_pad(
    x: jnp.ndarray,
    key: jax.Array,
    *,
    min_scale: float = 0.857,
    pad_value: float = 0.5,
) -> jnp.ndarray:
    """One random draw of the defense for a batch ``x [B,H,W,C]``.

    Per sample: scale ~ U[min_scale, 1], offset uniform over the slack so
    the shrunk image lands fully on-canvas.  The default min_scale matches
    the paper's ratio (resize 299 -> [268, 299] ~ 0.9; 0.857 == 6/7, the
    224-grid-friendly equivalent of its 299/331 outer pad).
    """
    b, h, w, _ = x.shape
    ks, ky, kx = jax.random.split(key, 3)
    scales = jax.random.uniform(
        ks, (b,), x.dtype, minval=min_scale, maxval=1.0)
    off_y = jax.random.uniform(ky, (b,), x.dtype) * (1.0 - scales) * h
    off_x = jax.random.uniform(kx, (b,), x.dtype) * (1.0 - scales) * w
    return resize_pad(x, scales, off_y, off_x, pad_value=pad_value)


def resize_pad_transform(
    min_scale: float = 0.857, pad_value: float = 0.5
) -> TransformFn:
    """The defense as an EOT transform: plug into ``make_eot_logits_fn``
    (n_samples=1 -> the DEPLOYED randomized model; n_samples>=8 -> the
    adaptive attacker's expectation over the defense)."""

    def transform(key, x):
        return random_resize_pad(
            x, key, min_scale=min_scale, pad_value=pad_value)

    return transform
