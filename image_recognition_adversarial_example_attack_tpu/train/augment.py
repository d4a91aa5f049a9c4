"""Seeded, jittable batch augmentation for (adversarial) training.

The standard CIFAR adversarial-training recipe — Madry et al. 2018's
code and every RobustBench CIFAR model since — trains on 4-pixel-pad
random crops plus horizontal flips; Cutout (DeVries & Taylor 2017) is
the common extra.  The torch reference consumes such checkpoints
(defense_experiments.py:674-686) but has no training loop at all; this
module supplies the missing augmentation half of the from-scratch
workflow (`adversarial_train --augment crop-flip`).

TPU design: augmentation is part of the ONE compiled training step, not
a host-side dataloader stage.  Everything here is shape-static
gather/elementwise work — a [B,2] offset table drives per-sample
``dynamic_slice`` crops under ``vmap``, flips are a batched ``where``
over the W-reversed tensor, and cutout builds its mask from broadcasted
iota comparisons — so XLA fuses the whole thing into the step's
prologue (zero extra HBM round-trips) and the host never touches
pixels.  Randomness follows the A2 policy: one explicit key in, split
internally; the same key always produces the same batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    """Static (compile-time) augmentation policy.

    pad:    >0 zero-pads H and W by ``pad`` then random-crops back to
            the original size (torchvision RandomCrop(size, padding=pad)
            semantics — per-sample integer offsets in [0, 2*pad]).
    flip:   per-sample horizontal flip with probability 0.5.
    cutout: >0 zeroes one ``cutout`` x ``cutout`` square per image, the
            center sampled uniformly over the image so the square may be
            clipped at the borders (DeVries & Taylor 2017 semantics).
    """

    pad: int = 0
    flip: bool = False
    cutout: int = 0

    @property
    def enabled(self) -> bool:
        return self.pad > 0 or self.flip or self.cutout > 0


def random_crop(key: jax.Array, x01: jnp.ndarray, pad: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H,W,C]: zero-pad by ``pad``, per-sample random crop."""
    b, h, w, c = x01.shape
    xp = jnp.pad(x01, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    offsets = jax.random.randint(key, (b, 2), 0, 2 * pad + 1)

    def crop_one(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

    return jax.vmap(crop_one)(xp, offsets)


def random_flip(key: jax.Array, x01: jnp.ndarray) -> jnp.ndarray:
    """Per-sample horizontal flip (p=0.5) as one batched select."""
    coin = jax.random.bernoulli(key, 0.5, (x01.shape[0],))
    return jnp.where(coin[:, None, None, None], x01[:, :, ::-1, :], x01)


def random_cutout(key: jax.Array, x01: jnp.ndarray, length: int) -> jnp.ndarray:
    """Zero one ``length`` x ``length`` square per image (border-clipped)."""
    b, h, w, _ = x01.shape
    k_y, k_x = jax.random.split(key)
    cy = jax.random.randint(k_y, (b,), 0, h)
    cx = jax.random.randint(k_x, (b,), 0, w)
    half = length // 2
    rows = jnp.arange(h)[None, :]                       # [1,H]
    cols = jnp.arange(w)[None, :]                       # [1,W]
    in_rows = (rows >= cy[:, None] - half) & (rows < cy[:, None] - half + length)
    in_cols = (cols >= cx[:, None] - half) & (cols < cx[:, None] - half + length)
    mask = in_rows[:, :, None] & in_cols[:, None, :]    # [B,H,W]
    return jnp.where(mask[..., None], jnp.zeros((), x01.dtype), x01)


def make_augment_fn(config: AugmentConfig):
    """``(key, x01) -> x01_aug`` applying crop -> flip -> cutout, or
    ``None`` when the policy is empty (callers skip the key split so a
    disabled policy is BITWISE identical to pre-augmentation behavior)."""
    if not config.enabled:
        return None

    def augment(key: jax.Array, x01: jnp.ndarray) -> jnp.ndarray:
        k_crop, k_flip, k_cut = jax.random.split(key, 3)
        if config.pad > 0:
            x01 = random_crop(k_crop, x01, int(config.pad))
        if config.flip:
            x01 = random_flip(k_flip, x01)
        if config.cutout > 0:
            x01 = random_cutout(k_cut, x01, int(config.cutout))
        return x01

    return augment
