"""Adversarial patch: a localized, physically-plausible attack.

Brown et al., "Adversarial patch" (NeurIPS-W 2017): train a small square
patch of REPLACED pixels (not an eps-bounded additive delta) that, pasted
anywhere into an image, drives the classifier to a chosen target class.
Robustness to placement comes from expectation-over-transformation (EOT):
every optimization step pastes the patch at fresh random locations and
90-degree rotations and ascends the expected loss.

TPU design:

- The patch loop is one jitted ``lax.scan``: each step samples per-sample
  placements from an explicit PRNG key, pastes via per-sample
  ``lax.dynamic_update_slice`` (a ``vmap``-ed scatter — traced start
  indices, static shapes), runs forward+backward, and applies a
  sign-gradient update with a [0,1] projection.  Zero host round-trips.
- Rotations are the 4 lattice rotations via ``lax.switch`` over ``rot90``
  branches — shape-stable (the patch is square by construction) and
  jit-compatible, unlike arbitrary-angle resampling.
- Placement indices stay traced scalars per sample; XLA lowers the paste to
  a dynamic-update-slice, so the batch dimension shards over the 'data'
  mesh axis untouched (per-sample placements are data-parallel).

Beyond-reference extension: the reference has no localized/physical threat
model (all its attacks are image-wide Lp perturbations).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn, cross_entropy_sum


class PatchResult(NamedTuple):
    """patch: [P,P,C] in [0,1]; loss_per_step: [steps] EOT surrogate
    objective, sign-normalized so INCREASING means the attack is improving
    (untargeted: CE of the true labels rises; targeted: -CE of the target
    rises as the target's CE falls)."""

    patch: jnp.ndarray
    loss_per_step: jnp.ndarray


def _rotate_patch(patch: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """rot90 by a TRACED k in {0,1,2,3} — lax.switch keeps it jit-safe."""
    return lax.switch(
        k,
        [
            lambda p: p,
            lambda p: jnp.rot90(p, 1),
            lambda p: jnp.rot90(p, 2),
            lambda p: jnp.rot90(p, 3),
        ],
        patch,
    )


def _paste_one(x: jnp.ndarray, patch: jnp.ndarray, row, col, rot) -> jnp.ndarray:
    """Paste (replace pixels) into one [H,W,C] image at traced (row, col)."""
    return lax.dynamic_update_slice(x, _rotate_patch(patch, rot), (row, col, 0))


def sample_placements(
    key: jax.Array, n: int, image_hw: tuple[int, int], patch_size: int,
    *, rotations: bool = True,
):
    """Per-sample (rows, cols, rots) uniform over all valid positions."""
    h, w = image_hw
    kr, kc, kk = jax.random.split(key, 3)
    rows = jax.random.randint(kr, (n,), 0, h - patch_size + 1)
    cols = jax.random.randint(kc, (n,), 0, w - patch_size + 1)
    if rotations:
        rots = jax.random.randint(kk, (n,), 0, 4)
    else:
        rots = jnp.zeros((n,), jnp.int32)
    return rows, cols, rots


def apply_patch(
    x: jnp.ndarray,
    patch: jnp.ndarray,
    *,
    key: jax.Array | None = None,
    rows: jnp.ndarray | None = None,
    cols: jnp.ndarray | None = None,
    rots: jnp.ndarray | None = None,
    rotations: bool = True,
) -> jnp.ndarray:
    """Paste the patch into a batch ``x [B,H,W,C]``.

    Either pass explicit per-sample ``rows/cols`` (deterministic eval;
    ``rots`` defaults to zeros when ``rotations=False``) or a ``key`` to
    sample everything uniformly — not both.
    """
    b, h, w, _ = x.shape
    p = patch.shape[0]
    if rows is None or cols is None:
        if rows is not None or cols is not None:
            raise ValueError("rows/cols must be passed together")
        if key is None:
            raise ValueError("apply_patch needs either explicit placements or a key")
        rows, cols, rots = sample_placements(
            key, b, (h, w), p, rotations=rotations
        )
    else:
        if key is not None:
            raise ValueError(
                "pass either explicit placements or a key, not both")
        if rots is None:
            if rotations:
                raise ValueError(
                    "rots is required with explicit placements unless "
                    "rotations=False")
            rots = jnp.zeros((b,), jnp.int32)
    return jax.vmap(_paste_one, in_axes=(0, None, 0, 0, 0))(
        x, patch, rows, cols, rots
    )


def patch_attack(
    logits_fn: LogitsFn,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    *,
    patch_size: int,
    steps: int = 250,
    lr: float = 1.0 / 255.0,
    key: jax.Array,
    y_target: int | None = None,
    rotations: bool = True,
) -> PatchResult:
    """Train a [patch_size, patch_size, C] patch on ``xs [B,H,W,C] / ys [B]``.

    With ``y_target`` (a single class — the patch is universal): minimize the
    target's cross-entropy under random placement (the Brown et al.
    objective).  Untargeted: maximize the true labels' cross-entropy.
    The patch itself lives in [0,1] pixel space (it replaces pixels; there
    is no eps ball).
    """
    b, h, w, c = xs.shape
    p = int(patch_size)
    if not 0 < p <= min(h, w):
        raise ValueError(f"patch_size {p} must be in [1, {min(h, w)}]")

    if y_target is None:
        y_all = ys
        direction = 1.0
    else:
        y_all = jnp.full_like(ys, int(y_target))
        direction = -1.0

    def eot_loss(patch, step_key):
        rows, cols, rots = sample_placements(
            step_key, b, (h, w), p, rotations=rotations
        )
        x_p = apply_patch(xs, patch, rows=rows, cols=cols, rots=rots)
        return cross_entropy_sum(logits_fn(x_p), y_all) / b

    grad_fn = jax.value_and_grad(eot_loss)

    def body(patch, step_key):
        loss, g = grad_fn(patch, step_key)
        patch = patch + lr * direction * jnp.sign(g).astype(patch.dtype)
        return jnp.clip(patch, 0.0, 1.0), direction * loss

    patch0 = jnp.full((p, p, c), 0.5, xs.dtype)
    keys = jax.random.split(key, int(steps))
    patch, losses = lax.scan(body, patch0, keys)
    return PatchResult(patch=patch, loss_per_step=losses)


def patch_success_rate(
    logits_fn: LogitsFn,
    xs: jnp.ndarray,
    patch: jnp.ndarray,
    *,
    key: jax.Array,
    y_target: int | None = None,
    ys: jnp.ndarray | None = None,
    rotations: bool = True,
) -> jnp.ndarray:
    """Targeted: fraction classified as ``y_target`` after pasting at fresh
    random placements.  Untargeted (pass ``ys``): fraction misclassified."""
    x_p = apply_patch(xs, patch, key=key, rotations=rotations)
    pred = jnp.argmax(logits_fn(x_p), axis=-1)
    if y_target is not None:
        return jnp.mean((pred == int(y_target)).astype(jnp.float32))
    if ys is None:
        raise ValueError("untargeted success needs ys")
    return jnp.mean((pred != ys).astype(jnp.float32))
