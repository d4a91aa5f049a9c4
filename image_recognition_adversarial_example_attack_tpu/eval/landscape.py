"""Loss-landscape slices around an input: the adversarial plane.

The robustness literature's standard diagnostic figure (Li et al. 2018
"Visualizing the Loss Landscape of Neural Nets"; Engstrom et al.'s
robustness toolkits): sample the per-sample cross-entropy on a 2-D plane
through pixel space spanned by the ATTACK direction and a random
orthogonal direction, revealing how sharply the loss rises inside the
eps-ball (gradient masking shows up as a flat-then-cliff surface;
adversarially-trained models show visibly flatter basins).

Beyond-reference extension of the C20 visualization family
(visualized_attacks.py shows pixel-space deltas; this shows the LOSS
GEOMETRY the attack exploited).  CLI: ``visualize --landscape``.

TPU design: the whole G×G grid evaluates as ONE batched forward —
``[G², H, W, C]`` built by broadcasting, no Python loop over grid points
(the torch equivalents loop per point); jit once, reuse across attacks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..attacks.api import LogitsFn


class Plane(NamedTuple):
    """An origin-centered 2-D slice of pixel space."""

    d1: jnp.ndarray  # [H,W,C], unit L2
    d2: jnp.ndarray  # [H,W,C], unit L2, orthogonal to d1
    # pixel-space L2 length the unit coordinate maps to (scalar array, so
    # the whole plane construction stays on-device and jit-able — a host
    # float here would force a sync per attack over the ~150ms/op relay)
    scale: jnp.ndarray


def adversarial_plane(x: jnp.ndarray, x_adv: jnp.ndarray,
                      key: jax.Array) -> Plane:
    """Plane through ``x`` spanned by the attack direction and a random
    orthogonal direction of equal length.

    ``x``/``x_adv`` are single images [H,W,C]; coordinate (1, 0) lands
    exactly on ``x_adv``.  Jit-able (the CLI jits it; everything stays
    on-device).
    """
    delta = (x_adv - x).astype(jnp.float32)
    norm = jnp.linalg.norm(delta)
    # degenerate (no perturbation, e.g. a failed minimal-norm attack that
    # returned the clean input): d1 collapses to zero and scale falls back
    # to 1 so the slice is genuinely the random line along d2 at unit
    # pixel scale, not 441 copies of the same point
    d1 = delta / jnp.maximum(norm, 1e-12)
    scale = jnp.where(norm > 0.0, norm, 1.0)

    r = jax.random.normal(key, x.shape, jnp.float32)
    r = r - jnp.sum(r * d1) * d1  # Gram-Schmidt against d1
    d2 = r / jnp.maximum(jnp.linalg.norm(r), 1e-12)
    return Plane(d1=d1, d2=d2, scale=scale)


def loss_landscape(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y: jnp.ndarray,
    plane: Plane,
    *,
    span: float = 1.5,
    grid: int = 21,
) -> jnp.ndarray:
    """Per-sample CE on the plane: returns [grid, grid] float32.

    Entry [i, j] is the loss at ``x + a_i*scale*d1 + b_j*scale*d2`` with
    ``a, b`` in linspace(-span, span, grid) — so the clean input sits at
    the center and the adversarial endpoint at (a=1, b=0).  Points are
    clipped to the valid [0,1] image box (the attack's own feasible set).

    ``x`` is one image [H,W,C]; ``y`` a scalar label.  One [grid²]
    batched forward.
    """
    coords = jnp.linspace(-span, span, grid)
    aa, bb = jnp.meshgrid(coords, coords, indexing="ij")  # [G,G]
    offs = (aa[..., None, None, None] * plane.d1
            + bb[..., None, None, None] * plane.d2) * plane.scale
    pts = jnp.clip(x[None, None] + offs, 0.0, 1.0)        # [G,G,H,W,C]
    flat = pts.reshape((-1,) + x.shape)                    # [G²,H,W,C]
    logp = jax.nn.log_softmax(logits_fn(flat), axis=-1)
    losses = -logp[:, y]
    return losses.reshape(grid, grid).astype(jnp.float32)
