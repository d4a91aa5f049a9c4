"""DeepFool: minimal-L2 perturbation to the nearest linearized boundary.

Moosavi-Dezfooli et al., CVPR 2016 (beyond-reference extension — the
reference's attack family is FGSM/PGD/CW, attack.py:20-140; DeepFool
completes the classic white-box quartet with the *minimum-norm* member).

Per iteration, the classifier is linearized around the current iterate and
the step moves to the closest class boundary among the top-``num_classes``
candidate classes (ranked by clean logits):

    l  = argmin_k |f_k - f_k0| / ||w_k - w_k0||
    r  = (|f_l - f_k0| + eta) / ||w_l - w_k0||^2 * (w_l - w_k0)

where k0 is the model's ORIGINAL prediction (DeepFool attacks the model's
own decision; any supplied label is ignored, matching the original
algorithm).  The accumulated perturbation is overshot by ``(1+overshoot)``
so the iterate actually crosses the boundary.

TPU design: the K candidate-class gradients per step come from ONE forward
via ``jax.vjp`` with a vmapped batch of one-hot cotangents — XLA compiles a
single batched backward, not K sequential autograd calls (the eager
per-class ``backward(retain_graph=True)`` loop of reference-style torch
implementations).  The step loop is a ``lax.scan`` with a per-sample
"already fooled" freeze mask, so the whole attack is one fused program with
a static step count.

bf16 caveat (measured on TPU v5e, docs/EXPERIMENTS.md): with a bfloat16
model the default 2% overshoot can leave the iterate within bf16
*cross-program* noise of the boundary — the attack program's own forward
and a differently-compiled forward then disagree on whether the example is
fooled (logit margin ~1e-3 vs program-to-program bf16 jitter ~1e-2).  For
stable verdicts on bf16 models raise ``overshoot`` to 0.1-0.3, or run the
model in float32 for this attack.  This is inherent to minimal-perturbation
attacks at low precision, not a defect of the fused implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def deepfool_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray | None = None,
    *,
    steps: int = 50,
    num_classes: int = 10,
    overshoot: float = 0.02,
    eta: float = 1e-4,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1].

    ``y_true`` is accepted for dispatch-surface symmetry but unused: the
    attack flips the model's own argmax prediction.  Iterates are clipped
    to [0,1] (the valid-image constraint every attack here maintains), and
    samples stop updating once fooled.
    """
    del y_true
    logits0 = logits_fn(x)
    n_cls = logits0.shape[-1]
    k = min(int(num_classes), n_cls)
    # Candidate classes per sample, ranked by clean logits; column 0 is the
    # original prediction k0 (it is the argmax, hence top-1).
    _, idx = lax.top_k(logits0, k)  # [B, k]
    k0 = idx[:, 0]  # [B]

    onehots = jax.nn.one_hot(idx.T, n_cls, dtype=logits0.dtype)  # [k, B, C]

    def body(carry, _):
        r_tot = carry
        x_adv = jnp.clip(x + (1.0 + overshoot) * r_tot, 0.0, 1.0)
        f_full, vjp_fn = jax.vjp(logits_fn, x_adv)
        # One batched backward for all k candidate classes.
        grads = jax.vmap(lambda c: vjp_fn(c)[0])(onehots)  # [k, B, H, W, C]

        f_sel = jnp.take_along_axis(f_full, idx, axis=-1)  # [B, k]
        w = grads[1:] - grads[:1]                          # [k-1, B, H, W, C]
        f_diff = (f_sel[:, 1:] - f_sel[:, :1]).T           # [k-1, B]
        w_norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)))  # [k-1, B]
        dist = jnp.abs(f_diff) / jnp.maximum(w_norm, 1e-12)

        l = jnp.argmin(dist, axis=0)  # [B] nearest linearized boundary
        sel = l[None, :, None, None, None]
        w_l = jnp.take_along_axis(w, sel, axis=0)[0]                    # [B,H,W,C]
        fd_l = jnp.take_along_axis(jnp.abs(f_diff), l[None, :], axis=0)[0]
        wn_l = jnp.take_along_axis(w_norm, l[None, :], axis=0)[0]
        step = (fd_l + eta)[:, None, None, None] * w_l / jnp.maximum(
            wn_l, 1e-12
        )[:, None, None, None] ** 2

        fooled = jnp.argmax(f_full, axis=-1) != k0  # [B]
        r_tot = jnp.where(fooled[:, None, None, None], r_tot, r_tot + step)
        return r_tot, None

    r_tot, _ = lax.scan(body, jnp.zeros_like(x), None, length=int(steps))
    return jnp.clip(x + (1.0 + overshoot) * r_tot, 0.0, 1.0)
