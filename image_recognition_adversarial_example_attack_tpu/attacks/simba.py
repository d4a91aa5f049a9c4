"""SimBA: simple black-box attack by coordinate descent on class probability.

Guo, Gardner, You, Wilson & Weinberger, ICML 2019.  Beyond-reference
extension completing the score-based black-box family next to Square
(attacks/square.py, random search over localized blocks) and NES/SPSA
(attacks/grad_est.py, gradient estimation): SimBA needs only the true
class's *probability* per query and walks one orthonormal direction at a
time — try ``x + eps*q``; if p_y drops, keep it, else try ``x - eps*q``.

Two bases (paper sections 3.2-3.3):

- ``mode='pixel'``: q is a single (i, j, c) pixel indicator;
- ``mode='dct'``  : q is a 2-D DCT basis function restricted to the
  lowest ``freq_frac`` fraction of frequencies — the paper's stronger
  variant (low-frequency perturbations transfer to the decision much
  faster), and the default here.

TPU design: the paper's per-image Python loop with two model queries per
coordinate becomes ONE ``lax.scan`` over steps — each step draws a
per-sample random coordinate (sampling with replacement: the batched
equivalent of the paper's random permutation), synthesizes the DCT basis
image as a cosine outer product (no [HWC x HWC] basis matrix ever
materializes), and evaluates BOTH signed candidates for the whole batch
in one [2B] stacked forward.  Converged samples freeze via masks, so one
compiled program serves the batch regardless of per-sample query counts.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from .api import LogitsFn


def dct_basis_image(u, v, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Orthonormal 2-D DCT-II basis function at frequency (u, v) -> [H, W].

    ``u, v`` may be traced integer scalars (the scan draws them at run
    time).  Satisfies ``sum(q*q) == 1`` exactly, so an eps step along q
    changes the image by eps in L2 — the paper's query-vs-distortion
    accounting.
    """
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    i = jnp.arange(h, dtype=dtype)
    j = jnp.arange(w, dtype=dtype)
    ci = jnp.cos(math.pi * (i + 0.5) * u.astype(dtype) / h)
    cj = jnp.cos(math.pi * (j + 0.5) * v.astype(dtype) / w)
    au = jnp.where(u == 0, jnp.sqrt(1.0 / h), jnp.sqrt(2.0 / h)).astype(dtype)
    av = jnp.where(v == 0, jnp.sqrt(1.0 / w), jnp.sqrt(2.0 / w)).astype(dtype)
    return (au * av) * ci[:, None] * cj[None, :]


def simba_attack(
    logits_fn: LogitsFn,
    x: jnp.ndarray,
    y_true: jnp.ndarray,
    *,
    steps: int = 1000,
    eps: float = 0.2,
    mode: str = "dct",
    freq_frac: float = 0.125,
    key: jax.Array,
    return_history: bool = False,
) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> adversarial batch in [0,1].

    ``steps`` coordinate trials (<= 2 probability queries each, batched);
    ``eps`` is the per-direction step (paper: 0.2); ``freq_frac`` bounds
    DCT frequencies to the lowest fraction per axis (paper: 1/8 on
    ImageNet).  Untargeted: descends the true-class probability and stops
    updating a sample once it is misclassified (its queries are spent —
    masked, exactly like the paper's early exit).
    """
    if mode not in ("pixel", "dct"):
        raise ValueError(f"unknown simba mode '{mode}'")
    b, h, w, c = x.shape
    x0 = jnp.clip(x, 0.0, 1.0)

    if mode == "dct":
        fh = max(1, int(h * freq_frac))
        fw = max(1, int(w * freq_frac))
    else:
        fh, fw = h, w

    def probs_and_pred(xq, yq):
        logits = logits_fn(xq)
        p = jax.nn.softmax(logits, axis=-1)
        py = jnp.take_along_axis(p, yq[:, None], axis=-1)[:, 0]
        return py, jnp.argmax(logits, axis=-1)

    def make_q(kk):
        """Per-sample random direction [B,H,W,C], unit L2."""
        ku, kv, kc = jax.random.split(kk, 3)
        uu = jax.random.randint(ku, (b,), 0, fh)
        vv = jax.random.randint(kv, (b,), 0, fw)
        cc = jax.random.randint(kc, (b,), 0, c)
        if mode == "dct":
            plane = jax.vmap(
                lambda u, v: dct_basis_image(u, v, h, w, x0.dtype))(uu, vv)
        else:
            flat = jax.nn.one_hot(uu * w + vv, h * w, dtype=x0.dtype)
            plane = flat.reshape(b, h, w)
        chan = jax.nn.one_hot(cc, c, dtype=x0.dtype)  # [B,C]
        return plane[..., None] * chan[:, None, None, :]

    py0, pred0 = probs_and_pred(x0, y_true)
    y2 = jnp.concatenate([y_true, y_true], 0)

    def step(carry, kk):
        x_adv, py, done = carry
        q = make_q(kk)
        cand_p = jnp.clip(x_adv + eps * q, 0.0, 1.0)
        cand_m = jnp.clip(x_adv - eps * q, 0.0, 1.0)
        # one stacked forward for (+, -): 2 queries per sample per step
        pys, preds = probs_and_pred(jnp.concatenate([cand_p, cand_m], 0), y2)
        py_p, py_m = pys[:b], pys[b:]
        pred_p, pred_m = preds[:b], preds[b:]

        take_p = (py_p < py) & ~done
        take_m = (py_m < py) & ~take_p & ~done
        sel_p = take_p[:, None, None, None]
        sel_m = take_m[:, None, None, None]
        x_adv = jnp.where(sel_p, cand_p, jnp.where(sel_m, cand_m, x_adv))
        py = jnp.where(take_p, py_p, jnp.where(take_m, py_m, py))
        done = done | (take_p & (pred_p != y_true)) | (take_m & (pred_m != y_true))
        return (x_adv, py, done), done

    done0 = pred0 != y_true  # already misclassified: spend no queries
    (x_adv, _, _), succ_hist = lax.scan(
        step, (x0, py0, done0), jax.random.split(key, int(steps)))
    if return_history:
        # per-step success mask [steps, B] for query-efficiency curves
        return x_adv, succ_hist
    return x_adv
