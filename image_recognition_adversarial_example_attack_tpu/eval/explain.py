"""Grad-CAM attention maps for adversarial analysis.

Selvaraju et al. 2017 ("Grad-CAM: Visual Explanations from Deep Networks
via Gradient-based Localization"), applied to the attack-analysis question
the reference's visualization layer circles around but never answers
(visualized_attacks.py:264-415 shows WHAT changed in pixel space; Grad-CAM
shows WHERE the model's evidence moved): compare the class-discriminative
attention map of the clean prediction against the adversarial prediction's
map, and quantify the shift (`cam_shift_iou`).

Semantics: with A = last conv activation map [B,h,w,C] and s_y the logit of
class y,

    w_c  = mean_{h,w} ( d s_y / d A_c )         (global-average-pooled grads)
    CAM  = relu( sum_c w_c * A_c )              [B,h,w]
    normalized per sample to [0,1] by its max (all-zero maps stay zero).

TPU design: the model's forward is split at the tap by two module methods
(``features_last`` / ``head_from_features``, models/resnet.py) so the
gradient runs only through the GAP+fc tail — XLA compiles one program with
a single full forward plus the tiny head VJP, instead of a full backward
pass.  Everything is batched; the caller jits once and reuses across
clean/adv inputs.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

GradCamFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_gradcam_fn(
    module: Any,
    variables: dict,
    mean,
    std,
    input_dtype: Any = None,
) -> GradCamFn:
    """Builds ``(x01 [B,H,W,3], y [B]) -> cam [B,h,w] float32 in [0,1]``.

    Requires the module to expose the forward split ``features_last`` /
    ``head_from_features`` (the ResNet family does; models/resnet.py).
    Raises ValueError for models without a convolutional tap — Grad-CAM is
    defined on conv feature maps, not token sequences.
    """
    feats_method = getattr(type(module), "features_last", None)
    head_method = getattr(type(module), "head_from_features", None)
    if feats_method is None or head_method is None:
        raise ValueError(
            f"{type(module).__name__} exposes no features_last/"
            "head_from_features split; Grad-CAM needs a conv tap "
            "(available on the ResNet family)"
        )

    from ..attacks.api import make_logits_fn

    feats_fn = make_logits_fn(module, variables, mean, std,
                              input_dtype=input_dtype, method=feats_method)

    def head_fn(feats: jnp.ndarray) -> jnp.ndarray:
        return module.apply(variables, feats, method=head_method)

    def gradcam(x01: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        feats = feats_fn(x01)  # [B,h,w,C] float32

        def class_score(a: jnp.ndarray) -> jnp.ndarray:
            logits = head_fn(a).astype(jnp.float32)
            picked = jnp.take_along_axis(logits, y[:, None], axis=-1)
            # summed over the batch: per-sample grads stay decoupled
            # (same argument as attacks/api.py cross_entropy_sum)
            return jnp.sum(picked)

        grads = jax.grad(class_score)(feats)                 # [B,h,w,C]
        weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        cam = jax.nn.relu(jnp.sum(weights * feats, axis=-1))   # [B,h,w]
        peak = jnp.max(cam, axis=(1, 2), keepdims=True)
        return cam / jnp.maximum(peak, 1e-12)

    return gradcam


def upsample_cam(cam: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[B,h,w] -> [B,height,width] bilinear, for overlay on the input."""
    return jax.image.resize(cam, (cam.shape[0], height, width), "bilinear")


def cam_shift_iou(cam_a: jnp.ndarray, cam_b: jnp.ndarray,
                  quantile: float = 0.8) -> jnp.ndarray:
    """IoU of the top-(1-quantile) attention regions of two CAMs, per
    sample ([B] float32 in [0,1]).

    1.0 = the model looks at the same place; near 0 = the attack moved the
    model's evidence entirely.  Regions are each map's own q-quantile
    super-level set, so the metric is invariant to the per-sample max
    normalization.
    """
    batch = cam_a.shape[0]
    ta = jnp.quantile(cam_a.reshape(batch, -1), quantile, axis=1)
    tb = jnp.quantile(cam_b.reshape(batch, -1), quantile, axis=1)
    # strict >: a sparse map's quantile lands on its zero plateau, and >=
    # would then select the whole map instead of the hot region
    mask_a = cam_a > ta[:, None, None]
    mask_b = cam_b > tb[:, None, None]
    inter = jnp.sum(mask_a & mask_b, axis=(1, 2)).astype(jnp.float32)
    union = jnp.sum(mask_a | mask_b, axis=(1, 2)).astype(jnp.float32)
    # two empty super-level sets means two constant maps: they agree
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))
