"""Flax VGG (torchvision-compatible structure) in NHWC.

Transfer-study target model (reference blackbox_transfer.py:25-32 loads
``torchvision.models.vgg19``).  Module names mirror torchvision's
``features.N`` / ``classifier.N`` sequential indices (as ``features_N`` /
``classifier_N``) so the weight converter is a pure key rename.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.int8 import quant_conv_kwargs, quant_dense_kwargs

# Config "E" (VGG19): conv channel plan with 'M' = 2x2 max pool.
_VGG19_PLAN: Sequence = (
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
)


class VGG(nn.Module):
    plan: Sequence = _VGG19_PLAN
    num_classes: int = 1000
    classifier_width: int = 4096
    dtype: Any = jnp.float32
    int8: bool = False  # quantized inference (ops/int8.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = partial(nn.Conv, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, param_dtype=jnp.float32,
                       **quant_conv_kwargs(self.int8))
        x = x.astype(self.dtype)
        idx = 0  # torchvision sequential index (conv at idx, relu at idx+1)
        for item in self.plan:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                idx += 1
            else:
                x = conv(features=int(item), name=f"features_{idx}")(x)
                x = nn.relu(x)
                idx += 2

        # torch flattens NCHW (C-major); converted classifier weights expect
        # that ordering, so transpose before flattening. One tiny transpose
        # per image — XLA folds it into the following matmul's layout.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        dense = partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32,
                        **quant_dense_kwargs(self.int8))
        x = nn.relu(dense(self.classifier_width, name="classifier_0")(x))
        x = nn.relu(dense(self.classifier_width, name="classifier_3")(x))
        x = dense(self.num_classes, name="classifier_6")(x)
        return x.astype(jnp.float32)


def vgg19(num_classes: int = 1000, dtype: Any = jnp.float32,
          int8: bool = False) -> VGG:
    return VGG(plan=_VGG19_PLAN, num_classes=num_classes, dtype=dtype,
               int8=int8)


def vgg_tiny(num_classes: int = 10, dtype: Any = jnp.float32,
             int8: bool = False) -> VGG:
    """Miniature VGG (same code path) for CPU tests."""
    return VGG(plan=(8, "M", 16, "M"), num_classes=num_classes,
               classifier_width=32, dtype=dtype, int8=int8)
